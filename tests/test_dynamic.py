"""dynamic input/output (plans/dynamic.py): labeled runtime-mutable
broker + REST control plane (inputs/dynamic.adoc, outputs/dynamic.adoc)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from connect_spark.plans.dynamic import (
    _go_duration,
    dynamic_registry,
    reset_registry,
)
from connect_spark.plans.pipeline import PipelineConfigError, build_pipeline


@pytest.fixture(autouse=True)
def _clean_registry():
    reset_registry("")
    reset_registry("test")
    yield
    reset_registry("")
    reset_registry("test")


def test_go_duration_format():
    assert _go_duration(0.5) == "0.5s"
    assert _go_duration(3600 * 72 + 180 + 0.5) == "72h3m0.5s"
    assert _go_duration(61) == "1m1s"
    assert _go_duration(0) == "0s"


def test_rest_crud_cycle():
    reg = dynamic_registry("test")
    status, listing = reg.handle("GET", "/inputs")
    assert status == 200 and listing == {}
    # create via JSON body
    status, _ = reg.handle(
        "POST", "/inputs/foo", json.dumps({"generate": {"count": 2, "mapping": {}}})
    )
    assert status == 200
    status, conf = reg.handle("GET", "/inputs/foo")
    assert status == 200 and conf == {"generate": {"count": 2, "mapping": {}}}
    # create via YAML body
    status, _ = reg.handle("POST", "/inputs/bar", "file:\n  path: /tmp/x\n")
    assert status == 200
    status, listing = reg.handle("GET", "/inputs")
    assert set(listing) == {"foo", "bar"}
    assert "uptime" in listing["foo"] and listing["foo"]["uptime"].endswith("s")
    # uptime endpoint: live then stopped
    status, up = reg.handle("GET", "/inputs/foo/uptime")
    assert status == 200 and up.endswith("s") and up != "stopped"
    status, _ = reg.handle("DELETE", "/inputs/foo")
    assert status == 200
    status, up = reg.handle("GET", "/inputs/foo/uptime")
    assert status == 200 and up == "stopped"
    status, _ = reg.handle("GET", "/inputs/foo")
    assert status == 404
    # errors
    assert reg.handle("DELETE", "/inputs/nope")[0] == 404
    assert reg.handle("GET", "/bogus")[0] == 404
    assert reg.handle("POST", "/inputs/bad", "{not json: [")[0] == 400
    assert reg.handle("POST", "/inputs/bad", json.dumps({"a": 1, "b": 2}))[0] == 400


def test_dynamic_input_union_and_runtime_mutation(spark, sf_dir):
    config = {
        "input": {
            "dynamic": {
                "inputs": {
                    "reg": {"table": {"sf_dir": sf_dir, "name": "region"}},
                },
            }
        },
    }
    df = build_pipeline(spark, config).dataframe()
    assert df.count() == 5
    # runtime POST adds a second input; next plan build unions it
    reg = dynamic_registry("")
    reg.handle(
        "POST",
        "/inputs/nat",
        json.dumps({"table": {"sf_dir": sf_dir, "name": "nation"}}),
    )
    df2 = build_pipeline(spark, config).dataframe()
    assert df2.count() == 5 + 25
    # DELETE a static label: it stays deleted across rebuilds (no
    # re-seed of tombstoned labels)
    reg.handle("DELETE", "/inputs/reg")
    df3 = build_pipeline(spark, config).dataframe()
    assert df3.count() == 25
    reg.handle("DELETE", "/inputs/nat")
    with pytest.raises(PipelineConfigError):
        build_pipeline(spark, config).dataframe()


def test_dynamic_output_fan_out(spark, sf_dir, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "output": {
            "dynamic": {
                "outputs": {
                    "a": {"parquet": {"path": a}},
                },
            }
        },
    }
    build_pipeline(spark, config).run()
    assert spark.read.parquet(a).count() == 5
    # add a second sink at runtime: fan_out delivers to both
    dynamic_registry("").handle(
        "POST", "/outputs/b", json.dumps({"parquet": {"path": b}})
    )
    build_pipeline(spark, config).run()
    assert spark.read.parquet(a).count() == 5
    assert spark.read.parquet(b).count() == 5


def test_http_server_round_trip():
    reg = dynamic_registry("test")
    server = reg.serve(0)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            f"{base}/inputs/web",
            data=json.dumps({"generate": {"count": 1, "mapping": {}}}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        with urllib.request.urlopen(f"{base}/inputs") as resp:
            listing = json.loads(resp.read())
        assert "web" in listing
        with urllib.request.urlopen(f"{base}/inputs/web/uptime") as resp:
            assert resp.read().decode().endswith("s")
    finally:
        server.shutdown()


def test_fan_out_outputs_receive_identical_rows(spark, tmp_path):
    """fan_out semantics: every registered output gets the SAME rows.
    A non-deterministic plan (rand column) recomputed per output
    would diverge; the fan_out loop pins the result first."""
    from connect_spark.plans.dynamic import run_dynamic_output
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("r", F.rand())
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    run_dynamic_output(
        df,
        {
            "prefix": "test",
            "outputs": {
                "a": {"parquet": {"path": p1}},
                "b": {"parquet": {"path": p2}},
            },
        },
    )
    rows1 = sorted((r.id, r.r) for r in spark.read.parquet(p1).collect())
    rows2 = sorted((r.id, r.r) for r in spark.read.parquet(p2).collect())
    assert rows1 == rows2
