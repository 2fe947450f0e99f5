"""Regression tests for the round-4 ADVICE findings:

1. Pipeline-scoped named resources — a later pipeline's build wiping
   the module registries must not break an earlier pipeline's
   delivery-time `resource` resolution.
2. _streaming_safe_output traverses `resource` outputs: a parquet sink
   behind a named output resource appends per micro-batch (never
   overwrites), a memory sink behind a resource is rejected.
3. Output batching: partition-granular sinks split requests per formed
   batch even when hash partitioning co-locates several batches in one
   partition.
"""

from __future__ import annotations

import json

import pytest

from connect_spark.plans.pipeline import (
    Pipeline,
    PipelineConfigError,
    _streaming_safe_output,
)


def test_resource_scope_survives_other_pipeline_build(spark, tmp_path):
    out_a = str(tmp_path / "out_a")
    pipe_a = Pipeline(spark, {
        "output_resources": [
            {"label": "dst", "parquet": {"path": out_a}},
        ],
        "input": {"generate": {"count": 3, "mapping":
                               "root.n = counter()"}},
        "output": {"resource": "dst"},
    })
    # building ANOTHER pipeline repopulates the module registries with
    # a different namespace (same label, different target!)
    pipe_a.dataframe()
    Pipeline(spark, {
        "output_resources": [
            {"label": "dst", "parquet": {"path": str(tmp_path / "hijack")}},
        ],
        "input": {"generate": {"count": 1, "mapping": "root.x = 1"}},
        "output": {"resource": "dst"},
    }).dataframe()
    # pipe_a's delivery must use ITS snapshot, not the hijacked label
    pipe_a.run()
    assert sorted(
        r.n for r in spark.read.parquet(out_a).collect()) == [0, 1, 2]
    import os
    assert not os.path.exists(str(tmp_path / "hijack"))


def test_streaming_safe_output_resolves_resource(spark, tmp_path):
    out = str(tmp_path / "stream_out")
    pipe = Pipeline(spark, {
        "output_resources": [
            {"label": "sink", "parquet": {"path": out}},
        ],
        "input": {"generate_stream": {"rows_per_batch": 5,
                                      "max_rows": 10}},
        "output": {"resource": "sink"},
    })
    pipe.dataframe()
    rewritten = _streaming_safe_output(
        {"resource": "sink"}, pipe._output_res)
    # the resource is inlined AND the file sink defaults to append
    assert rewritten == {"parquet": {"path": out, "mode": "append"}}


def test_streaming_safe_output_rejects_memory_behind_resource(spark):
    pipe = Pipeline(spark, {
        "output_resources": [{"label": "m", "memory": {}}],
        "input": {"generate": {"count": 1, "mapping": "root.x = 1"}},
        "output": {"resource": "m"},
    })
    pipe.dataframe()
    with pytest.raises(PipelineConfigError, match="memory output"):
        _streaming_safe_output({"resource": "m"}, pipe._output_res)


def test_streaming_resource_output_appends_across_batches(spark, tmp_path):
    """End-to-end: start() through a resource-wrapped parquet sink —
    both micro-batches must land (append), not just the last
    (overwrite)."""
    out = str(tmp_path / "accum")
    ckpt = str(tmp_path / "ckpt")
    pipe = Pipeline(spark, {
        "output_resources": [
            {"label": "sink", "parquet": {"path": out}},
        ],
        "input": {"generate_stream": {"rows_per_batch": 2,
                                      "max_rows": 6}},
        "output": {"resource": "sink"},
    })
    q = pipe.start(checkpoint=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.n for r in spark.read.parquet(out).collect())
    assert got == list(range(6))


def test_output_batching_splits_requests_per_batch(spark):
    """A batching policy of count=2 over 8 rows forced into ONE
    partition-granular request path must still produce one POST per
    formed batch — hash co-location of batches in a partition may not
    merge them (round-4 ADVICE #3)."""
    from connect_spark.plans.pipeline import _run_output
    from connect_spark.plans.processors_ext import register_http_transport

    bodies: list[str] = []
    register_http_transport(
        "cap_split",
        lambda url, verb, headers, body: bodies.append(body) or "")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id int, v string"
    ).coalesce(1)
    _run_output(df, {"splunk_hec": {
        "url": "http://hec", "transport": "cap_split",
        "batching": {"count": 2},
    }})
    # 8 rows / count=2 → 4 batches → exactly 4 requests of 2 events
    assert len(bodies) == 4, [b.count("\n") for b in bodies]
    for b in bodies:
        lines = [ln for ln in b.strip().split("\n") if ln]
        assert len(lines) == 2
        for ln in lines:
            env = json.loads(ln)
            # the reserved split id never enters the payload
            assert "_cs_batch_id" not in json.dumps(env)


def test_output_batching_drops_reserved_col_for_files(spark, tmp_path):
    from connect_spark.plans.pipeline import _run_output

    out = str(tmp_path / "batched_parquet")
    df = spark.createDataFrame(
        [(i,) for i in range(6)], "id int")
    _run_output(df, {"parquet": {
        "path": out, "batching": {"count": 3},
    }})
    got = spark.read.parquet(out)
    assert got.columns == ["id"]
    assert got.count() == 6
