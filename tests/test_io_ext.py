"""Extended input/output kinds (plans/io_ext.py) and the serverless
handler (serverless.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from connect_spark.plans.pipeline import build_pipeline
from connect_spark.serverless import handle

SF = "/root/testdata/sf0.001"


def _region_input():
    return {"table": {"sf_dir": SF, "name": "region"}}


def test_broker_fan_out_every_output_gets_all_rows(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    cfg = {
        "input": _region_input(),
        "output": {
            "broker": {
                "outputs": [
                    {"parquet": {"path": p1}},
                    {"parquet": {"path": p2}},
                ]
            }
        },
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(p1).count() == 5
    assert spark.read.parquet(p2).count() == 5


def test_broker_round_robin_partitions_rows(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    cfg = {
        "input": _region_input(),
        "output": {
            "broker": {
                "pattern": "round_robin",
                "outputs": [
                    {"parquet": {"path": p1}},
                    {"parquet": {"path": p2}},
                ],
            }
        },
    }
    build_pipeline(spark, cfg).run()
    n1 = spark.read.parquet(p1).count()
    n2 = spark.read.parquet(p2).count()
    assert n1 + n2 == 5 and n1 > 0 and n2 > 0


def test_switch_output_routes_by_check(spark, tmp_path):
    low, rest = str(tmp_path / "low"), str(tmp_path / "rest")
    cfg = {
        "input": _region_input(),
        "output": {
            "switch": {
                "cases": [
                    {
                        "check": "this.r_regionkey < 2",
                        "output": {"parquet": {"path": low}},
                    },
                    {"output": {"parquet": {"path": rest}}},
                ]
            }
        },
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(low).count() == 2
    assert spark.read.parquet(rest).count() == 3


def test_fallback_output_tries_next(spark, tmp_path):
    ok = str(tmp_path / "ok")
    cfg = {
        "input": _region_input(),
        "output": {
            "fallback": [
                # first target fails: parquet into an existing FILE path
                {"parquet": {"path": "/dev/null/nope"}},
                {"parquet": {"path": ok}},
            ]
        },
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(ok).count() == 5


def test_retry_and_drop_on_outputs(spark, tmp_path):
    ok = str(tmp_path / "ok")
    cfg = {
        "input": _region_input(),
        "output": {
            "retry": {
                "max_retries": 1,
                "output": {"parquet": {"path": ok}},
            }
        },
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(ok).count() == 5
    # drop_on: error swallow is OPT-IN (error: true), matching the
    # reference's default of propagating delivery failures
    cfg2 = {
        "input": _region_input(),
        "output": {
            "drop_on": {
                "error": True,
                "output": {"parquet": {"path": "/dev/null/x"}},
            }
        },
    }
    build_pipeline(spark, cfg2).run()  # must not raise
    import pytest as _pytest

    cfg3 = {
        "input": _region_input(),
        "output": {
            "drop_on": {"output": {"parquet": {"path": "/dev/null/x"}}}
        },
    }
    with _pytest.raises(Exception):
        build_pipeline(spark, cfg3).run()  # default: propagate


def test_reject_errored_output_splits(spark, tmp_path):
    good, dlq = str(tmp_path / "good"), str(tmp_path / "dlq")
    cfg = {
        "input": _region_input(),
        "pipeline": {
            "processors": [
                {
                    "mutation": (
                        'root._error = if this.r_regionkey == 0 '
                        '{ "boom" } else { null }'
                    )
                }
            ]
        },
        "output": {
            "reject_errored": {
                "output": {"parquet": {"path": good}},
                "dlq": {"parquet": {"path": dlq}},
            }
        },
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(good).count() == 4
    assert spark.read.parquet(dlq).count() == 1


def test_cache_and_file_outputs(spark, tmp_path):
    cache_path = str(tmp_path / "kv")
    cfg = {
        "input": _region_input(),
        "output": {"cache": {"path": cache_path, "key": "r_regionkey"}},
    }
    build_pipeline(spark, cfg).run()
    from connect_spark.state.cache import ParquetKVCache

    kv = ParquetKVCache(spark, cache_path, key="r_regionkey")
    assert kv.read().count() == 5

    txt = str(tmp_path / "txt")
    cfg2 = {
        "input": _region_input(),
        "pipeline": {
            "processors": [{"mapping": "root.content = this.r_name"}]
        },
        "output": {"file": {"path": txt}},
    }
    build_pipeline(spark, cfg2).run()
    lines = {r["value"] for r in spark.read.text(txt).collect()}
    assert len(lines) == 5


def test_http_client_input_and_output_with_transport(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    calls = []

    def fake(url, verb, headers, body):
        calls.append((url, verb, body))
        return json.dumps({"ok": True, "n": len(calls)})

    register_http_transport("fake-io", fake)
    cfg = {
        "input": {
            "http_client": {
                "url": "http://svc/poll",
                "transport": "fake-io",
                "n_polls": 3,
            }
        }
    }
    df = build_pipeline(spark, cfg).dataframe()
    rows = df.collect()
    assert len(rows) == 3
    assert all(json.loads(r["content"])["ok"] for r in rows)


def test_batched_input_assigns_batch_ids(spark):
    cfg = {
        "input": {
            "batched": {
                "child": {"table": {"sf_dir": SF, "name": "events"}},
                "policy": {"count": 5},
                "order_by": ["ts", "event_id"],
                "partition_by": ["user_id"],
                "ts": "ts",
            }
        }
    }
    df = build_pipeline(spark, cfg).dataframe()
    assert "batch_id" in df.columns
    sizes = (
        df.groupBy("user_id", "batch_id").count().agg(F.max("count"))
    ).collect()[0][0]
    assert sizes <= 5


def test_sql_inputs(spark):
    cfg = {
        "input": {
            "sql_select": {
                "path": f"{SF}/region.parquet",
                "columns": ["r_regionkey", "r_name"],
                "where": "r_regionkey < 3",
            }
        }
    }
    assert build_pipeline(spark, cfg).dataframe().count() == 3
    cfg2 = {"input": {"sql_raw": {"query": "SELECT 1 AS one"}}}
    assert build_pipeline(spark, cfg2).dataframe().collect()[0]["one"] == 1


def test_serverless_handler_roundtrip(spark):
    config = {
        "pipeline": {
            "processors": [
                {"mutation": "root.doubled = this.n * 2"},
                {
                    "mutation": (
                        'root._error = if this.n < 0 { "neg" } else { null }'
                    )
                },
            ]
        }
    }
    out = handle(spark, config, [{"n": 4}, {"n": -1}])
    assert [r["doubled"] for r in out["response"]] == [8]
    assert len(out["rejected"]) == 1 and out["rejected"][0]["n"] == -1


def test_sync_response_output_returns_frame(spark):
    cfg = {
        "input": _region_input(),
        "pipeline": {
            "processors": [{"mapping": "root.name = this.r_name"}]
        },
        "output": {"sync_response": {}},
    }
    out = build_pipeline(spark, cfg).run()
    assert out is not None and out.count() == 5


def test_socket_server_input(spark, tmp_path):
    import socket
    import time
    import uuid

    from connect_spark.plans.io_ext import (
        socket_server_port,
        stop_socket_server,
    )

    label = "s-" + uuid.uuid4().hex[:8]
    cfg = {
        "input": {
            "socket_server": {
                "label": label,
                "spool_dir": str(tmp_path / "spool"),
            }
        }
    }
    try:
        assert build_pipeline(spark, cfg).dataframe().count() == 0
        port = socket_server_port(label)
        with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.sendall(b"line one\nline two\n")
        time.sleep(0.3)  # handler writes after connection close
        rows = {
            r["content"]
            for r in build_pipeline(spark, cfg).dataframe().collect()
        }
        assert rows == {"line one", "line two"}
    finally:
        stop_socket_server(label)


def test_stdin_input_via_path(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("alpha\nbeta\n\ngamma\n")
    cfg = {"input": {"stdin": {"path": str(p)}}}
    rows = [
        r["content"]
        for r in build_pipeline(spark, cfg).dataframe().collect()
    ]
    assert rows == ["alpha", "beta", "gamma"]


def test_duckdb_external_db_roundtrip(spark, tmp_path):
    """A REAL external database: write the batch into a DuckDB file,
    then query it back as an input — out-of-engine storage + SQL."""
    db = str(tmp_path / "ext.duckdb")
    out_cfg = {
        "input": _region_input(),
        "output": {"duckdb": {"database": db, "table": "regions"}},
    }
    build_pipeline(spark, out_cfg).run()

    in_cfg = {
        "input": {
            "duckdb": {
                "database": db,
                "query": (
                    "SELECT r_regionkey, upper(r_name) AS rn "
                    "FROM regions WHERE r_regionkey < 3 ORDER BY 1"
                ),
            }
        }
    }
    rows = build_pipeline(spark, in_cfg).dataframe().collect()
    assert [r["r_regionkey"] for r in rows] == [0, 1, 2]
    assert all(r["rn"].isupper() for r in rows)


def test_iceberg_input_with_time_travel(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    loc = str(tmp_path / "tbl")
    t = IcebergTable(spark, loc)
    m1 = t.append(spark.range(4).toDF("n"))
    t.append(spark.range(4, 9).toDF("n"))

    cur = build_pipeline(
        spark, {"input": {"iceberg": {"location": loc}}}
    ).dataframe()
    assert cur.count() == 9
    old = build_pipeline(
        spark,
        {
            "input": {
                "iceberg": {
                    "location": loc,
                    "snapshot_id": m1["current-snapshot-id"],
                }
            }
        },
    ).dataframe()
    assert old.count() == 4


def test_object_store_alias_inputs(spark, tmp_path):
    """aws_s3/gcp_cloud_storage/azure_blob_storage/hdfs map onto the
    file reader; bucket+prefix become a connector URI, a plain `path`
    reads locally (same code path a cluster with Hadoop connectors
    runs)."""
    p = tmp_path / "obj"
    p.mkdir()
    (p / "a.txt").write_text("one\ntwo\n")
    for kind in ("aws_s3", "gcp_cloud_storage", "hdfs"):
        df = build_pipeline(
            spark, {"input": {kind: {"path": str(p)}}}
        ).dataframe()
        assert df.count() == 2, kind
        assert "content" in df.columns


def test_nats_alias_input_over_message_bus(spark, tmp_path):
    from connect_spark.sources.mq import MessageBus

    bus = MessageBus(str(tmp_path / "bus"))
    bus.publish("orders.eu", ["m1"])
    bus.publish("orders.us", ["m2"])
    bus.publish("audit.log", ["skip"])
    df = build_pipeline(
        spark,
        {"input": {"nats": {"bus_path": bus.path, "subject": "orders.*"}}},
    ).dataframe()
    assert df.count() == 2


def test_kafka_alias_surfaces_clear_connector_gate(spark):
    """The kafka input kind maps reference fields onto Spark's Kafka
    source; this container has no spark-sql-kafka jar, so the build
    must fail with a CLEAR classpath message (the option mapping
    itself is verified in test_sources_sinks)."""
    from connect_spark.plans.pipeline import PipelineConfigError

    cfg = {
        "input": {
            "kafka": {
                "addresses": ["localhost:19092"],
                "topics": ["t1"],
                "consumer_group": "g1",
            }
        }
    }
    with pytest.raises(PipelineConfigError, match="spark-sql-kafka"):
        build_pipeline(spark, cfg).dataframe()


def test_object_store_alias_outputs(spark, tmp_path):
    p = str(tmp_path / "out")
    cfg = {
        "input": _region_input(),
        "output": {"aws_s3": {"path": p, "format": "parquet"}},
    }
    build_pipeline(spark, cfg).run()
    assert spark.read.parquet(p).count() == 5


def test_iceberg_input_pruned_filters(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline
    from connect_spark.sinks.iceberg_meta import IcebergTable

    loc = str(tmp_path / "pruned")
    t = IcebergTable(spark, loc)
    for lo in (0, 100):
        t.append(spark.createDataFrame(
            [(lo + i,) for i in range(5)], "id long").coalesce(1))
    df = Pipeline(spark, {"input": {"iceberg": {
        "location": loc, "filters": [["id", ">=", 100]]}}}).dataframe()
    assert sorted(r.id for r in df.collect()) == [100, 101, 102, 103, 104]
