"""Extended YAML-processor registrations (plans/processors_ext.py):
the reference's processor names reachable from `pipeline.processors`,
each delegating to the existing tested implementation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.plans.pipeline import (
    PROCESSORS,
    PipelineConfigError,
    apply_processor,
    build_pipeline,
)

SF = "/root/testdata/sf0.001"


def _table(name):
    return {"input": {"table": {"sf_dir": SF, "name": name}}}


def run(spark, config):
    return build_pipeline(spark, config).dataframe()


# --- grouping / flow -------------------------------------------------


def test_processors_for_each_parallel_apply_children(spark):
    for name in ("processors", "for_each", "parallel"):
        cfg = dict(_table("region"))
        cfg["pipeline"] = {
            "processors": [
                {name: [{"mutation": "root.up = this.r_name.uppercase()"}]}
            ]
        }
        rows = run(spark, cfg).collect()
        assert all(r["up"] == r["r_name"].upper() for r in rows), name


def test_branch_merges_result_map_columns(spark):
    cfg = dict(_table("nation"))
    cfg["pipeline"] = {
        "processors": [
            {
                "branch": {
                    "request_map": "root.nk2 = this.n_nationkey * 2",
                    "processors": [
                        {"mutation": "root.nk3 = this.nk2 + 1"}
                    ],
                    "result_map": "root.enriched = this.nk3",
                }
            }
        ]
    }
    out = run(spark, cfg)
    rows = out.collect()
    # original columns intact, only the result_map target added
    assert "nk2" not in out.columns and "nk3" not in out.columns
    assert all(r["enriched"] == r["n_nationkey"] * 2 + 1 for r in rows)


def test_workflow_branches_in_order(spark):
    cfg = dict(_table("nation"))
    cfg["pipeline"] = {
        "processors": [
            {
                "workflow": {
                    "order": [["a"], ["b"]],
                    "branches": {
                        "a": {"result_map": "root.x = this.n_nationkey + 1"},
                        "b": {"result_map": "root.y = this.x * 10"},
                    },
                }
            }
        ]
    }
    rows = run(spark, cfg).collect()
    assert all(r["y"] == (r["n_nationkey"] + 1) * 10 for r in rows)


def test_group_by_first_match_and_own_group(spark):
    cfg = dict(_table("region"))
    cfg["pipeline"] = {
        "processors": [
            {
                "group_by": [
                    {
                        "check": 'this.r_regionkey < 2',
                        "processors": [
                            {"mutation": 'root.grp = "low"'}
                        ],
                    },
                    {
                        "check": 'this.r_regionkey < 4',
                        "processors": [
                            {"mutation": 'root.grp = "mid"'}
                        ],
                    },
                ]
            }
        ]
    }
    rows = {r["r_regionkey"]: r["grp"] for r in run(spark, cfg).collect()}
    assert rows[0] == "low" and rows[1] == "low"
    assert rows[2] == "mid" and rows[3] == "mid"
    assert rows[4] is None  # unmatched: own group, unprocessed


def test_group_by_value_assigns_key(spark):
    cfg = dict(_table("events"))
    cfg["pipeline"] = {
        "processors": [{"group_by_value": {"value": "this.event_type"}}]
    }
    out = run(spark, cfg)
    assert "group_key" in out.columns
    assert out.filter(F.col("group_key") == F.col("event_type")).count() == out.count()


def test_cached_runs_children_per_distinct_key(spark):
    cfg = dict(_table("orders"))
    cfg["pipeline"] = {
        "processors": [
            {
                "cached": {
                    "key": "o_orderpriority",
                    "processors": [
                        {
                            "mutation": (
                                "root.prio_tag = "
                                'this.o_orderpriority.uppercase()'
                            )
                        }
                    ],
                }
            }
        ]
    }
    rows = run(spark, cfg).collect()
    assert all(r["prio_tag"] == r["o_orderpriority"].upper() for r in rows)


def test_retry_applies_children(spark):
    cfg = dict(_table("region"))
    cfg["pipeline"] = {
        "processors": [
            {
                "retry": {
                    "max_retries": 3,
                    "processors": [{"mutation": "root.n = 1"}],
                }
            }
        ]
    }
    assert all(r["n"] == 1 for r in run(spark, cfg).collect())


# --- formats ---------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
    ],
}


def test_avro_processor_roundtrip(spark):
    df = spark.createDataFrame(
        [(json.dumps({"a": 7, "b": "x"}),)], ["content"]
    )
    enc = apply_processor(
        df, {"avro": {"operator": "from_json", "schema": AVRO_SCHEMA}}
    )
    dec = apply_processor(
        enc, {"avro": {"operator": "to_json", "schema": AVRO_SCHEMA}}
    )
    assert json.loads(dec.collect()[0]["content"]) == {"a": 7, "b": "x"}


def test_msgpack_processor_roundtrip(spark):
    df = spark.createDataFrame(
        [(json.dumps({"k": 1, "s": "v"}),)], ["content"]
    )
    enc = apply_processor(df, {"msgpack": {"operator": "from_json"}})
    dec = apply_processor(enc, {"msgpack": {"operator": "to_json"}})
    assert json.loads(dec.collect()[0]["content"]) == {"k": 1, "s": "v"}


PROTO_DESC = {
    "fields": {
        1: {"name": "a", "type": "int64"},
        2: {"name": "b", "type": "string"},
    }
}


def test_protobuf_processor_roundtrip(spark):
    df = spark.createDataFrame(
        [(json.dumps({"a": 5, "b": "hi"}),)], ["content"]
    )
    enc = apply_processor(
        df, {"protobuf": {"operator": "from_json", "descriptor": PROTO_DESC}}
    )
    dec = apply_processor(
        enc, {"protobuf": {"operator": "to_json", "descriptor": PROTO_DESC}}
    )
    assert json.loads(dec.collect()[0]["content"]) == {"a": 5, "b": "hi"}


def test_xml_processor_to_json(spark):
    df = spark.createDataFrame(
        [("<r><a>1</a><b>x</b></r>",)], ["content"]
    )
    out = apply_processor(
        df, {"xml": {"operator": "to_json", "schema": "a BIGINT, b STRING"}}
    )
    assert json.loads(out.collect()[0]["content"]) == {"a": 1, "b": "x"}


def test_parse_log_processor(spark):
    line = "<34>1 2026-01-02T03:04:05Z host app 123 MSGID - oh no"
    df = spark.createDataFrame([(line,)], ["content"])
    out = apply_processor(df, {"parse_log": {}}).collect()[0]
    assert out["log"] is not None


def test_parquet_encode_decode_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["n", "s"]).coalesce(1)
    enc = apply_processor(df, {"parquet_encode": {}})
    blobs = enc.collect()
    assert len(blobs) == 1 and bytes(blobs[0]["content"])[:4] == b"PAR1"
    dec = apply_processor(enc, {"parquet_decode": {}})
    rows = sorted(json.loads(r["content"])["n"] for r in dec.collect())
    assert rows == [1, 2]


def test_schema_registry_processors_roundtrip(spark):
    df = spark.createDataFrame([(b"payload",)], ["content"])
    enc = apply_processor(
        df, {"schema_registry_encode": {"schema_id": 7}}
    )
    raw = bytes(enc.collect()[0]["content"])
    assert raw[0] == 0 and int.from_bytes(raw[1:5], "big") == 7


# --- enrichment ------------------------------------------------------


def test_sql_select_processor_joins_table(spark):
    cfg = dict(_table("orders"))
    cfg["pipeline"] = {
        "processors": [
            {
                "sql_select": {
                    "path": f"{SF}/customer.parquet",
                    "columns": ["c_custkey", "c_name"],
                    "join_on": None,
                }
            }
        ]
    }
    # join_on via column equality: o_custkey == c_custkey needs rename
    cfg["pipeline"]["processors"][0]["sql_select"]["join_on"] = None
    from connect_spark.plans.pipeline import PipelineConfigError

    # use where+join_on with matching names instead
    cfg["pipeline"]["processors"] = [
        {"mutation": "root.c_custkey = this.o_custkey"},
        {
            "sql_select": {
                "path": f"{SF}/customer.parquet",
                "columns": ["c_custkey", "c_name"],
                "join_on": "c_custkey",
            }
        },
    ]
    out = run(spark, cfg)
    assert "c_name" in out.columns
    assert out.filter(F.col("c_name").isNull()).count() == 0


def test_http_processor_with_injected_transport(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    def fake_transport(url, verb, headers, body):
        if body == "boom":
            raise RuntimeError("refused")
        return f"{verb} {url} -> {body.upper()}"

    register_http_transport("fake", fake_transport)
    df = spark.createDataFrame([("hello",), ("boom",)], ["content"])
    out = apply_processor(
        df,
        {
            "http": {
                "url": "http://svc/x",
                "verb": "POST",
                "transport": "fake",
            }
        },
    ).collect()
    by_in = {r["content"]: r["_error"] for r in out}
    assert "POST http://svc/x -> HELLO" in by_in
    assert by_in["boom"] is not None  # failed row unchanged + flagged


# --- AI family -------------------------------------------------------


def test_ai_chat_and_embeddings_and_rerank_and_moderation(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    chat = apply_processor(
        docs, {"openai_chat_completion": {"prompt": "this.text"}}
    )
    assert "reply" in chat.columns and chat.count() == 5

    emb = apply_processor(
        docs, {"ollama_embeddings": {"field": "text", "dimensions": 16}}
    )
    row = emb.select("embedding").first()
    assert len(row["embedding"]) == 16

    rr = apply_processor(
        docs, {"cohere_rerank": {"query": "spark table", "field": "text"}}
    )
    assert "rerank_score" in rr.columns

    mod = apply_processor(
        docs, {"ollama_moderation": {"response": "text"}}
    )
    assert set(r["safe"] for r in mod.collect()) <= {"yes", "no"}


def test_command_aliases_subprocess(spark):
    assert "command" in PROCESSORS


def test_benchmark_registers_observation(spark):
    df = spark.createDataFrame([(1,), (2,)], ["n"])
    out = apply_processor(df, {"benchmark": {"label": "bm1"}})
    out.count()
    from connect_spark.observability import get_metric

    assert get_metric("bm1") is not None


def test_group_by_null_check_rows_fall_to_own_group(spark):
    """A NULL check must route like false — the row lands in the
    unmatched own-group instead of vanishing (review finding)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], ["id", "k"]
    )
    out = apply_processor(
        df,
        {
            "group_by": [
                {
                    "check": 'this.k == "a"',
                    "processors": [{"mutation": 'root.grp = "hit"'}],
                }
            ]
        },
    ).collect()
    by_id = {r["id"]: r["grp"] for r in out}
    assert len(out) == 3  # nothing vanished
    assert by_id[1] == "hit" and by_id[2] is None and by_id[3] is None


def test_branch_mutations_do_not_leak_into_original_columns(spark):
    """request_map/child mutations of ORIGINAL columns must not leak —
    only result_map targets land (review finding)."""
    df = spark.createDataFrame([(7, "orig")], ["n", "content"])
    out = apply_processor(
        df,
        {
            "branch": {
                "request_map": 'root.content = "scratch"',
                "processors": [
                    {"mutation": "root.content = this.content.uppercase()"}
                ],
                "result_map": "root.reply = this.content",
            }
        },
    ).collect()[0]
    assert out["content"] == "orig"  # original restored
    assert out["reply"] == "SCRATCH"  # result_map target lands


def test_sql_insert_pending_writes_are_per_pipeline(spark, sf_dir, tmp_path):
    """Interleaved builds must not steal or drop each other's
    registered sql_insert writes (review finding)."""
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")

    def cfg(path):
        return {
            "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
            "pipeline": {
                "processors": [{"sql_insert": {"path": path}}]
            },
        }

    pipe_a = build_pipeline(spark, cfg(pa))
    pipe_a.dataframe()
    pipe_b = build_pipeline(spark, cfg(pb))
    pipe_b.dataframe()  # interleaved build must not clear A's writes
    assert pipe_a.flush_writes() == 1
    assert pipe_b.flush_writes() == 1
    assert spark.read.parquet(pa).count() == 5
    assert spark.read.parquet(pb).count() == 5
