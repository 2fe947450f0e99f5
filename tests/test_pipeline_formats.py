"""Format processors through the YAML pipeline: compress roundtrip,
grok, text_chunker, json_schema + try/catch error scoping."""

from __future__ import annotations

from connect_spark.plans import build_pipeline

SF = "/root/testdata/sf0.001"


def test_compress_decompress_pipeline(spark):
    cfg = {
        "input": {"table": {"name": "documents", "sf_dir": SF}},
        "pipeline": {
            "processors": [
                {"mapping": "root.doc_id = this.doc_id\nroot.content = this.text"},
                {"compress": {"algorithm": "gzip", "field": "content"}},
                {"decompress": {"algorithm": "gzip", "field": "content"}},
                {"mutation": 'root.content = this.content.string()'},
            ]
        },
    }
    df = build_pipeline(spark, cfg).dataframe()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["content"] for r in df.collect()}
    assert got == orig


def test_grok_pipeline(spark):
    cfg = {
        "input": {"generate": {"count": 3, "mapping": (
            'root.content = "INFO user=" + counter().string() + " value=1.5"'
        )}},
        "pipeline": {
            "processors": [
                {"grok": {"field": "content",
                          "pattern": "%{LOGLEVEL:level} user=%{INT:uid} value=%{NUMBER:val}"}},
            ]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert all(r["level"] == "INFO" and r["val"] == "1.5" for r in rows)


def test_text_chunker_pipeline(spark):
    cfg = {
        "input": {"table": {"name": "documents", "sf_dir": SF}},
        "pipeline": {
            "processors": [
                {"mapping": "root.doc_id = this.doc_id\nroot.content = this.text"},
                {"text_chunker": {"field": "content", "chunk_size": 10}},
            ]
        },
    }
    df = build_pipeline(spark, cfg).dataframe()
    assert df.columns == ["doc_id", "chunk"]
    assert df.count() > spark.read.parquet(f"{SF}/documents.parquet").count()


def test_json_schema_try_catch_pipeline(spark):
    cfg = {
        "input": {"table": {"name": "events", "sf_dir": SF}},
        "pipeline": {
            "processors": [
                {"json_schema": {"field": "props", "schema": {
                    "required": ["k"],
                    "properties": {"k": {"type": "integer", "maximum": 50}},
                }}},
                # try: only healthy rows get the marker
                {"try": [{"mutation": 'root.state = "valid"'}]},
                # catch: errored rows recover with a fallback marker
                {"catch": [{"mutation": 'root.state = "recovered"'}]},
            ]
        },
    }
    df = build_pipeline(spark, cfg).dataframe()
    rows = df.collect()
    states = {r["state"] for r in rows}
    assert states == {"valid", "recovered"}
    # catch cleared all error flags
    assert all(r["_error"] is None for r in rows)
    n_recovered = sum(r["state"] == "recovered" for r in rows)
    assert n_recovered > 0


def test_json_schema_extended_keywords(spark):
    from pyspark.sql import Row

    from connect_spark.functions.jsonschema import json_schema_validate

    schema = {
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 2, "maxLength": 5,
                     "pattern": "^[a-z]+$"},
            "level": {"type": "string", "enum": ["low", "high"]},
            "score": {"type": "number", "exclusiveMinimum": 0,
                      "exclusiveMaximum": 100},
            "tags": {"type": "array", "minItems": 1, "maxItems": 3},
        },
    }
    rows = [
        Row(j='{"name": "abc", "level": "low", "score": 50, "tags": ["x"]}'),
        Row(j='{"name": "a"}'),                       # too short
        Row(j='{"name": "abcdefg"}'),                 # too long
        Row(j='{"name": "ABC"}'),                     # pattern
        Row(j='{"name": "abc", "level": "mid"}'),     # enum
        Row(j='{"name": "abc", "score": 0}'),         # exclusive min
        Row(j='{"name": "abc", "score": 100}'),       # exclusive max
        Row(j='{"name": "abc", "tags": []}'),         # minItems
        Row(j='{"name": "abc", "tags": ["a","b","c","d"]}'),  # maxItems
    ]
    out = json_schema_validate(
        spark.createDataFrame(rows), "j", schema
    ).collect()
    errs = [r._error for r in out]
    assert errs[0] is None
    assert "too short" in errs[1]
    assert "too long" in errs[2]
    assert "pattern" in errs[3]
    assert "enum" in errs[4]
    assert "exclusive minimum" in errs[5]
    assert "exclusive maximum" in errs[6]
    assert "too few items" in errs[7]
    assert "too many items" in errs[8]
