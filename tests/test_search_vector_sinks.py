"""Search/vector sinks: ES bulk body construction + transport POSTs,
vector upsert/delete/search round-trip (internal/impl/elasticsearch/,
vector output family)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from connect_spark.sinks.search import VectorSink, es_bulk_write


def test_es_bulk_write_posts_ndjson(spark):
    sent = []

    def transport(req):
        sent.append(req)
        return {"status": 200, "headers": {}, "body": "{}"}

    df = spark.createDataFrame(
        [Row(id=1, title="a", score=0.5), Row(id=2, title="b", score=1.5)]
    ).repartition(1)
    n = es_bulk_write(
        df, {"url": "http://es:9200", "index": "docs"}, transport, id_col="id"
    )
    assert n == 1
    req = sent[0]
    assert req["url"] == "http://es:9200/_bulk"
    assert req["headers"]["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(l) for l in req["body"].strip().split("\n")]
    # alternating action/source lines
    actions = lines[0::2]
    sources = lines[1::2]
    assert {a["index"]["_id"] for a in actions} == {"1", "2"}
    assert all(a["index"]["_index"] == "docs" for a in actions)
    assert {s["title"] for s in sources} == {"a", "b"}


def test_vector_sink_upsert_search_delete(spark, tmp_path):
    sink = VectorSink(spark, str(tmp_path / "vecs"), id_col="id")
    rows = [
        Row(id=1, vector=[1.0, 0.0], tag="x"),
        Row(id=2, vector=[0.9, 0.1], tag="y"),
        Row(id=3, vector=[0.0, 1.0], tag="z"),
    ]
    sink.upsert(spark.createDataFrame(rows))

    top = sink.search([1.0, 0.0], k=2).collect()
    assert [r.id for r in top] == [1, 2]
    assert [r.rank for r in top] == [1, 2]

    # upsert overwrites by key; delete removes
    sink.upsert(
        spark.createDataFrame([Row(id=2, vector=[0.0, 1.0], tag="y2")])
    )
    sink.delete(spark.createDataFrame([Row(id=1)]))
    top2 = sink.search([1.0, 0.0], k=3).collect()
    assert [r.id for r in top2] == [2, 3] or [r.id for r in top2] == [3, 2]
    assert {r.tag for r in top2} == {"y2", "z"}


def test_vector_sink_search_plan_takeordered(spark, tmp_path):
    """search() must TakeOrdered, not sort the whole store in one task."""
    sink = VectorSink(spark, str(tmp_path / "vecs_p"), id_col="id")
    sink.upsert(spark.createDataFrame(
        [Row(id=i, vector=[float(i), 1.0]) for i in range(20)]))
    res = sink.search([1.0, 0.0], k=3)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    # the only remaining sort feeds the k-row rank window, never the
    # full store: no Sort may appear below the TakeOrdered boundary
    below = plan.split("TakeOrdered", 1)[1]
    assert "Sort " not in below and "Sort\n" not in below
