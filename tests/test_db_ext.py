"""DB / KV / warehouse / search connector kinds (plans/db_ext.py)."""

from __future__ import annotations

import json
import os

import pytest

from connect_spark.plans.db_ext import _KV_KINDS, _WAREHOUSE_OUTPUTS
from connect_spark.plans.pipeline import (
    INPUT_KINDS,
    OUTPUT_KINDS,
    PROCESSORS,
    Pipeline,
    PipelineConfigError,
)

_KV_IDENTITY = {
    "mongodb": {"url": "mongodb://h", "database": "db",
                "collection": "users"},
    "couchbase": {"url": "couchbase://h", "bucket": "b"},
    "azure_cosmosdb": {"database": "db", "container": "c"},
    "azure_table_storage": {"table_name": "t"},
    "aws_dynamodb": {"table": "t"},
    "redis_hash": {"key": "h"},
    "nats_kv": {"bucket": "b"},
}


@pytest.mark.parametrize("kind", sorted(_KV_KINDS))
def test_kv_output_upserts(spark, tmp_path, kind):
    _, default_key = _KV_KINDS[kind]
    store = str(tmp_path / kind)
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2")], f"{default_key} string, val string"
    )
    OUTPUT_KINDS[kind](df, {**_KV_IDENTITY[kind], "store_path": store})
    from connect_spark.state.cache import ParquetKVCache

    got = ParquetKVCache(spark, store, key=default_key).read()
    assert sorted((r[default_key], r.val) for r in got.collect()) == [
        ("k1", "v1"), ("k2", "v2")]


def test_kv_output_requires_identity(spark, tmp_path):
    df = spark.createDataFrame([("a", "b")], "_id string, v string")
    with pytest.raises(PipelineConfigError, match="url"):
        OUTPUT_KINDS["mongodb"](df, {"store_path": str(tmp_path / "x")})


def test_kv_output_requires_store_path(spark):
    df = spark.createDataFrame([("a", "b")], "_id string, v string")
    with pytest.raises(PipelineConfigError, match="store_path"):
        OUTPUT_KINDS["mongodb"](df, _KV_IDENTITY["mongodb"])


def test_mongodb_input_filter_operators(spark, tmp_path):
    store = str(tmp_path / "mongo")
    df = spark.createDataFrame(
        [("a", 5, "x"), ("b", 12, "y"), ("c", 30, "x")],
        "_id string, qty int, cat string",
    )
    OUTPUT_KINDS["mongodb"](
        df, {**_KV_IDENTITY["mongodb"], "store_path": store})
    got = Pipeline(spark, {"input": {"mongodb": {
        **_KV_IDENTITY["mongodb"], "store_path": store,
        "query": {"qty": {"$gte": 10}, "cat": "x"},
    }}}).dataframe()
    assert [r._id for r in got.collect()] == ["c"]
    got_or = Pipeline(spark, {"input": {"mongodb": {
        **_KV_IDENTITY["mongodb"], "store_path": store,
        "query": {"$or": [{"qty": {"$lt": 6}}, {"qty": {"$in": [12]}}]},
    }}}).dataframe()
    assert sorted(r._id for r in got_or.collect()) == ["a", "b"]


def test_mongodb_processor_find_and_insert(spark, tmp_path):
    store = str(tmp_path / "mstore")
    seed = spark.createDataFrame(
        [("u1", "ada"), ("u2", "lin")], "_id string, name string")
    OUTPUT_KINDS["mongodb"](
        seed, {**_KV_IDENTITY["mongodb"], "store_path": store})
    facts = spark.createDataFrame([("u1", 3), ("u2", 5)],
                                  "_id string, n int")
    out = PROCESSORS["mongodb"](facts, {
        **_KV_IDENTITY["mongodb"], "store_path": store,
        "operation": "find-one"})
    assert sorted((r._id, r.name) for r in out.collect()) == [
        ("u1", "ada"), ("u2", "lin")]


def test_duckdb_sql_inputs(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "ext.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE users(id INT, name VARCHAR)")
    con.execute("INSERT INTO users VALUES (1,'ada'),(2,'lin')")
    con.close()
    got = Pipeline(spark, {"input": {"cassandra": {
        "addresses": ["h"], "database": db,
        "query": "SELECT * FROM users WHERE id = 1"}}}).dataframe()
    assert [(r.id, r.name) for r in got.collect()] == [(1, "ada")]
    got_bq = Pipeline(spark, {"input": {"gcp_bigquery_select": {
        "database": db, "table": "proj.ds.users",
        "columns": ["name"], "where": "id = 2"}}}).dataframe()
    assert [r.name for r in got_bq.collect()] == ["lin"]
    got_tp = Pipeline(spark, {"input": {"timeplus": {
        "database": db, "query": "SELECT count(*) AS n FROM users"}}}
    ).dataframe()
    assert got_tp.collect()[0].n == 2


@pytest.mark.parametrize("kind", sorted(_WAREHOUSE_OUTPUTS))
def test_warehouse_output_duckdb_insert(spark, tmp_path, kind):
    import duckdb

    db = str(tmp_path / f"{kind}.duckdb")
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    tkeys = _WAREHOUSE_OUTPUTS[kind]
    OUTPUT_KINDS[kind](df, {tkeys[0]: "ds.t1", "database": db})
    con = duckdb.connect(db)
    assert con.execute("SELECT id, v FROM t1").fetchall() == [(1, "a")]
    con.close()


def test_warehouse_output_parquet_path(spark, tmp_path):
    out = str(tmp_path / "wh")
    df = spark.createDataFrame([(1,)], "id int")
    OUTPUT_KINDS["gcp_bigquery"](df, {"table": "t", "path": out})
    assert spark.read.parquet(out).count() == 1


def test_snowflake_put_stages_files(spark, tmp_path):
    stage = str(tmp_path / "stage")
    df = spark.createDataFrame([(1,), (2,)], "id int")
    OUTPUT_KINDS["snowflake_put"](df, {"stage_path": stage})
    assert sorted(
        r.id for r in spark.read.parquet(stage).collect()) == [1, 2]
    OUTPUT_KINDS["snowflake_streaming"](
        df, {"stage_path": stage + "2", "channel_name": "ch1"})
    # bdec contract: chunk-registration rows + staged encrypted blobs +
    # registerBlobRequest JSON (full parity in test_snowflake_ingest.py)
    import os

    got = spark.read.parquet(stage + "2/chunks")
    assert sum(r.rows for r in got.collect()) == 2
    import glob as _glob

    assert _glob.glob(stage + "2/register_*.json")
    assert os.listdir(stage + "2/blobs")


def test_es_bulk_and_aliases(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    bodies: list[str] = []
    register_http_transport(
        "cap_es", lambda url, verb, headers, body: bodies.append(body) or "")
    df = spark.createDataFrame([("d1", "x"), ("d2", "y")],
                               "id string, v string").coalesce(1)
    OUTPUT_KINDS["elasticsearch_v8"](
        df, {"url": "http://es", "index": "docs", "transport": "cap_es"})
    lines = [ln for b in bodies for ln in b.strip().split("\n")]
    actions = [json.loads(ln) for ln in lines[0::2]]
    docs = [json.loads(ln) for ln in lines[1::2]]
    assert {a["index"]["_id"] for a in actions} == {"d1", "d2"}
    assert {d["v"] for d in docs} == {"x", "y"}
    assert OUTPUT_KINDS["opensearch"] is OUTPUT_KINDS["elasticsearch_v8"]
    assert OUTPUT_KINDS["elasticsearch_v9"] is OUTPUT_KINDS["elasticsearch_v8"]


def test_questdb_ilp_lines(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    bodies: list[str] = []
    register_http_transport(
        "cap_ilp", lambda url, verb, headers, body: bodies.append(body) or "")
    df = spark.createDataFrame([(1, "a")], "qty int, tag string").coalesce(1)
    OUTPUT_KINDS["questdb"](
        df, {"url": "http://qdb", "table": "m", "transport": "cap_ilp"})
    line = bodies[0].strip()
    assert line == 'm qty=1,tag="a"'


def test_splunk_hec_envelope(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    bodies: list[str] = []
    register_http_transport(
        "cap_hec", lambda url, verb, headers, body: bodies.append(body) or "")
    df = spark.createDataFrame([("e1",)], "msg string").coalesce(1)
    OUTPUT_KINDS["splunk_hec"](
        df, {"url": "http://hec", "transport": "cap_hec", "index": "ops"})
    doc = json.loads(bodies[0].strip())
    assert doc["index"] == "ops"
    assert doc["event"]["msg"] == "e1"


def test_vector_outputs_and_qdrant_processor(spark, tmp_path):
    store = str(tmp_path / "vec")
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, vector array<double>",
    )
    OUTPUT_KINDS["pinecone"](df, {"store_path": store})
    from connect_spark.sinks.search import VectorSink

    hits = VectorSink(spark, store).search([1.0, 0.0], k=1)
    assert hits.collect()[0].id == "a"
    out = PROCESSORS["qdrant"](df, {"store_path": str(tmp_path / "v2")})
    assert out.count() == 2  # pass-through


def test_schema_registry_roundtrip(spark, tmp_path):
    reg = str(tmp_path / "registry")
    df = spark.createDataFrame(
        [("orders", '{"type":"string"}')], "subject string, schema string")
    OUTPUT_KINDS["schema_registry"](df, {"path": reg})
    OUTPUT_KINDS["schema_registry"](df, {"path": reg})  # second version
    got = Pipeline(
        spark, {"input": {"schema_registry": {"path": reg}}}
    ).dataframe()
    rows = sorted(got.collect(), key=lambda r: r.version)
    assert [(r.subject, r.version) for r in rows] == [
        ("orders", 1), ("orders", 2)]
    assert os.path.exists(os.path.join(reg, "orders-v2.json"))


def test_partiql_processor(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "p.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t(id INT, label VARCHAR)")
    con.execute("INSERT INTO t VALUES (1,'one'),(2,'two')")
    con.close()
    df = spark.createDataFrame([(1,), (2,)], "id int")
    out = PROCESSORS["aws_dynamodb_partiql"](df, {
        "database": db, "query": "SELECT * FROM t", "on": "id"})
    assert sorted((r.id, r.label) for r in out.collect()) == [
        (1, "one"), (2, "two")]


def test_all_db_kinds_registered():
    for kind in ("mongodb", "nats_kv", "azure_table_storage", "cassandra",
                 "gcp_bigquery_select", "timeplus", "schema_registry"):
        assert kind in INPUT_KINDS, kind
    for kind in (list(_KV_KINDS) + list(_WAREHOUSE_OUTPUTS)
                 + ["snowflake_put", "snowflake_streaming", "arc",
                    "elasticsearch_v8", "elasticsearch_v9", "opensearch",
                    "splunk_hec", "questdb", "doris_stream_load", "cypher",
                    "pusher", "pinecone", "qdrant", "cyborgdb",
                    "schema_registry"]):
        assert kind in OUTPUT_KINDS, kind
    for kind in ("mongodb", "gcp_bigquery_select", "aws_dynamodb_partiql",
                 "qdrant"):
        assert kind in PROCESSORS, kind


def test_kv_processors_ops(spark, tmp_path):
    store = str(tmp_path / "cb")
    seed = spark.createDataFrame(
        [("d1", "ada")], "id string, name string")
    PROCESSORS["couchbase"](seed, {
        "store_path": store, "operation": "upsert",
        "value_columns": ["name"]})
    df = spark.createDataFrame([("d1",)], "id string")
    got = PROCESSORS["couchbase"](df, {
        "store_path": store, "operation": "get"})
    assert got.collect()[0].name == "ada"
    # insert never overwrites (couchbase insert = add)
    PROCESSORS["couchbase"](
        spark.createDataFrame([("d1", "NEW")], "id string, name string"),
        {"store_path": store, "operation": "insert",
         "value_columns": ["name"]})
    got2 = PROCESSORS["couchbase"](df, {
        "store_path": store, "operation": "get"})
    assert got2.collect()[0].name == "ada"
    # nats_kv + azure_cosmosdb share the family
    PROCESSORS["nats_kv"](
        spark.createDataFrame([("k1", "v")], "key string, v string"),
        {"store_path": str(tmp_path / "nkv"), "operation": "put",
         "value_columns": ["v"]})
    with pytest.raises(PipelineConfigError, match="unknown operation"):
        PROCESSORS["azure_cosmosdb"](df, {
            "store_path": store, "operation": "bogus"})


def test_azure_cosmosdb_input_query(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "cos.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE c(id VARCHAR, n INT)")
    con.execute("INSERT INTO c VALUES ('a', 1)")
    con.close()
    got = Pipeline(spark, {"input": {"azure_cosmosdb": {
        "database": "db", "container": "c", "storage": db,
        "query": "SELECT * FROM c"}}}).dataframe()
    assert [(r.id, r.n) for r in got.collect()] == [("a", 1)]


def test_redis_rate_limit_kind():
    from connect_spark.state.ratelimit import register_rate_limit

    rl = register_rate_limit("rr", {"redis": {
        "url": "redis://h", "count": 5, "interval": "1s"}})
    assert rl.count == 5
    with pytest.raises(ValueError, match="url"):
        register_rate_limit("rr2", {"redis": {}})
    with pytest.raises(ValueError, match="known: local, redis"):
        register_rate_limit("rr3", {"memcached": {}})


def test_post_lines_max_in_flight(spark):
    import threading

    from connect_spark.plans.processors_ext import register_http_transport

    seen = []
    lock = threading.Lock()

    def slow_capture(url, verb, headers, body):
        with lock:
            seen.append(body)
        return ""

    register_http_transport("cap_mif", slow_capture)
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(8)], "qty int, tag string"
    ).repartition(4)
    OUTPUT_KINDS["questdb"](df, {
        "url": "http://qdb", "table": "m", "transport": "cap_mif",
        "max_in_flight": 3})
    lines = [ln for b in seen for ln in b.strip().split("\n")]
    assert len(lines) == 8  # every row delivered exactly once


def test_es_bulk_max_in_flight(spark):
    import threading

    from connect_spark.plans.processors_ext import register_http_transport

    seen = []
    lock = threading.Lock()

    def cap(url, verb, headers, body):
        with lock:
            seen.append((url, body))
        return ""

    register_http_transport("cap_es_mif", cap)
    df = spark.createDataFrame(
        [(f"d{i}", f"v{i}") for i in range(6)],
        "id string, v string").repartition(3)
    OUTPUT_KINDS["elasticsearch_v8"](df, {
        "url": "http://es", "index": "docs",
        "transport": "cap_es_mif", "max_in_flight": 2})
    assert all(u.endswith("/_bulk") for u, _ in seen)
    lines = [ln for _, b in seen for ln in b.strip().split("\n")]
    ids = {json.loads(ln)["index"]["_id"]
           for ln in lines if '"index"' in ln}
    assert ids == {f"d{i}" for i in range(6)}
