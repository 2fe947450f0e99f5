"""postgres_cdc over RECORDED pgoutput wire bytes: the streaming
DataSource consumes .pgcopy segments (real logical-decoding frames),
filters transaction markers like the reference's
include_transaction_markers default, resumes from checkpointed LSN
offsets, and materializes through the same apply path
(internal/impl/postgresql/pglogicalstream + input_pg_stream.go)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from connect_spark.plans.pipeline import Pipeline
from connect_spark.sources.cdc_stream import PgoutputWal
from connect_spark.sources.pgoutput import (
    OID_INT8,
    OID_NUMERIC,
    OID_TEXT,
    PgoutputFixtureWriter,
)

COLS = [("id", OID_INT8), ("status", OID_TEXT), ("price", OID_NUMERIC)]


def _record_segments(wal_dir):
    """Two recorded stretches of one replication session: the Relation
    message only appears in the first (schema state must carry)."""
    wal_dir.mkdir(exist_ok=True)
    w1 = PgoutputFixtureWriter(start_lsn=10)
    w1.relation(16385, "accounts", COLS)
    w1.begin(commit_ts_us=5_000_000, xid=1)
    for i in range(1, 5):
        w1.insert({"id": i, "status": "open", "price": f"{i}.50"})
    w1.commit(commit_ts_us=5_000_000)
    w1.copy_done()
    (wal_dir / "seg-000.pgcopy").write_bytes(w1.getvalue())

    w2 = PgoutputFixtureWriter(start_lsn=w1.lsn)
    w2.use_relation(16385, COLS)
    w2.begin(commit_ts_us=6_000_000, xid=2)
    w2.update({"id": 2, "status": "closed", "price": "2.50"},
              before={"id": 2}, key_only=True)
    w2.delete({"id": 3})
    w2.commit(commit_ts_us=6_000_000)
    w2.copy_done()
    (wal_dir / "seg-001.pgcopy").write_bytes(w2.getvalue())


def test_pgoutput_wal_reader_decodes_segments(tmp_path):
    wal_dir = tmp_path / "pgwal"
    _record_segments(wal_dir)
    recs = list(PgoutputWal(str(wal_dir)).records(after_lsn=0))
    ops = [r["operation"] for r in recs]
    assert ops == (["begin"] + ["insert"] * 4 + ["commit"]
                   + ["begin", "update", "delete", "commit"])
    assert recs[1]["after"] == {"id": 1, "status": "open", "price": "1.50"}
    # LSN-filtered resume skips already-consumed positions
    tail = list(PgoutputWal(str(wal_dir)).records(after_lsn=recs[5]["lsn"]))
    assert [r["operation"] for r in tail] == [
        "begin", "update", "delete", "commit"]


def test_postgres_cdc_input_consumes_pgoutput(spark, tmp_path):
    wal_dir = tmp_path / "pgwal"
    _record_segments(wal_dir)
    df = Pipeline(spark, {"input": {"postgres_cdc": {
        "dsn": "postgres://u@h/db", "wal_path": str(wal_dir),
    }}}).dataframe()
    assert df.isStreaming
    import uuid

    name = "pgout_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    # transaction markers filtered by default (postgres_cdc.adoc)
    ops = sorted(r.operation for r in rows)
    assert ops == ["delete"] + ["insert"] * 4 + ["update"]
    by_op = {r.operation: r for r in rows}
    after = json.loads(by_op["update"].after)
    assert after == {"id": 2, "status": "closed", "price": "2.50"}
    assert by_op["update"].table == "accounts"
    # commit timestamps from Begin (PG epoch µs → unix ms)
    assert by_op["insert"].commit_ts_ms == 946684805000


def test_postgres_cdc_pgoutput_materializes(spark, tmp_path):
    """Full pipeline: decoded pgoutput changelog → last-writer-wins
    materialization equals the expected table state."""
    wal_dir = tmp_path / "pgwal"
    _record_segments(wal_dir)
    df = Pipeline(spark, {"input": {"postgres_cdc": {
        "dsn": "postgres://u@h/db", "wal_path": str(wal_dir),
    }}}).dataframe()
    import uuid

    name = "pgmat_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window

    env = spark.table(name)
    parsed = env.select(
        "lsn", "operation",
        F.get_json_object("after", "$.id").cast("long").alias("id_after"),
        F.get_json_object("before", "$.id").cast("long").alias("id_before"),
        F.get_json_object("after", "$.status").alias("status"),
        F.get_json_object("after", "$.price").alias("price"),
    ).withColumn("id", F.coalesce("id_after", "id_before"))
    w = Window.partitionBy("id").orderBy(F.col("lsn").desc())
    final = (parsed.withColumn("rn", F.row_number().over(w))
             .filter((F.col("rn") == 1) & (F.col("operation") != "delete"))
             .select("id", "status", "price"))
    got = {r.id: (r.status, r.price) for r in final.collect()}
    assert got == {
        1: ("open", "1.50"),
        2: ("closed", "2.50"),
        4: ("open", "4.50"),
    }


def test_unchanged_toast_resolves_to_previous_value(spark, tmp_path):
    """pgoutput tuple category 'u' (unchanged TOAST): the apply layer
    must fall back to the previous row image — within the batch AND
    across batches from stored state — never persist the marker."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from connect_spark.sources.cdc_stream import materialize_cdc_stream
    from connect_spark.sources.pgoutput import UNCHANGED_TOAST
    from connect_spark.state.cache import ParquetKVCache

    schema = StructType([
        StructField("id", LongType()),
        StructField("blob", StringType()),
        StructField("st", StringType()),
    ])
    cols = [("id", OID_INT8), ("blob", OID_TEXT), ("st", OID_TEXT)]
    wal = tmp_path / "toastwal"
    wal.mkdir()
    w = PgoutputFixtureWriter()
    w.relation(900, "t", cols)
    w.begin(0)
    # insert with real blob, then update that leaves it TOASTed
    w.insert({"id": 1, "blob": "BIGVALUE", "st": "a"})
    w.update({"id": 1, "blob": UNCHANGED_TOAST, "st": "b"},
             before={"id": 1})
    # a second key whose toast marker has NO predecessor in any batch
    w.update({"id": 2, "blob": UNCHANGED_TOAST, "st": "z"},
             before={"id": 2})
    w.commit(0)
    w.copy_done()
    (wal / "seg-0.pgcopy").write_bytes(w.getvalue())

    cache = ParquetKVCache(spark, str(tmp_path / "state"), key="id")
    q = materialize_cdc_stream(
        spark, wal_path=str(wal), snapshot_path=None,
        row_schema=schema, key="id", cache=cache,
        checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {r.id: (r.blob, r.st) for r in cache.read().collect()}
    # in-batch fallback: blob survives the TOASTed update
    assert state[1] == ("BIGVALUE", "b")
    # no previous image anywhere: marker becomes null, not the literal
    assert state[2] == (None, "z")

    # cross-batch: a later segment's TOASTed update must pull the
    # value from the STORED state
    w2 = PgoutputFixtureWriter(start_lsn=100)
    w2.use_relation(900, cols)
    w2.begin(0)
    w2.update({"id": 1, "blob": UNCHANGED_TOAST, "st": "c"},
              before={"id": 1})
    w2.commit(0)
    w2.copy_done()
    (wal / "seg-1.pgcopy").write_bytes(w2.getvalue())
    q = materialize_cdc_stream(
        spark, wal_path=str(wal), snapshot_path=None,
        row_schema=schema, key="id", cache=cache,
        checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {r.id: (r.blob, r.st) for r in cache.read().collect()}
    assert state[1] == ("BIGVALUE", "c")
