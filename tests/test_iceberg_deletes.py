"""Iceberg v2 positional deletes (merge-on-read):
delete_where → sorted parquet tombstones + deletes manifest + delete
snapshot; read()/scan() apply them without rewriting data files."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connect_spark.functions.avro_codec import read_ocf
from connect_spark.sinks.iceberg_meta import IcebergTable


def _table(spark, tmp_path, n=1000):
    t = IcebergTable(spark, str(tmp_path / "tbl"))
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    t.append(df)
    return t


def test_delete_where_masks_rows_without_rewriting_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    data_before = sorted(d["file_path"] for d in t.current_files())
    sizes_before = {p: os.path.getsize(p) for p in data_before}
    meta = t.delete_where([("grp", "=", 3)])
    # data files untouched, byte for byte
    data_after = sorted(d["file_path"] for d in t.current_files())
    assert data_after == data_before
    assert {p: os.path.getsize(p) for p in data_after} == sizes_before
    # rows masked at read time
    got = t.read()
    assert got.filter(F.col("grp") == 3).count() == 0
    expected_live = 1000 - (1000 + 7 - 1 - 3) // 7  # ids ≡ 3 (mod 7)
    assert got.count() == expected_live
    snap = meta["snapshots"][-1]
    assert snap["summary"]["operation"] == "delete"
    assert snap["summary"]["total-records"] == str(expected_live)


def test_delete_files_sorted_with_spec_schema(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("k", "<", 50)])
    dels = t.current_delete_files()
    assert dels and all(d["content"] == 1 for d in dels)
    rows = spark.read.parquet(
        *[d["file_path"] for d in dels]).collect()
    assert len(rows) == 50
    assert set(rows[0].asDict()) == {"file_path", "pos"}
    # per-file sort by (file_path, pos) — the spec's ordering
    for d in dels:
        content = spark.read.parquet(d["file_path"]).collect()
        keys = [(r["file_path"], r["pos"]) for r in content]
        assert keys == sorted(keys)
        # tombstones reference real current data files
        data_paths = {f["file_path"] for f in t.current_files()}
        assert {r["file_path"] for r in content} <= data_paths


def test_deletes_manifest_content_flag(spark, tmp_path):
    t = _table(spark, tmp_path)
    meta = t.delete_where([("grp", "=", 0)])
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests = read_ocf(open(snap["manifest-list"], "rb").read())
    contents = sorted(m["content"] for m in manifests)
    assert contents == [0, 1]  # one data manifest, one deletes manifest
    delete_manifest = next(m for m in manifests if m["content"] == 1)
    ocf_meta, entries = read_ocf(
        open(delete_manifest["manifest_path"], "rb").read())
    assert all(e["data_file"]["content"] == 1 for e in entries)


def test_successive_deletes_accumulate(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("k", "<", 10)])
    t.delete_where([("k", ">=", 990)])
    got = t.read()
    assert got.count() == 980
    assert got.agg(F.min("k")).collect()[0][0] == 10
    assert got.agg(F.max("k")).collect()[0][0] == 989
    # second delete over already-deleted rows is a no-op on the result
    t.delete_where([("k", "<", 10)])
    assert t.read().count() == 980


def test_scan_applies_deletes_with_pruning(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("grp", "=", 5)])
    got = t.scan(filters=[("k", ">=", 500)])
    assert got.filter(F.col("grp") == 5).count() == 0
    assert got.count() == 500 - len(
        [k for k in range(500, 1000) if k % 7 == 5])


def test_delete_without_snapshot_raises(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        t.delete_where([("k", "=", 1)])


def test_delete_matching_nothing_adds_no_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("k", "=", -1)])
    assert t.current_delete_files() == []
    assert t.read().count() == 1000


def test_delete_on_partitioned_table(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "ptbl"))
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("bucket"),
    )
    t.append(df, partition_by=["bucket"])
    t.delete_where([("k", "<", 20)])
    got = t.read()
    assert got.count() == 180
    assert got.agg(F.min("k")).collect()[0][0] == 20


# --- equality deletes / upsert / compaction ---

def test_equality_delete_masks_matching_rows(spark, tmp_path):
    t = _table(spark, tmp_path, n=100)
    keys = spark.createDataFrame([(3,), (7,)], "grp long")
    meta = t.delete_by_keys(keys)
    got = t.read()
    assert got.filter(F.col("grp").isin(3, 7)).count() == 0
    expected = 100 - len([k for k in range(100) if k % 7 in (3, 7)])
    assert got.count() == expected
    dels = t.current_files(content=2)
    assert dels and all(d["content"] == 2 for d in dels)
    # equality_ids reference the grp field id in the schema
    schema = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"])
    grp_id = next(f["id"] for f in schema["fields"]
                  if f["name"] == "grp")
    assert all(d["equality_ids"] == [grp_id] for d in dels)


def test_equality_delete_not_applied_to_later_appends(spark, tmp_path):
    t = _table(spark, tmp_path, n=50)
    t.delete_by_keys(spark.createDataFrame([(1,)], "grp long"))
    # re-append rows with the deleted key AFTER the delete: strictly
    # higher sequence, so the tombstone must not mask them
    t.append(spark.createDataFrame(
        [(1000, 1, "resurrected")], "k long, grp long, payload string"))
    got = t.read()
    assert got.filter(F.col("grp") == 1).count() == 1
    assert got.filter(F.col("k") == 1000).count() == 1


def test_upsert_replaces_by_key(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "utbl"))
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    t.upsert(spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k long, v string"), ["k"])
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # upsert again over the same key: latest wins
    t.upsert(spark.createDataFrame([(2, "B3")], "k long, v string"),
             ["k"])
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[2] == "B3" and len(got) == 4


def test_rewrite_data_files_drops_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path, n=200)
    t.delete_where([("k", "<", 50)])
    t.delete_by_keys(spark.createDataFrame([(5,)], "grp long"))
    live_before = t.read()
    n_live = live_before.count()
    rows_before = {r["k"] for r in live_before.collect()}
    meta = t.rewrite_data_files()
    snap = meta["snapshots"][-1]
    assert snap["summary"]["operation"] == "replace"
    assert snap["summary"]["total-records"] == str(n_live)
    # all tombstones gone; reads still correct
    assert t.current_files(content=1) == []
    assert t.current_files(content=2) == []
    after = t.read()
    assert after.count() == n_live
    assert {r["k"] for r in after.collect()} == rows_before


def test_position_delete_after_equality_delete_composes(spark, tmp_path):
    t = _table(spark, tmp_path, n=100)
    t.delete_by_keys(spark.createDataFrame([(0,)], "grp long"))
    t.delete_where([("k", ">=", 90)])
    got = t.read()
    assert got.filter(F.col("grp") == 0).count() == 0
    assert got.filter(F.col("k") >= 90).count() == 0


def test_iceberg_output_kind_upsert_mode(spark, tmp_path):
    """The YAML iceberg output's upsert mode: successive CDC-shaped
    batches land last-writer-wins state in the table."""
    from connect_spark.plans.io_ext import _o_iceberg

    loc = str(tmp_path / "sink")
    b1 = spark.createDataFrame(
        [(1, "open"), (2, "open")], "k long, st string")
    b2 = spark.createDataFrame(
        [(2, "closed"), (3, "open")], "k long, st string")
    _o_iceberg(b1, {"location": loc, "mode": "upsert", "keys": ["k"]})
    _o_iceberg(b2, {"location": loc, "mode": "upsert", "keys": ["k"]})
    got = {r["k"]: r["st"]
           for r in IcebergTable(spark, loc).read().collect()}
    assert got == {1: "open", 2: "closed", 3: "open"}
    # delete mode tombstones by key
    _o_iceberg(
        spark.createDataFrame([(1,)], "k long"),
        {"location": loc, "mode": "delete"})
    got = {r["k"] for r in IcebergTable(spark, loc).read().collect()}
    assert got == {2, 3}
    with pytest.raises(ValueError):
        _o_iceberg(b1, {"location": loc, "mode": "upsert"})
    with pytest.raises(ValueError):
        _o_iceberg(b1, {"location": loc, "mode": "bogus"})


def test_cdc_changelog_to_iceberg_sink(spark, tmp_path):
    """CDC → Iceberg: a change log (insert/update/delete envelopes)
    applied batch-by-batch through upsert/delete modes yields exactly
    the last-writer-wins state — the lakehouse CDC sink composition
    the reference's snowflake/iceberg users run."""
    from connect_spark.plans.io_ext import _o_iceberg

    loc = str(tmp_path / "cdc_sink")
    conf_up = {"location": loc, "mode": "upsert", "keys": ["k"]}
    conf_del = {"location": loc, "mode": "delete", "keys": ["k"]}
    batches = [
        [("insert", 1, "a1"), ("insert", 2, "b1"), ("insert", 3, "c1")],
        [("update", 2, "b2"), ("delete", 3, None), ("insert", 4, "d1")],
        [("update", 4, "d2"), ("insert", 3, "c2")],
    ]
    for batch in batches:
        rows = spark.createDataFrame(
            batch, "op string, k long, v string")
        ups = rows.filter("op != 'delete'").select("k", "v")
        dels = rows.filter("op = 'delete'").select("k")
        if ups.count():
            _o_iceberg(ups, conf_up)
        if dels.count():
            _o_iceberg(dels, conf_del)
    got = {r["k"]: r["v"]
           for r in IcebergTable(spark, loc).read().collect()}
    assert got == {1: "a1", 2: "b2", 3: "c2", 4: "d2"}
    # compaction over the full history keeps the same state
    t = IcebergTable(spark, loc)
    t.rewrite_data_files()
    got2 = {r["k"]: r["v"] for r in t.read().collect()}
    assert got2 == got


def test_streaming_cdc_to_iceberg_checkpointed(spark, tmp_path):
    """The full lakehouse-CDC stream: cdc_wal streaming source →
    foreachBatch upsert/delete into an Iceberg v2 table, with
    checkpointed exactly-once resume — changes appended while the
    stream is down apply exactly once on restart."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from connect_spark.sources.cdc_stream import (
        CdcWal,
        cdc_changes_to_rows,
        register,
    )

    register(spark)
    schema = StructType([
        StructField("id", LongType()), StructField("val", StringType())])
    wal_dir = str(tmp_path / "wal")
    loc = str(tmp_path / "tbl")
    wal = CdcWal(wal_dir)
    wal.append([
        {"op": "insert", "after": {"id": 1, "val": "a"}},
        {"op": "insert", "after": {"id": 2, "val": "b"}},
        {"op": "update", "before": {"id": 1, "val": "a"},
         "after": {"id": 1, "val": "a2"}},
    ])

    def run_once():
        stream = (spark.readStream.format("cdc_wal")
                  .option("path", wal_dir).load())

        def _apply(batch, _epoch):
            t = IcebergTable(spark, loc)
            rows = cdc_changes_to_rows(batch, schema, "id")
            ups = rows.filter(
                "operation != 'delete'").select("id", "val")
            dels = rows.filter("operation = 'delete'").select("id")
            if ups.count():
                t.upsert(ups, ["id"])
            if dels.count() and t.metadata() is not None:
                t.delete_by_keys(dels)

        q = (stream.writeStream.foreachBatch(_apply)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    got = {r["id"]: r["val"]
           for r in IcebergTable(spark, loc).read().collect()}
    assert got == {1: "a2", 2: "b"}
    # stream down; more changes land
    wal.append([
        {"op": "delete", "before": {"id": 2, "val": "b"}},
        {"op": "insert", "after": {"id": 3, "val": "c"}},
    ])
    run_once()
    got = {r["id"]: r["val"]
           for r in IcebergTable(spark, loc).read().collect()}
    assert got == {1: "a2", 3: "c"}


def test_update_where_transforms_matching_rows(spark, tmp_path):
    t = _table(spark, tmp_path, n=100)
    t.update_where([("grp", "=", 2)],
                   {"payload": F.lit("UPDATED")})
    got = t.read()
    updated = got.filter(F.col("grp") == 2).collect()
    assert updated and all(r["payload"] == "UPDATED" for r in updated)
    assert len(updated) == len([k for k in range(100) if k % 7 == 2])
    untouched = got.filter(F.col("grp") != 2).collect()
    assert all(r["payload"] != "UPDATED" for r in untouched)
    assert got.count() == 100  # row count preserved
    # updating the updated rows again composes
    t.update_where([("grp", "=", 2)], {"payload": F.lit("TWICE")})
    assert t.read().filter(
        F.col("payload") == "TWICE").count() == len(updated)


def test_update_where_on_partitioned_table(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "uptbl"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        F.lit("orig").alias("v"),
    )
    t.append(df, partition_by=["bucket"])
    t.update_where([("k", "<", 10)], {"v": F.lit("new")})
    got = t.read()
    assert got.count() == 100
    assert got.filter(F.col("v") == "new").count() == 10
    assert got.filter(
        (F.col("k") >= 10) & (F.col("v") != "orig")).count() == 0
    # partition values preserved through the rewrite
    assert got.filter(F.col("k") == 4).collect()[0]["bucket"] == "1"
