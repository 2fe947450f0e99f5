"""Cache backend, embeddings, lakehouse schema evolution, and
checkpoint-resume migration."""

from __future__ import annotations

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.sinks.lakehouse import LakehouseWriter
from connect_spark.state import ParquetKVCache
from connect_spark.streaming.migrator import migrate_files
from connect_spark.text.embeddings import embed_text, rerank_stub

SF = "/root/testdata/sf0.001"


def test_cache_set_add_get_delete(spark, tmp_path):
    cache = ParquetKVCache(spark, str(tmp_path / "kv"), key="k")
    r1 = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    cache.set(r1)
    # set upserts: k=2 overwritten, k=3 added
    cache.set(spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]))
    got = {r["k"]: r["v"] for r in cache.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    # add: only absent keys land
    added = cache.add(
        spark.createDataFrame([Row(k=3, v="dup"), Row(k=4, v="d")])
    )
    assert {r["k"] for r in added.collect()} == {4}
    got = {r["k"]: r["v"] for r in cache.read().collect()}
    assert got[3] == "c" and got[4] == "d"

    # get: lookup join
    lookup = spark.createDataFrame([Row(k=1), Row(k=99)])
    joined = {r["k"]: r["v"] for r in cache.get(lookup, on="k").collect()}
    assert joined == {1: "a", 99: None}

    cache.delete(spark.createDataFrame([Row(k=1)]))
    assert 1 not in {r["k"] for r in cache.read().collect()}


def test_embed_text_deterministic_and_normed(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    emb = embed_text(docs, "text", dim=32)
    rows = emb.select("doc_id", "embedding").collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    # unit norm
    import math

    for r in rows[:5]:
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(n - 1.0) < 1e-3
    # deterministic across runs
    rows2 = emb.select("doc_id", "embedding").collect()
    assert {r["doc_id"]: r["embedding"] for r in rows} == {
        r["doc_id"]: r["embedding"] for r in rows2
    }


def test_embed_custom_model_fn(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    calls = []

    def fake_model(texts):
        calls.append(len(texts))
        return [[float(len(t)), 1.0] for t in texts]

    emb = embed_text(docs, "text", model_fn=fake_model)
    rows = emb.collect()
    assert all(r["embedding"][0] == float(len(r["text"])) for r in rows)


def test_rerank_stub(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    out = rerank_stub(docs, "spark table row", "text")
    scores = [r["rerank_score"] for r in out.collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert any(s > 0 for s in scores)


def test_lakehouse_schema_evolution(spark, tmp_path):
    w = LakehouseWriter(spark, str(tmp_path / "lake"), partition_by=["p"])
    w.append(spark.createDataFrame([Row(p="a", x=1)]))
    # evolved: new column y appears; old rows read y as null
    w.append(spark.createDataFrame([Row(p="b", x=2, y="new")]))
    # regressed writer: missing y gets null-filled
    w.append(spark.createDataFrame([Row(p="c", x=3)]))
    got = {r["x"]: r["y"] for r in w.read().collect()}
    assert got == {1: None, 2: "new", 3: None}


def test_migrator_checkpoint_resume_exactly_once(spark, tmp_path):
    events = load_table(spark, SF, "events").select("event_id", "value")
    src, dst, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "ckpt"),
    )
    first = events.filter(F.col("event_id") < 500)
    second = events.filter(F.col("event_id") >= 500)
    first.coalesce(2).write.mode("append").parquet(src)

    q = migrate_files(
        spark, src, dst, ckpt, schema=events.schema, max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(dst).count()
    assert n1 == first.count()

    # new files arrive; resume from the SAME checkpoint
    second.coalesce(2).write.mode("append").parquet(src)
    q2 = migrate_files(
        spark, src, dst, ckpt, schema=events.schema, max_files_per_trigger=1
    )
    q2.processAllAvailable()
    q2.stop()
    out = spark.read.parquet(dst)
    # exactly-once: every event exactly once despite the restart
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_lakehouse_compaction(spark, tmp_path):
    from connect_spark.sinks.lakehouse import LakehouseWriter

    path = str(tmp_path / "table")
    w = LakehouseWriter(spark, path)
    # many tiny appends -> many tiny files
    for i in range(6):
        w.append(spark.range(i * 10, i * 10 + 10).toDF("n"))
    import os

    def count_parquet(p):
        return sum(
            f.endswith(".parquet")
            for _d, _s, fs in os.walk(p)
            for f in fs
        )

    before = count_parquet(path)
    assert before >= 6
    stats = w.compact(target_file_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == before
    assert stats["files_after"] < before
    assert w.read().count() == 60
    # rows survive byte-for-byte
    assert sorted(r["n"] for r in w.read().collect()) == list(range(60))
    # idempotent below min_files
    again = w.compact(target_file_bytes=10 * 1024 * 1024, min_files=99)
    assert again["files_after"] == stats["files_after"]


def test_lakehouse_compaction_lock_excludes_second_compactor(spark, tmp_path):
    """compact() is a single-compactor maintenance op: a held
    `.compact.lock` sentinel makes a concurrent compact fail fast
    instead of corrupting the two-rename swap."""
    import os

    import pytest

    from connect_spark.sinks.lakehouse import LakehouseWriter

    path = str(tmp_path / "tbl")
    w = LakehouseWriter(spark, path)
    w.append(spark.range(10).toDF("n"))
    w.append(spark.range(10, 20).toDF("n"))

    lock = path + ".compact.lock"
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="another compaction"):
        w.compact(min_files=1)
    os.remove(lock)
    stats = w.compact(min_files=1)
    assert stats["files_after"] <= stats["files_before"]
    assert not os.path.exists(lock)  # released on success
    assert w.read().count() == 20


def test_migrator_passthrough_byte_identical(spark, tmp_path):
    """Format-identical fast path: files land byte-for-byte, the copy
    is re-runnable (atomic rename overwrite), and the copied directory
    reads back as the same table."""
    import hashlib
    import os

    from connect_spark.streaming.migrator import migrate_files_passthrough

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) AS payload") \
        .repartition(4).write.parquet(src)
    n = migrate_files_passthrough(spark, src, dst)
    assert n == 4

    def digests(d):
        out = {}
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    assert digests(dst) == digests(src)
    assert spark.read.parquet(dst).count() == 1000
    # idempotent re-run: same result, no duplicates or temp litter
    assert migrate_files_passthrough(spark, src, dst) == 4
    assert digests(dst) == digests(src)
    assert not [f for f in os.listdir(dst) if f.endswith(".tmp")]
