"""collapse, parse_yaml/logfmt, fake(), CDC apply-changes, training
pipeline composition."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.bloblang import compile_mapping
from connect_spark.catalog import load_table
from connect_spark.operators.core import collapse
from connect_spark.sources.cdc import apply_cdc_batch
from connect_spark.state import ParquetKVCache

SF = "/root/testdata/sf0.001"


def test_collapse_flattens_structs(spark):
    df = spark.createDataFrame(
        [Row(a=1, obj=Row(x=2, inner=Row(y=3)))]
    )
    flat = collapse(df)
    assert set(flat.columns) == {"a", "obj.x", "obj.inner.y"}
    r = flat.first()
    assert r["obj.x"] == 2 and r["obj.inner.y"] == 3


def test_parse_logfmt_and_yaml(spark):
    df = spark.createDataFrame(
        [Row(l="level=info msg=started count=3", y="k: 7\nname: test")]
    )
    out = compile_mapping(
        df,
        """
        root.level = this.l.parse_logfmt().get("level")
        root.yaml_json = this.y.parse_yaml()
        root.k = this.y.parse_yaml().json_path("$.k").number()
        """,
    )
    r = out.first()
    assert r["level"] == "info"
    assert r["k"] == 7.0
    import json

    assert json.loads(r["yaml_json"]) == {"k": 7, "name": "test"}


def test_fake_function_deterministic(spark):
    cfg_src = """
    root.n = counter()
    root.who = fake("name")
    root.mail = fake("email")
    """
    df = spark.range(20)
    out1 = compile_mapping(df, cfg_src).collect()
    out2 = compile_mapping(spark.range(20), cfg_src).collect()
    assert [r["who"] for r in out1] == [r["who"] for r in out2]
    assert all("@" in r["mail"] for r in out1)


def test_apply_cdc_batch(spark, tmp_path):
    cache = ParquetKVCache(spark, str(tmp_path / "tbl"), key="id")
    batch1 = spark.createDataFrame(
        [
            Row(id=1, val="a", operation="insert", _seq=1),
            Row(id=2, val="b", operation="insert", _seq=2),
            Row(id=1, val="a2", operation="update", _seq=3),  # later wins
        ]
    )
    apply_cdc_batch(cache, batch1, key="id")
    got = {r["id"]: r["val"] for r in cache.read().collect()}
    assert got == {1: "a2", 2: "b"}

    batch2 = spark.createDataFrame(
        [
            Row(id=2, val=None, operation="delete", _seq=4),
            Row(id=3, val="c", operation="insert", _seq=5),
        ]
    )
    apply_cdc_batch(cache, batch2, key="id")
    got = {r["id"]: r["val"] for r in cache.read().collect()}
    assert got == {1: "a2", 3: "c"}


def test_training_pipeline_composition(spark):
    """chunk → embed → exact-dedup → quality-filter, composed — the
    LLM-data-pipeline shape end to end."""
    from connect_spark.functions.formats import text_chunks
    from connect_spark.text.embeddings import embed_text

    docs = load_table(spark, SF, "documents")
    chunks = docs.select(
        "doc_id",
        F.posexplode(text_chunks("text", 30)).alias("chunk_idx", "chunk"),
    )
    embedded = embed_text(chunks, "chunk", dim=16)
    deduped = (
        embedded.withColumn("fp", F.md5(F.lower(F.trim("chunk"))))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("fp")
                .orderBy("doc_id", "chunk_idx")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    filtered = deduped.filter(
        F.size(F.filter(F.split("chunk", " "), lambda t: t != "")) >= 5
    )
    rows = filtered.collect()
    assert len(rows) > 0
    assert all(len(r["embedding"]) == 16 for r in rows[:10])
    # dedup kept each fingerprint once
    assert filtered.groupBy("fp").count().filter(F.col("count") > 1).count() == 0
