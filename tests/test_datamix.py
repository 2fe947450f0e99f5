"""Corpus-assembly ops: deterministic shuffle/sharding, DSIR
importance resampling, weighted mixture interleave."""

import pytest
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries.datamix import (
    _MIX_WEIGHTS,
    dsir_importance_resample,
    mixture_interleave_blocks,
    shard_shuffle_manifest,
    shuffle_shards,
)

SF = "/root/testdata/sf0.001"


def test_shuffle_is_deterministic_and_content_independent(spark):
    """Same ids -> same permutation, even if every text is edited:
    the shuffle key derives from doc_id only."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = shuffle_shards(docs).select("doc_id", "shard", "pos").collect()
    edited = docs.withColumn("text", F.concat(F.lit("X "), "text"))
    b = shuffle_shards(edited).select("doc_id", "shard", "pos").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shuffle_positions_are_dense_per_shard(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    rows = shuffle_shards(docs).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_shard_write_readback_order(spark, tmp_path):
    """The physical path: repartition by shard + sort by key inside
    each shard file; reading one shard back preserves key order."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    sharded = shuffle_shards(docs)
    (sharded.repartition("shard")
     .sortWithinPartitions("shuffle_key")
     .write.partitionBy("shard").mode("overwrite")
     .parquet(str(tmp_path / "shards")))
    one = spark.read.parquet(str(tmp_path / "shards")).filter(
        F.col("shard") == "a").select("shuffle_key").collect()
    keys = [r.shuffle_key for r in one]
    assert keys == sorted(keys) and keys


def test_manifest_checksum_pins_order(spark):
    """Transposing two docs in a shard changes order_checksum: the
    checksum is sum(pos * (doc_id % 997)) and the two docs' weights
    differ, so swapped positions move the sum."""
    man = {r.shard: r for r in shard_shuffle_manifest(spark, SF).collect()}
    docs_n = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in man.values()) == docs_n
    # balanced by md5 uniformity: no shard > 3x the mean at this SF
    mean = docs_n / len(man)
    assert all(r.n_docs < 3 * mean + 5 for r in man.values())


def test_dsir_selects_toward_target(spark):
    """Docs resembling the target slice must be kept at a strictly
    higher rate than the rest — the defining property of importance
    resampling — in every lang (lang carries no signal here; the
    target is content-defined)."""
    rows = dsir_importance_resample(spark, SF).collect()
    by = {(r.lang, r.in_target): r for r in rows}
    langs = {r.lang for r in rows}
    assert langs == {"en", "zh", "es", "de", "fr"}
    total_kept = 0
    for lang in langs:
        t, nt = by[(lang, True)], by[(lang, False)]
        assert 0 <= t.n_kept <= t.n_docs
        assert 0 <= nt.n_kept <= nt.n_docs
        assert t.n_kept / t.n_docs > nt.n_kept / max(nt.n_docs, 1), lang
        total_kept += t.n_kept + nt.n_kept
    assert total_kept > 0


def test_mixture_blocks_match_weights(spark):
    """In every FULL block each lang contributes docs proportional to
    its weight (10 unit-weight emissions per block)."""
    rows = mixture_interleave_blocks(spark, SF).collect()
    langs_total = {
        r.lang: r.cnt
        for r in load_table(spark, SF, "documents")
        .groupBy(F.col("lang")).agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    by_block = {}
    for r in rows:
        by_block.setdefault(r.block, {})[r.lang] = r
    for block, comp in by_block.items():
        for lang, wgt in _MIX_WEIGHTS.items():
            expected = 10 * wgt
            emitted_before = sum(
                c.n_docs for b, m in by_block.items()
                if b < block for l, c in m.items() if l == lang)
            remaining = langs_total.get(lang, 0) - emitted_before
            if remaining >= expected:
                assert comp[lang].n_docs == expected, (block, lang)
            # vt window bounds
            if lang in comp:
                assert comp[lang].first_vt >= block * 8400
                assert comp[lang].last_vt < (block + 1) * 8400


def test_incremental_refresh_funnel_bounds(spark):
    """Admitted docs are a subset of the new batch; the quality gate
    bounds per-doc token counts, so tokens_added is bounded by
    n_added on both sides; the run is repeat-deterministic."""
    from connect_spark.queries.datamix import pipeline_incremental_refresh

    rows = pipeline_incremental_refresh(spark, SF).collect()
    again = pipeline_incremental_refresh(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    batch_n = (load_table(spark, SF, "documents")
               .filter(F.col("doc_id") % 10 == 0).count())
    assert 0 < sum(r.n_added for r in rows) <= batch_n
    for r in rows:
        assert r.shard in set("0123456789abcdef")
        assert 5 * r.n_added <= r.tokens_added <= 5000 * r.n_added


def test_mixture_plan_has_no_global_sort(spark):
    """Blocks are virtual-time windows; the plan must not collapse to
    a single partition anywhere."""
    plan = (mixture_interleave_blocks(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
