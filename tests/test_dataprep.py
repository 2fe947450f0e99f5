"""Hand-computed pins for the round-8 dataprep operators: substring
span dedup (canonical-keep, island merging, within-doc repeats),
Stupid-Backoff scoring (all four backoff levels, exact ppm values),
and the deterministic temperature sampler."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from connect_spark.queries.dataprep import (
    stupid_backoff,
    substring_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_substring_spans_cross_doc_and_islands(spark):
    """d0 is canonical everywhere (min doc_id) and emits no row; d1's
    two overlapping duplicated windows merge into ONE island; d3's two
    duplicated windows separated by unique text stay TWO islands."""
    docs = _docs(spark, [
        (0, "a b c d e f"),
        (1, "x a b c d y"),
        (3, "a b c q q q b c d"),
    ])
    out = {r.doc_id: r for r in substring_spans(docs, 3).collect()}
    assert set(out) == {1, 3}
    # d1: windows "a b c"@2 and "b c d"@3 both lose to d0 -> spans
    # [2,4],[3,5] merge to [2,5]
    assert (out[1].n_tokens, out[1].dup_tokens, out[1].n_spans) == (6, 4, 1)
    assert out[1].deduped_text == "x y"
    # d3: "a b c"@1 -> [1,3]; "b c d"@7 -> [7,9]; disjoint
    assert (out[3].n_tokens, out[3].dup_tokens, out[3].n_spans) == (9, 6, 2)
    assert out[3].deduped_text == "q q q"


def test_substring_spans_within_doc_repeat(spark):
    """A window repeated INSIDE one doc keeps only its first
    occurrence — the rest merge into one island."""
    docs = _docs(spark, [(2, "z z z z z")])
    rows = substring_spans(docs, 3).collect()
    assert len(rows) == 1
    r = rows[0]
    # windows @1,@2,@3 all equal; @1 canonical; [2,4]+[3,5] -> [2,5]
    assert (r.n_tokens, r.dup_tokens, r.n_spans) == (5, 4, 1)
    assert r.deduped_text == "z"


def test_substring_spans_whole_doc_removed(spark):
    """A doc that is one duplicated window end-to-end rewrites to the
    empty string (left join + coalesce, not a dropped row)."""
    docs = _docs(spark, [(0, "p q r"), (5, "p q r")])
    rows = substring_spans(docs, 3).collect()
    assert [(r.doc_id, r.dup_tokens, r.deduped_text) for r in rows] == [
        (5, 3, "")]


def test_stupid_backoff_levels_exact_ppm(spark):
    """One scored trigram per level with hand-derived ppm integers.
    Train half (doc 0): 'a b c a b d' ->
      uni a:2 b:2 c:1 d:1 (N=6); bi 'a b':2 'b c':1 'c a':1 'b d':1;
      tri 'a b c':1 'b c a':1 'c a b':1 'a b d':1."""
    docs = _docs(spark, [
        (0, "a b c a b d"),   # train
        (1, "a b c z"),       # 'a b c' hit; 'b c z' OOV
        (3, "z b c"),         # bigram backoff via 'b c'
        (5, "z z d"),         # unigram backoff via 'd'
    ])
    out = {r.doc_id: r for r in stupid_backoff(docs).collect()}
    assert set(out) == {1, 3, 5}
    # 'a b c': c3=1, c(ctx 'a b')=2 -> 1_000_000 div 2 = 500_000
    # 'b c z': tri miss, 'c z' miss, 'z' miss -> OOV 0
    assert (out[1].n_trigrams, out[1].sum_score_ppm) == (2, 500_000)
    assert (out[1].n_tri_hit, out[1].n_oov) == (1, 1)
    # 'z b c': tri miss; la2 'b c' c2=1, c('b')=2
    # -> (1_000_000 div 2) * 2 div 5 = 200_000
    assert (out[3].n_trigrams, out[3].sum_score_ppm,
            out[3].n_bi_backoff) == (1, 200_000, 1)
    # 'z z d': la2 'z d' miss; 'd' c1=1, N=6
    # -> (1_000_000 div 6) * 4 div 25 = 166_666*4 div 25 = 26_666
    assert (out[5].n_trigrams, out[5].sum_score_ppm,
            out[5].n_uni_backoff) == (1, 26_666, 1)


def test_temperature_sampler_deterministic(spark):
    """The sampled set is a pure function of (doc_id, lang counts):
    two runs agree row-for-row, and the per-lang rate matches the
    Python-computed min(1, 8/sqrt(c)) decision for every doc."""
    import math

    from connect_spark.queries.dataprep import sample_temperature_rebalance

    sf = "/root/testdata/sf0.001"
    a = {r.lang: (r.n_docs, r.n_sampled, r.sampled_chars)
         for r in sample_temperature_rebalance(spark, sf).collect()}
    b = {r.lang: (r.n_docs, r.n_sampled, r.sampled_chars)
         for r in sample_temperature_rebalance(spark, sf).collect()}
    assert a == b and a

    from connect_spark.catalog import load_table
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars").collect()
    counts: dict[str, int] = {}
    for r in docs:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    want: dict[str, list[int]] = {}
    for r in docs:
        rate = min(1.0, 8.0 / math.sqrt(counts[r.lang]))
        u = (((r.doc_id % 2147483647) * 48271) % 2147483647) / 2147483647.0
        ns, ch = want.setdefault(r.lang, [0, 0])
        if u < rate:
            want[r.lang] = [ns + 1, ch + r.n_chars]
    for lang, (n_docs, n_sampled, sampled_chars) in a.items():
        assert n_docs == counts[lang]
        assert [n_sampled, sampled_chars] == want.get(lang, [0, 0]), lang


def test_substring_spans_no_cartesian(spark):
    """Candidate generation must stay an equality join on the window
    hash — never a nested-loop product."""
    docs = _docs(spark, [(0, "a b c d"), (1, "b c d e")])
    plan = substring_spans(docs, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pipeline_pretrain_funnel(spark):
    """Stage funnel is monotone per lang, repeat-deterministic, and
    the bin count is consistent with greedy 512-token packing."""
    from connect_spark.queries.dataprep import pipeline_pretrain_corpus

    sf = "/root/testdata/sf0.001"
    rows = {r.lang: r for r in
            pipeline_pretrain_corpus(spark, sf).collect()}
    again = {r.lang: r for r in
             pipeline_pretrain_corpus(spark, sf).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == \
        {k: tuple(v) for k, v in again.items()}
    assert rows
    for lang, r in rows.items():
        assert 0 <= r.n_quality <= r.n_docs, lang
        assert 0 <= r.n_sampled <= r.n_quality, lang
        if r.n_sampled:
            # greedy cumsum bucketing: every bin but possibly the
            # last holds >= 1 doc and bins cover the token total
            assert 1 <= r.n_bins <= r.n_sampled
            assert r.n_bins >= r.packed_tokens // 512 - r.n_sampled
        else:
            assert (r.n_bins, r.packed_tokens) == (0, 0)


def test_semantic_keep_one_rep_per_cluster(spark):
    """Exactly one kept vector per semantic cluster; uniques pass
    through; kept set plus dropped members partitions the corpus."""
    from connect_spark.catalog import load_table
    from connect_spark.operators.cluster import resolve_clusters
    from connect_spark.queries.dataprep import dedup_semantic_keep
    from connect_spark.queries.vectors import embedding_neardup_pairs

    sf = "/root/testdata/sf0.001"
    kept = dedup_semantic_keep(spark, sf).collect()
    reps = [r for r in kept if r.kept_reason == "representative"]
    # one representative per cluster: min vec_id of its component
    clusters = resolve_clusters(
        embedding_neardup_pairs(spark, sf), "va", "vb").collect()
    by_cluster = {}
    for c in clusters:
        by_cluster.setdefault(c.cluster_id, []).append(c.doc_id)
    assert len(reps) == len(by_cluster)
    rep_ids = {r.vec_id for r in reps}
    assert rep_ids == {min(v) for v in by_cluster.values()}
    for r in reps:
        assert r.cluster_size == len(by_cluster[r.vec_id])
    # uniques = corpus minus every clustered member
    n_total = load_table(spark, sf, "embeddings").count()
    clustered = {c.doc_id for c in clusters}
    uniques = [r for r in kept if r.kept_reason == "unique"]
    assert len(uniques) == n_total - len(clustered)
    assert all(r.cluster_size == 1 for r in uniques)


def test_ppl_buckets_terciles(spark):
    from connect_spark.queries.dataprep import (
        quality_ppl_buckets, quality_stupid_backoff)
    from tests.conftest import SF_SMALL

    rows = quality_ppl_buckets(spark, SF_SMALL).collect()
    by_lang: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    n_scored = quality_stupid_backoff(spark, SF_SMALL).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {1, 2, 3}
        sizes = [buckets[b]["n_docs"] for b in sorted(buckets)]
        assert max(sizes) - min(sizes) <= 1          # ntile balance
        ordered = sorted(buckets)
        for a, b in zip(ordered, ordered[1:]):
            # bucket 1 holds the best scores: non-increasing boundaries
            assert buckets[a]["worst_ppm"] >= buckets[b]["best_ppm"]
        for b in buckets.values():
            assert b["best_ppm"] >= b["worst_ppm"]


def test_dataset_card_stats_invariants(spark):
    import pyarrow.parquet as pq

    from connect_spark.queries.dataprep import dataset_card_stats
    from tests.conftest import SF_SMALL

    rows = dataset_card_stats(spark, SF_SMALL).collect()
    tbl = pq.read_table(f"{SF_SMALL}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == len(tbl)
    for r in rows:
        assert r["token_total"] > 0 and r["char_total"] >= r["token_total"]
        assert 1 <= r["n_sources"]
        assert 0 <= r["n_exact_dups"] < r["n_docs"]
        assert 0 <= r["short_bp"] <= 10000
