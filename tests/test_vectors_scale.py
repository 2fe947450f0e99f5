"""Scale-path properties of the vector queries: bucketed near-dup has
no cartesian product, and IVF probe trades bounded recall for a pruned
scan."""

from __future__ import annotations

from connect_spark.queries.vectors import (
    ann_ivf_probe,
    ann_topk_bruteforce,
    embedding_neardup_pairs,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_neardup_plan_has_no_cartesian(spark):
    plan = _plan(embedding_neardup_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_recall_vs_bruteforce(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_bruteforce(spark, SF).collect()
    }
    probed = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_probe(spark, SF).collect()
    }
    assert len(probed) == len(exact) == 50
    recall = len(exact & probed) / len(exact)
    # nprobe=2 of 8 cells: scan prunes to ~1/4 of the corpus; recall
    # stays useful (measured 0.62 at sf0.001 on this synthetic corpus
    # whose "near" pairs are only cosine ~0.4 — tight clusters recall
    # far higher). The assertion pins a floor so regressions surface.
    assert recall >= 0.5, recall


def test_neardup_verified_gated_on_lsh_candidates(spark):
    """The composed near-dup query verifies Jaccard ONLY on LSH
    candidate pairs: no cartesian, and results agree with the
    ungated inverted-index query wherever LSH recalled the pair."""
    from connect_spark.queries.textops import (
        dedup_neardup_verified,
        dedup_ngram_jaccard,
    )

    ver = dedup_neardup_verified(spark, SF)
    plan = _plan(ver)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r.doc_a, r.doc_b): r.jaccard_bp for r in ver.collect()}
    full = {
        (r.doc_a, r.doc_b): r.jaccard_bp
        for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    # verified pairs are a subset of the full-join pairs with
    # identical scores; LSH recall on this corpus is high
    assert set(got) <= set(full)
    for pair, bp in got.items():
        assert full[pair] == bp
    assert len(got) >= 0.8 * len(full)
