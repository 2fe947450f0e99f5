"""Connected-component resolution (operators/cluster.py)."""
from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.operators.cluster import (
    connected_components,
    resolve_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs], "src long, dst long")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_two_components(spark):
    got = _comp_map(connected_components(
        _edges(spark, [(1, 2), (2, 3), (10, 11)])))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_in_log_rounds(spark):
    # 32-node path graph: min-label alone needs 31 rounds; the pointer
    # jump makes labels travel doubling distances. max_rounds=8 must
    # suffice for diameter 31 (log2(31) ~ 5 plus slack).
    chain = [(i, i + 1) for i in range(31)]
    got = _comp_map(connected_components(_edges(spark, chain), max_rounds=8))
    assert got == {i: 0 for i in range(32)}


def test_min_not_reachable_by_descending_chain(spark):
    # 2-10-1 path: naive pointer-jumping over a min-parent forest
    # leaves node 2 rooted at itself; propagation must pull 1 through.
    got = _comp_map(connected_components(_edges(spark, [(2, 10), (10, 1)])))
    assert got == {1: 1, 2: 1, 10: 1}


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _comp_map(connected_components(
        _edges(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])))
    assert got == {1: 1, 2: 1}


def test_resolve_clusters_representatives(spark):
    out = resolve_clusters(
        _edges(spark, [(4, 2), (2, 7), (9, 8)]), "src", "dst")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["cluster_id"] == 2 and rows[2]["is_representative"] == 1
    assert rows[4]["cluster_id"] == 2 and rows[4]["is_representative"] == 0
    assert rows[7]["cluster_size"] == 3
    assert rows[8]["cluster_id"] == 8 and rows[9]["cluster_size"] == 2
    assert sum(r["is_representative"] for r in rows.values()) == 2


def test_no_cartesian_in_plan(spark):
    df = connected_components(_edges(spark, [(1, 2)]), max_rounds=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
