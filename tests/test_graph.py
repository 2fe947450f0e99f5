"""Integer PageRank (queries/graph.py) vs an independent local
reimplementation over the same parquet."""

from __future__ import annotations

import pyarrow.parquet as pq

from connect_spark.queries.graph import (
    DAMP_DEN, DAMP_NUM, PR_ITERS, R0, TELEPORT, pagerank_purchase_graph)
from tests.conftest import SF_SMALL


def _local(sf_dir: str):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey"])
    od = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey"])
    cust = dict(zip(od.column("o_orderkey").to_pylist(),
                    od.column("o_custkey").to_pylist()))
    edges: dict[tuple[int, int], int] = {}
    for ok, sk in zip(li.column("l_orderkey").to_pylist(),
                      li.column("l_suppkey").to_pylist()):
        key = (cust[ok] * 2, sk * 2 + 1)
        edges[key] = edges.get(key, 0) + 1
    deg: dict[int, int] = {}
    nodes = set()
    for (s, d), w in edges.items():
        deg[s] = deg.get(s, 0) + w
        nodes.update((s, d))
    r = {n: R0 for n in nodes}
    for _ in range(PR_ITERS):
        inflow: dict[int, int] = {}
        for (s, d), w in edges.items():
            inflow[d] = inflow.get(d, 0) + (
                r[s] * DAMP_NUM * w) // (DAMP_DEN * deg[s])
        r = {n: TELEPORT + inflow.get(n, 0) for n in nodes}
    in_w: dict[int, int] = {}
    for (s, d), w in edges.items():
        in_w[d] = in_w.get(d, 0) + w
    return {(n - 1) // 2: (r[n], in_w[n])
            for n in nodes if n % 2 == 1}


def test_pagerank_matches_local_reference(spark):
    got = {
        row["s_suppkey"]: (row["pagerank_micro"],
                           row["weighted_in_degree"])
        for row in pagerank_purchase_graph(spark, SF_SMALL).collect()
    }
    want = _local(SF_SMALL)
    assert got == want
    assert len(got) > 0
    # ranks differentiate: the graph is not regular
    ranks = [v[0] for v in got.values()]
    assert max(ranks) > min(ranks)


def test_triangles_matches_local_reference(spark):
    from connect_spark.queries.graph import (
        CUST_DEG_CAP, MIN_SHARED, TOP_PAIR_PCT, triangles_copurchase)

    li = pq.read_table(f"{SF_SMALL}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey"])
    od = pq.read_table(f"{SF_SMALL}/orders.parquet",
                       columns=["o_orderkey", "o_custkey"])
    cust = dict(zip(od.column("o_orderkey").to_pylist(),
                    od.column("o_custkey").to_pylist()))
    bip = {(cust[ok], sk * 2 + 1)
           for ok, sk in zip(li.column("l_orderkey").to_pylist(),
                             li.column("l_suppkey").to_pylist())}
    by_c: dict[int, list[int]] = {}
    for c, s in bip:
        by_c.setdefault(c, []).append(s)
    shared: dict[tuple[int, int], int] = {}
    for sups in by_c.values():
        if len(sups) > CUST_DEG_CAP:  # hub-customer exclusion
            continue
        sups.sort()
        for i, s1 in enumerate(sups):
            for s2 in sups[i + 1:]:
                shared[(s1, s2)] = shared.get((s1, s2), 0) + 1
    # density-adaptive threshold: weight at ascending rank
    # (TOP_PAIR_PCT*n) div 100 + 1, floored at MIN_SHARED
    vals = sorted(shared.values())
    rank = (TOP_PAIR_PCT * len(vals)) // 100 + 1
    thr = max(vals[rank - 1], MIN_SHARED)
    proj = {e for e, n in shared.items() if n >= thr}
    adj: dict[int, set[int]] = {}
    for s1, s2 in proj:
        adj.setdefault(s1, set()).add(s2)
    tri_count: dict[int, int] = {}
    for a, b in proj:
        for c in adj.get(a, set()) & adj.get(b, set()):
            for n in (a, b, c):
                tri_count[n] = tri_count.get(n, 0) + 1
    deg: dict[int, int] = {}
    for s1, s2 in proj:
        deg[s1] = deg.get(s1, 0) + 1
        deg[s2] = deg.get(s2, 0) + 1
    want = {(n - 1) // 2: (tri_count.get(n, 0), deg[n]) for n in deg}

    got = {
        r["s_suppkey"]: (r["n_triangles"], r["degree"])
        for r in triangles_copurchase(spark, SF_SMALL).collect()
    }
    assert got == want
    assert any(v[0] > 0 for v in got.values())   # triangles exist
