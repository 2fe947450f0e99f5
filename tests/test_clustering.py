"""Quantized Lloyd k-means (queries/clustering.py) vs an independent
local reimplementation: numpy/pure-python runs the identical
quantize -> assign -> floor-mean -> coalesce-empty algorithm over the
same parquet and must reproduce the Spark partition exactly."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from connect_spark.queries.clustering import (
    DIMS, ITERS, K, Q_SCALE, kmeans_lloyd_clusters)
from tests.conftest import SF_SMALL


def _local_kmeans(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    q = {i: [math.floor(float(x) * Q_SCALE) for x in v]
         for i, v in zip(ids, embs)}
    cents = {i: list(q[i]) for i in sorted(q) if i < K}

    def assign():
        out = {}
        for vid, v in q.items():
            best = None
            for cid in sorted(cents):
                d2 = sum((a - b) * (a - b)
                         for a, b in zip(v, cents[cid]))
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            out[vid] = best
        return out

    for _ in range(ITERS):
        a = assign()
        sums: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for vid, (_, cid) in a.items():
            s = sums.setdefault(cid, [0] * DIMS)
            for i, x in enumerate(q[vid]):
                s[i] += x
            cnt[cid] = cnt.get(cid, 0) + 1
        for cid in cents:
            if cid in cnt:
                cents[cid] = [math.floor(sums[cid][i] / cnt[cid])
                              for i in range(DIMS)]
    final = assign()
    agg: dict[int, list[int]] = {}
    for vid, (d2, cid) in final.items():
        row = agg.setdefault(cid, [0, 0, 0])
        row[0] += 1
        row[1] += vid
        row[2] += d2
    return agg


def test_kmeans_matches_local_reference(spark):
    got = {
        r["cluster_id"]: (r["n_vectors"], r["vec_id_checksum"], r["inertia"])
        for r in kmeans_lloyd_clusters(spark, SF_SMALL).collect()
    }
    want = {cid: tuple(v) for cid, v in _local_kmeans(SF_SMALL).items()}
    assert got == want
    assert sum(v[0] for v in got.values()) == len(
        pq.read_table(f"{SF_SMALL}/embeddings.parquet"))


def test_kmeans_covers_all_clusters_or_documents_empty(spark):
    rows = kmeans_lloyd_clusters(spark, SF_SMALL).collect()
    # clusters are a subset of the K seeds; every member counted once
    assert all(0 <= r["cluster_id"] < K for r in rows)
    assert all(r["n_vectors"] > 0 for r in rows)


def test_kmeans_semdedup_matches_local_reference(spark):
    from connect_spark.queries.clustering import (
        _SEM_TAU_DEN2, _SEM_TAU_NUM2, kmeans_semdedup_keep)

    # rebuild assignment locally, then apply the integer drop rule
    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    q = {i: [math.floor(float(x) * Q_SCALE) for x in v]
         for i, v in zip(ids, embs)}
    cents = {i: list(q[i]) for i in sorted(q) if i < K}

    def assign():
        out = {}
        for vid, v in q.items():
            best = None
            for cid in sorted(cents):
                d2 = sum((a - b) * (a - b) for a, b in zip(v, cents[cid]))
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            out[vid] = best[1]
        return out

    for _ in range(ITERS):
        a = assign()
        sums, cnt = {}, {}
        for vid, cid in a.items():
            s = sums.setdefault(cid, [0] * DIMS)
            for i, x in enumerate(q[vid]):
                s[i] += x
            cnt[cid] = cnt.get(cid, 0) + 1
        for cid in cents:
            if cid in cnt:
                cents[cid] = [math.floor(sums[cid][i] / cnt[cid])
                              for i in range(DIMS)]
    final = assign()
    by_cluster: dict[int, list[int]] = {}
    for vid, cid in final.items():
        by_cluster.setdefault(cid, []).append(vid)
    want = {}
    for cid, vids in by_cluster.items():
        vids.sort()
        n2 = {v: sum(x * x for x in q[v]) for v in vids}
        dropped = set()
        for j, bv in enumerate(vids):
            for av in vids[:j]:
                dot = sum(x * y for x, y in zip(q[av], q[bv]))
                if (dot > 0 and _SEM_TAU_DEN2 * dot * dot
                        > _SEM_TAU_NUM2 * n2[av] * n2[bv]):
                    dropped.add(bv)
                    break
        want[cid] = (len(vids), len(dropped),
                     sum(v for v in vids if v not in dropped))

    got = {
        r["cluster_id"]: (r["n_members"], r["n_dropped"],
                          r["kept_checksum"])
        for r in kmeans_semdedup_keep(spark, SF_SMALL).collect()
    }
    assert got == want


def test_kmeans_semdedup_invariants(spark):
    from connect_spark.queries.clustering import kmeans_semdedup_keep

    rows = kmeans_semdedup_keep(spark, SF_SMALL).collect()
    for r in rows:
        # the senior (lowest-id) member of a cluster is never dropped
        assert r["n_dropped"] < r["n_members"]
        assert r["kept_checksum"] >= 0


def test_ivf_kmeans_probe_recall_vs_bruteforce(spark):
    from connect_spark.queries.clustering import (
        N_QUERY, TOP_K, ann_ivf_kmeans_probe)

    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    q = {i: [math.floor(float(x) * Q_SCALE) for x in v]
         for i, v in zip(ids, embs)}

    def top5(qid):
        scored = sorted(
            (sum((a - b) * (a - b) for a, b in zip(q[qid], q[n])), n)
            for n in q if n >= N_QUERY)
        return [n for _, n in scored[:TOP_K]]

    got = {}
    for r in ann_ivf_kmeans_probe(spark, SF_SMALL).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(got) == N_QUERY
    hits = total = 0
    for qid, nbrs in got.items():
        assert len(nbrs) == TOP_K
        truth = set(top5(qid))
        hits += len(nbrs & truth)
        total += TOP_K
    recall = hits / total
    # nprobe=2 of K=8 cells on this data: recall well above the
    # 2/8 = 25% random-cell floor
    assert recall >= 0.4, recall


def test_contamination_embedding_matches_local(spark):
    from connect_spark.queries.clustering import (
        _SEM_TAU_DEN2, _SEM_TAU_NUM2, N_QUERY, contamination_embedding)

    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    q = {i: [math.floor(float(x) * Q_SCALE) for x in v]
         for i, v in zip(ids, embs)}
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}
    want = {}
    for e in q:
        if e >= N_QUERY:
            continue
        hits = []
        for d in q:
            if d < N_QUERY:
                continue
            dot = sum(x * y for x, y in zip(q[e], q[d]))
            if (dot > 0 and _SEM_TAU_DEN2 * dot * dot
                    > _SEM_TAU_NUM2 * n2[e] * n2[d]):
                hits.append(d)
        if hits:
            want[e] = (len(hits), sum(hits), min(hits))

    got = {
        r["eval_id"]: (r["n_contaminated"], r["contaminated_checksum"],
                       r["first_doc"])
        for r in contamination_embedding(spark, SF_SMALL).collect()
    }
    assert got == want


def test_semantic_curation_consistent_with_semdedup(spark):
    from connect_spark.queries.clustering import (
        kmeans_semdedup_keep, pipeline_semantic_curation)

    cur = pipeline_semantic_curation(spark, SF_SMALL).collect()
    sd = kmeans_semdedup_keep(spark, SF_SMALL).collect()
    assert (sum(r["n_kept"] + r["n_dropped"] for r in cur)
            == sum(r["n_members"] for r in sd))
    assert sum(r["n_dropped"] for r in cur) == sum(
        r["n_dropped"] for r in sd)
    assert sum(r["kept_checksum"] for r in cur) == sum(
        r["kept_checksum"] for r in sd)
    for r in cur:
        assert r["tokens_kept"] > 0
