"""Connected-component resolution over candidate-pair edges — the
step between "found the duplicate pairs" and "built the training set".

Near-dup detection (`queries/textops.py`) emits *pairs* (doc_a,
doc_b); production dedup keeps ONE representative per connected
component of the pair graph.  This operator resolves components with
min-label propagation accelerated by pointer jumping (each round does
a neighbor-min step then a label-of-label jump), the standard
distributed-CC shape (cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public).  Convergence is
O(log(max component diameter)) rounds, each round two equality joins
shuffled on the node/label key — never a cartesian, no driver-side
graph state.  Lineage is cut per round with localCheckpoint so the
plan does not grow with iterations (the same technique as the `while`
processor in plans/pipeline.py).

The reference (redpanda-data/connect) has no graph/cluster operator;
this is part of the beyond-reference training-data family alongside
as-of joins and MinHash dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Resolve connected components of the undirected graph given by
    ``edges[src, dst]``.  Returns ``(node, comp)`` where ``comp`` is
    the MINIMUM node id in the node's component (so ``node == comp``
    marks the canonical representative).

    Per round: ``comp(v) <- min(comp(v), min over neighbors comp(u))``
    (neighbor-min) then ``comp(v) <- comp(comp(v))`` (pointer jump).
    At the fixpoint every node's label is <= all its neighbors' labels
    and labels only ever hold node ids, so each component is uniformly
    labeled with its minimum id.  The jump step doubles the distance
    labels travel per round, giving logarithmic convergence on chains.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).distinct()
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # neighbor-min: pull each neighbor's current label, keep the min
        nmin = (
            sym.join(
                labels.select(F.col("node").alias("b"),
                              F.col("comp").alias("bc")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bc").alias("nmin"))
        )
        stepped = (
            labels.join(nmin, labels.node == nmin.a, "left")
            .select(
                "node",
                F.least("comp", F.coalesce("nmin", "comp")).alias("comp"),
            )
        )
        # pointer jump: comp(v) <- comp(comp(v)) through the NEW labels
        j = stepped.select(F.col("node").alias("jnode"),
                           F.col("comp").alias("jcomp"))
        jumped = (
            stepped.join(j, stepped.comp == j.jnode, "left")
            .select(
                stepped.node.alias("node"),
                F.least(stepped.comp,
                        F.coalesce("jcomp", stepped.comp)).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(
                labels.select("node", F.col("comp").alias("old")), "node"
            )
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def resolve_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Near-dup pair resolution: pairs -> per-doc cluster assignment
    with the canonical representative flagged.  Output columns:
    ``doc_id, cluster_id, is_representative, cluster_size``.

    Training-set construction then keeps ``is_representative = 1``
    rows plus every doc that never appeared in a pair.
    """
    comps = connected_components(pairs, src=src, dst=dst)
    sizes = comps.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        comps.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            (F.col("node") == F.col("comp")).cast("int")
                .alias("is_representative"),
            "cluster_size",
        )
    )
