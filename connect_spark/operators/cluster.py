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

    r15 cost shape (measured 10 rounds x ~0.9s at sf0.1 before):
    - the symmetric edge set is built in ONE pass over the (possibly
      expensive) pair pipeline: each pair explodes into both
      directions (a codegen Generate), so no pre-union checkpoint of
      the one-directional frame is needed — measured 4.6s -> 3.3s
      for the embedding-pair graph;
    - the identity labeling and the first neighbor-min round are
      FUSED into the init: labels start at groupBy(a).least(a,
      min(b)), one exchange replacing the distinct-nodes checkpoint
      plus round 1's join (the first round on identity labels
      degenerates to exactly this aggregate);
    - neighbor-min is union + groupBy (one join, one partial-agg
      exchange) instead of join + groupBy + left-join;
    - each JOB packs two (neighbor-min + pointer-jump) phases: every
      step is a least() over already-reachable values, so ANY
      schedule of the two monotone operators converges to the same
      fixpoint (the component minimum), and if a whole batch leaves
      SUM(comp) unchanged then every intermediate step changed
      nothing — detection stays sound.  At scale the total join work
      equals the same number of single-phase rounds; locally it
      halves the driver round-trips, which dominate on small graphs
      (measured on the sf0.1 embedding graph: 8 jobs/5.5-8.0s for
      1 nm + 2 jumps per job vs 5 jobs/4.5s for 2x(nm + 1 jump);
      deeper batches regress — 3x(nm+2j) hit 41s of per-job
      optimizer/plan cost — so the committed shape is exactly two
      phases with one jump each);
    - convergence is detected by SUM(comp): per-node comp is
      non-increasing (every update is a least() including the old
      value), so the sum strictly decreases iff any node changed —
      one ungrouped aggregate on the frame the lazy checkpoint
      materializes anyway, ONE job per round, no comparison join;
    - r15 second tranche: the edge set is CONTRACTED before any
      iteration (the two-phase shape of Kiveris et al. §3): each
      partition runs a local union-find over its own edges and emits
      only its spanning-forest links (node -> local min-root), ≤ one
      row per distinct node per partition.  The union of
      per-partition forests has exactly the original component
      structure (every original edge connects its endpoints inside
      some partition's forest), so the iterative fixpoint is
      unchanged — but the iterated edge set shrinks from |E| to at
      most |V| rows per partition, and every within-partition
      component collapses to a star, so the label rounds now only
      stitch components that straddle partition boundaries.  On the
      sf0.1 embedding pair graph the whole graph fits one coalesced
      partition: init lands the exact labels and ONE round verifies
      convergence (measured 5 rounds x ~1.2s -> 1 round; the
      contraction itself is O(E α(E)) dict work inside the one pass
      over the pair pipeline that the old explode+distinct
      checkpoint already paid)."""
    one_dir = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )

    def _local_forest(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["a"], pdf["b"]):
                a = int(a)
                b = int(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # min-root union: the surviving root is the min,
                    # so emitted links always point downward
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        # roots with no parent entry never appear as keys; every node
        # seen in an edge is either a key or the root of a key, and
        # the symmetric explode downstream re-surfaces roots as 'a'
        seen = set()
        out_n, out_r = [], []
        for n in list(parent.keys()):
            r = find(n)
            for x in (n, r):
                if x not in seen:
                    seen.add(x)
                    out_n.append(x)
                    out_r.append(find(x))
        if out_n:
            yield pd.DataFrame({"a": out_n, "b": out_r})

    forest = one_dir.mapInPandas(_local_forest, schema="a long, b long")
    sym = (
        forest.filter(F.col("a") != F.col("b"))
        .select(F.explode(F.array(
            F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
            F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    if prev_sum is None:
        return labels
    for _ in range(max_rounds):
        stepped = labels
        # two phases per job: neighbor-min then one pointer jump
        for _p in range(2):
            # neighbor-min: min over self ∪ neighbors' labels
            pulled = (
                sym.join(
                    stepped.select(F.col("node").alias("b"),
                                   F.col("comp").alias("bc")),
                    "b",
                )
                .select(F.col("a").alias("node"),
                        F.col("bc").alias("comp"))
            )
            stepped = (
                stepped.select("node", "comp").union(pulled)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            # pointer jump: comp(v) <- comp(comp(v))
            j = stepped.select(F.col("node").alias("jnode"),
                               F.col("comp").alias("jcomp"))
            stepped = (
                stepped.join(j, stepped.comp == j.jnode, "left")
                .select(
                    stepped.node.alias("node"),
                    F.least(stepped.comp,
                            F.coalesce("jcomp", stepped.comp))
                    .alias("comp"),
                )
            )
        labels = stepped.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
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
