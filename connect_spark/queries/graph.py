"""Graph analytics over the relational tables: PageRank re-expressed
as unrolled DataFrame iterations — the second iterative distributed
algorithm next to Lloyd k-means (queries/clustering.py), and the
centrality primitive data-curation pipelines use to pick canonical
representatives (rank inside a near-dup cluster) or weight sources.

Graph: the purchase graph — one directed edge customer → supplier per
lineitem (via its order), with multiplicity as edge weight.  Node ids
disambiguate the two key spaces arithmetically (customer c → 2c,
supplier s → 2s+1) so no string namespacing is needed.

Engine-exactness (the repo's oracle discipline): ranks are integers
in micro-units.  Each iteration computes

    r'(v) = TELEPORT + sum over in-edges (u,v) of
            (r(u) * DAMP_NUM) div (DAMP_DEN * out_deg(u))

with the flooring applied PER EDGE-GROUP — integer division and
integer sums are order-independent, so Spark and DuckDB agree
bit-for-bit (no float damping anywhere).  Dangling mass (suppliers
have no out-edges) is absorbed by the sink-drop PageRank variant —
deterministic and standard when ranking only non-dangling-reachable
nodes relative to each other.

Scale: each iteration is ONE equality shuffle keyed by dst (the
contributions groupBy) plus a broadcast-sized degree join; at 100 TB
this is exactly Pregel-on-DataFrames, and the unrolled form keeps the
whole computation inside Catalyst (GraphX/GraphFrames do the same
joins under the hood).  Edges are derived once from the fact tables
and would be persisted in production; the re-derivation here keeps
the query stateless for the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

PR_ITERS = 3
TELEPORT = 150_000       # 0.15 in micro-units
DAMP_NUM = 85            # 0.85 = 85/100
DAMP_DEN = 100
R0 = 1_000_000           # initial rank per node


def _raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (src, dst) pairs: customer 2c → supplier 2s+1, one
    row per lineitem.  The lineitem scan is fanned out
    (catalog.fanout_scan, opt guide §2.5): the broadcast-join probe
    over 6M/sf rows is narrow work that otherwise runs in the single
    task the one-row-group test file allows."""
    from connect_spark.catalog import fanout_scan

    li = fanout_scan(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"),
        sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): weight = number of lineitems bought from that
    supplier by that customer."""
    return (
        _raw_edges(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 unrolled PageRank iterations over the purchase graph; output
    is every SUPPLIER node's final integer rank plus its weighted
    in-degree — the exact rank vector, pinned by the oracle.

    The edge list (and the degree-joined copy every iteration reads)
    is persisted: the lazy form re-derives the lineitem⋈orders +
    groupBy subtree once per reference (deg, nodes, all PR_ITERS
    contribution joins, the in-degree rollup) — the plan-duplication
    pathology measured at 752 scans on the triangle query.  In
    production the edge list is a materialized table to begin with.

    r15 shape (plan audit: the r14 form re-exchanged the FULL edge
    list by src inside every iteration's SortMergeJoin — the
    repartition("dst") it persisted never matched the join key):
    - ONE wide exchange total: the raw pairs repartition by src
      BEFORE the (src, dst) rollup (HashPartitioning(src) satisfies
      the groupBy's clustering), deg is a src-window on the same
      partitioning, and `ew` persists src-partitioned.
    - per iteration the src-keyed join reuses the cached
      partitioning: only the |V|-row rank vector shuffles (SHJ hint —
      hash-build the small per-partition rank slice instead of
      sorting the cached edge partitions every round), and the
      contribution groupBy(dst) exchanges map-side-combined partial
      sums, never edge rows.
    - `nodes` derives from the two already-aggregated degree frames
      (distinct src ∪ indeg dst), not the raw edge list."""
    ew = (
        _raw_edges(spark, sf_dir)
        .repartition("src")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("deg", F.sum("w").over(Window.partitionBy("src")))
        .persist()
    )
    indeg = ew.groupBy("dst").agg(F.sum("w").alias("in_w")).persist()
    nodes = (ew.select(F.col("src").alias("node")).distinct()
             .union(indeg.select(F.col("dst").alias("node")))
             .distinct()
             .persist())
    ranks = nodes.withColumn("r", F.lit(R0).cast("long"))
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(ranks.hint("shuffle_hash"), ew.src == ranks.node)
            .select(
                "dst",
                F.expr(f"(r * {DAMP_NUM} * w) div ({DAMP_DEN} * deg)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.hint("shuffle_hash"),
                       nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(TELEPORT)
                 + F.coalesce(F.col("inflow"), F.lit(0))).alias("r"),
            )
        )
    sup = ranks.filter(F.col("node") % 2 == 1)
    return (
        sup.join(indeg, sup.node == indeg.dst)
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
                F.col("r").alias("pagerank_micro"),
                F.col("in_w").alias("weighted_in_degree"))
    )


def _pagerank_sql() -> str:
    parts = [f"""
WITH edges AS (
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         COUNT(*) AS w
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY o_custkey * 2, l_suppkey * 2 + 1
), deg AS (
  SELECT src, SUM(w) AS deg FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), r0 AS (
  SELECT node, CAST({R0} AS BIGINT) AS r FROM nodes
)"""]
    for t in range(1, PR_ITERS + 1):
        parts.append(f""", c{t} AS (
  SELECT e.dst, SUM((p.r * {DAMP_NUM} * e.w) // ({DAMP_DEN} * d.deg))
           AS inflow
  FROM edges e JOIN deg d ON d.src = e.src
  JOIN r{t - 1} p ON p.node = e.src
  GROUP BY e.dst
), r{t} AS (
  SELECT n.node,
         CAST({TELEPORT} + COALESCE(c.inflow, 0) AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{t} c ON c.dst = n.node
)""")
    parts.append(f"""
SELECT (node - 1) // 2 AS s_suppkey,
       r AS pagerank_micro,
       CAST(i.in_w AS BIGINT) AS weighted_in_degree
FROM r{PR_ITERS}
JOIN (SELECT dst, SUM(w) AS in_w FROM edges GROUP BY dst) i
  ON i.dst = node
WHERE node % 2 = 1""")
    return "".join(parts)


PAGERANK_SQL = _pagerank_sql()


MIN_SHARED = 2      # absolute floor on shared customers per edge
CUST_DEG_CAP = 100  # hub-customer exclusion: > CAP distinct suppliers
TOP_PAIR_PCT = 99   # projection keeps pairs at/above this weight rank


def triangles_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the supplier co-purchase graph — the
    third classic graph primitive here (PageRank above, connected
    components in operators/cluster.py).  Three stages, each a
    standard scale bound for exact triangle counting:

    1. HUB CAP: customers linking > CUST_DEG_CAP distinct suppliers
       are excluded from the projection (part of the query's
       semantics, mirrored in the oracle — the same df-cap discipline
       as `dedup_ngram_jaccard`'s df>100 shingle cap).  Without it a
       single whale customer fans out C(deg, 2) supplier pairs before
       any pruning; with it the projection self-join's per-key fan-out
       is capped at C(CAP, 2) at ANY corpus size.
    2. DENSITY-ADAPTIVE PROJECTION: suppliers s1 < s2 are linked iff
       their shared-customer count sits in the top (100-TOP_PAIR_PCT)%
       of all pair weights (exact integer rank over the weight
       HISTOGRAM — a table bounded by the max weight value, not the
       corpus — with MIN_SHARED as an absolute floor).  A fixed
       absolute threshold is meaningless under density growth: at
       sf0.1 every supplier pair already shares ≥6 customers (the
       raw co-purchase graph is the COMPLETE graph, C(1000,2) edges,
       and exact triangle counting on it is Ω(C(1000,3)) ≈ 1.7e8
       triangles of pure output cardinality).  Ranking by weight is
       the classic "significant co-occurrence" projection: the edge
       count stays a fixed small fraction of pair count at ANY
       density, so downstream cost tracks corpus size, not its cube.
    3. TRIANGLES via DEGREE-ORDERED orientation: each projection edge
       {u, v} is directed from the (degree, id)-smaller endpoint to
       the larger, so each triangle is found exactly once as
       (a→b) ⋈ (b→c) ⋈ (a→c) — and, the point of the ordering, every
       node's pair enumeration in the wedge join is bounded by its
       OUT-degree, which the orientation caps at O(√m) (the classic
       O(m^1.5) bound; id-ordering has no such bound on hub nodes).

    Output: per supplier, the number of triangles it participates in
    and its projection degree — exact integers, oracle-pinned (the
    oracle applies the same cap and histogram-rank threshold;
    orientation is plan-side only and result-invariant, so the oracle
    keeps the simple id-ordered enumeration)."""
    bip = _edges(spark, sf_dir).select(
        F.col("src").alias("c"), F.col("dst").alias("s")).distinct()
    keep = (bip.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= CUST_DEG_CAP).select("c"))
    bip = bip.join(keep, "c", "left_semi")
    a = bip.select("c", F.col("s").alias("s1"))
    b = bip.select("c", F.col("s").alias("s2"))
    # The pair table is referenced by the histogram and the projection;
    # the projection is referenced 6+ times downstream (degrees,
    # orientation, all three triangle-join legs).  Without persist the
    # self-join subtree is replicated into each reference and the
    # physical plan grows combinatorially (measured: 752 parquet scans
    # at 16x).  Both persisted frames are orders of magnitude smaller
    # than the pair stream that builds them — exactly the
    # intermediates a production pipeline materializes.
    pairs = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .persist()
    )
    # exact integer rank threshold over the weight histogram: thr is
    # the weight at ascending rank (TOP_PAIR_PCT*n) div 100 + 1.  The
    # histogram has at most max(shared) rows — O(1) in corpus size —
    # so the rank window runs on a control-plane-sized table, and the
    # two 1-row broadcasts are ungrouped aggregates (bounded by the
    # plan guard's own rule).
    from pyspark.sql import Window
    hist = pairs.groupBy("shared").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("shared").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    tot = hist.agg(F.sum("cnt").alias("n"))
    thr = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.expr(
            f"({TOP_PAIR_PCT} * n) div 100 + 1"))
        .agg(F.min("shared").alias("thr"))
    )
    proj = (
        pairs.crossJoin(F.broadcast(thr))
        .filter(F.col("shared")
                >= F.greatest(F.col("thr"), F.lit(MIN_SHARED)))
        .select("s1", "s2")
        .persist()
    )
    deg = (
        proj.select(F.col("s1").alias("node"))
        .union(proj.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    d1 = deg.select(F.col("node").alias("s1"), F.col("degree").alias("g1"))
    d2 = deg.select(F.col("node").alias("s2"), F.col("degree").alias("g2"))
    fwd = (F.col("g1") < F.col("g2")) | (
        (F.col("g1") == F.col("g2")) & (F.col("s1") < F.col("s2")))
    o = (
        proj.join(d1, "s1").join(d2, "s2")
        .select(F.when(fwd, F.col("s1")).otherwise(F.col("s2")).alias("u"),
                F.when(fwd, F.col("s2")).otherwise(F.col("s1")).alias("v"))
        .persist()
    )
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .union(tris.select(F.col("b").alias("node")))
        .union(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
                F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
                F.col("degree"))
    )


TRIANGLES_SQL = f"""
WITH bip0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
), keep AS (
  SELECT c FROM bip0 GROUP BY c HAVING COUNT(*) <= {CUST_DEG_CAP}
), bip AS (
  SELECT b.c, b.s FROM bip0 b JOIN keep k ON k.c = b.c
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
  FROM bip a JOIN bip b ON a.c = b.c AND a.s < b.s
  GROUP BY a.s, b.s
), hist AS (
  SELECT shared, COUNT(*) AS cnt FROM pairs GROUP BY shared
), tot AS (
  SELECT SUM(cnt) AS n FROM hist
), thr AS (
  SELECT MIN(shared) AS thr FROM (
    SELECT shared, SUM(cnt) OVER (ORDER BY shared) AS cum FROM hist
  ), tot
  WHERE cum >= ({TOP_PAIR_PCT} * n) // 100 + 1
), proj AS (
  SELECT s1, s2 FROM pairs, thr
  WHERE shared >= GREATEST(thr, {MIN_SHARED})
), tris AS (
  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM proj e1
  JOIN proj e2 ON e2.s1 = e1.s2
  JOIN proj e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
), per_node AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris)
  GROUP BY node
), deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT s1 AS node FROM proj
    UNION ALL SELECT s2 FROM proj)
  GROUP BY node
)
SELECT (d.node - 1) // 2 AS s_suppkey,
       CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(d.degree AS BIGINT) AS degree
FROM deg d LEFT JOIN per_node p ON p.node = d.node
"""


QUERIES = [
    QuerySpec("pagerank_purchase_graph", pagerank_purchase_graph,
              PAGERANK_SQL, headline=True),
    QuerySpec("triangles_copurchase", triangles_copurchase,
              TRIANGLES_SQL),
]
