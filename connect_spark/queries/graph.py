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




def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERS PageRank iterations over the purchase graph; output
    is every SUPPLIER node's final integer rank plus its weighted
    in-degree — the exact rank vector, pinned by the oracle (whose
    SQL runs the iterations literally).

    r15 shape — the iteration algebra collapses (opt guide §8: use
    problem structure the optimizer cannot see).  The graph is
    bipartite BY CONSTRUCTION: src ids are even (2c), dst ids odd
    (2s+1), so no node is ever both.  Therefore
      - customers have no in-edges: from iteration 1 on their rank is
        exactly TELEPORT, independent of R0;
      - every contribution flows from a customer, so from iteration 2
        on the supplier inflow is the constant
        sum((TELEPORT * DAMP_NUM * w) div (DAMP_DEN * deg)) —
        iterations 2..N are identical, and for any PR_ITERS >= 2 the
        final ranks equal that closed form (per-edge-group integer
        flooring matches the oracle's per-iteration term exactly).
    The loop the r14 code ran (3 x [rank shuffle + contribution
    shuffle + rank rebuild join], plus persisted edge/node/in-degree
    frames) is replaced by ONE wide exchange + ONE narrow aggregate:
    raw pairs repartition by src, the (src, dst) rollup and the deg
    window reuse that partitioning, and a single groupBy(dst)
    produces inflow AND weighted in-degree in the same partial-agg
    pass.  Nothing needs persist — the lineage is a single chain.
    If the node spaces ever overlapped, the closed form would be
    wrong — the oracle cross-check (exact integer equality on every
    rank) is the guard."""
    ew = (
        _raw_edges(spark, sf_dir)
        .repartition("src")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("deg", F.sum("w").over(Window.partitionBy("src")))
    )
    return (
        ew.groupBy("dst")
        .agg(
            F.sum(F.expr(
                f"({TELEPORT} * {DAMP_NUM} * w) div ({DAMP_DEN} * deg)"
            )).alias("inflow"),
            F.sum("w").alias("in_w"),
        )
        .select(((F.col("dst") - 1) / 2).cast("long").alias("s_suppkey"),
                (F.lit(TELEPORT) + F.col("inflow")).alias("pagerank_micro"),
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
    keeps the simple id-ordered enumeration).

    r15 pair-generation shape (was: distinct → hub-cap groupBy →
    semi-join → a⋈b self-join on c, four exchanges of the bipartite
    table and a 12M-row join output): ONE groupBy(c).collect_set does
    distinct + hub-cap + per-customer supplier set in a single
    exchange, and the s1 < s2 pairs come from a double explode of the
    set — codegen'd Generate, measured ~1.6x faster than the
    equivalent higher-order-function slice/transform, which is
    CodegenFallback per element.  The tiny sets frame is explicitly
    repartitioned to defaultParallelism before the explode: AQE
    coalesces the pre-explode shuffle by BYTES and cannot see the
    C(k,2) expansion (measured: 5 tasks carrying a 22M-row explode;
    the fan-out is one exchange of |customers| short rows and engages
    every core at any deployment size, with per-task output bounded
    by rows/par x C(CAP,2))."""
    sets = (
        _raw_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("c"))
        .agg(F.collect_set("dst").alias("ss"))
        .filter(F.size("ss") <= CUST_DEG_CAP)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # The pair table is referenced by the histogram and the projection;
    # the projection is referenced 6+ times downstream (degrees,
    # orientation, all three triangle-join legs).  Without
    # materialization the build subtree is replicated into each
    # reference and the physical plan grows combinatorially (measured:
    # 752 parquet scans at 16x).  r15 second tranche: these were
    # persist() — but AQE runs the downstream references as CONCURRENT
    # broadcast sub-jobs, which raced the lazy cache and recomputed
    # the 22M-row explode up to three times (stage audit: three 17-31s
    # executor-time stages for one logical pass).  Eager
    # localCheckpoint materializes each intermediate exactly once,
    # synchronously, and every consumer reads the stored partitions —
    # all frames are orders of magnitude smaller than the pair stream
    # that builds them, exactly the intermediates a production
    # pipeline materializes.
    # the census groups by ONE packed int64 (s1 << 32 | s2) instead of
    # the (s1, s2) two-key tuple: the 22M-row explode feeds a hash agg
    # whose per-row probe cost is dominated by key handling, and the
    # single-long fast path measurably beats the struct key (node ids
    # are < 2^31 at any deployment size by TPC-H key construction)
    code = F.shiftleft(F.col("s1"), 32) + F.col("s2")
    pairs = (
        sets.select(F.explode("ss").alias("s1"), "ss")
        .select("s1", F.explode("ss").alias("s2"))
        .filter(F.col("s1") < F.col("s2"))
        .select(code.alias("code"))
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("shared"))
        .select(F.shiftright("code", 32).alias("s1"),
                F.col("code").bitwiseAND(F.lit((1 << 32) - 1)).alias("s2"),
                "shared")
        .localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
    )
    deg = (
        proj.select(F.col("s1").alias("node"))
        .union(proj.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    d1 = deg.select(F.col("node").alias("s1"), F.col("degree").alias("g1"))
    d2 = deg.select(F.col("node").alias("s2"), F.col("degree").alias("g2"))
    fwd = (F.col("g1") < F.col("g2")) | (
        (F.col("g1") == F.col("g2")) & (F.col("s1") < F.col("s2")))
    o = (
        proj.join(d1, "s1").join(d2, "s2")
        .select(F.when(fwd, F.col("s1")).otherwise(F.col("s2")).alias("u"),
                F.when(fwd, F.col("s2")).otherwise(F.col("s1")).alias("v"))
        .localCheckpoint(eager=True)
    )
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    # one explode instead of a 3-way union of selects over `tris`:
    # tris is NOT persisted, so each union branch would re-evaluate
    # the two wedge joins — the explode emits all three roles from a
    # single evaluation (same rows as the oracle's UNION ALL)
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
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
