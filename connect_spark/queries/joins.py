"""Join-mechanism queries (SURVEY.md §2.B) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.operators.joins import (
    anti_join,
    enrichment_join,
    semi_join,
    sharded_join,
)
from connect_spark.queries import QuerySpec


# --- sharded_join: full-outer merge with array strategy (F3 fixture) ---

def join_sharded_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sequence` input `sharded_join` (sequence.adoc:199-247): customer
    ⟗ orders with merge_strategy:array. The many-side pre-aggregates
    before the join (one shuffle; the join reuses the partitioning), so
    no row explosion — the reference's `iterations` memory knob is
    subsumed by the shuffle's natural key sharding."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    out = sharded_join(
        cust,
        orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
        on="c_custkey",
        how="full_outer",
        collect={"order_ids": F.col("o_orderkey").cast("string")},
    )
    return out.select(
        "c_custkey",
        "c_name",
        F.coalesce(F.array_join("order_ids", ","), F.lit("")).alias("order_ids"),
        F.coalesce(F.size("order_ids"), F.lit(0)).alias("n_orders"),
    )


SHARDED_SQL = """
SELECT c.c_custkey, c.c_name,
       coalesce(array_to_string(o.order_ids, ','), '') AS order_ids,
       coalesce(len(o.order_ids), 0) AS n_orders
FROM customer c
FULL OUTER JOIN (
  SELECT o_custkey, list_sort(list(CAST(o_orderkey AS VARCHAR))) AS order_ids
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


# --- enrichment lookup join (sql_select processor) ---

def join_enrichment_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sql_select` enrichment (processor_sql_select.go:32-67) made
    set-based: lineitem enriched with part attributes, then revenue per
    brand. `part` scales with sf, so the join strategy is AQE-owned
    (broadcast while part fits, shuffled hash/SMJ beyond); the groupBy
    shuffles only pre-combined partials."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    out = enrichment_join(
        li,
        part.select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type"),
        on="l_partkey",
        how="left",
        broadcast_dim=False,
    )
    return out.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


ENRICH_SQL = """
SELECT p.p_brand,
       count(*) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


# --- semi / anti joins ---

def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left_semi: customers having at least one order over
    300k (the cache-hit side of dedupe-vs-cache, SURVEY.md §2.B)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(cust, big, on="c_custkey").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left_anti: customers with no URGENT orders — the
    `dedupe`-against-cache negative path (dedupe.adoc:53-78).

    The orders side is filtered to one priority so the anti result is
    provably non-empty at every SF (an unfiltered version matched on 0
    rows — trivially green)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return anti_join(
        cust,
        urgent.select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    ).select("c_custkey", "c_name")


ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# --- star join (multi-way, Q5 shape) ---

def join_star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (F6 fixture): lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region, revenue per nation. True dims (nation/region)
    broadcast; the customer-sized dim joins by key under AQE; the big
    shuffle is lineitem⋈orders on orderkey plus the final tiny
    aggregation — the plan Catalyst+AQE picks survives a 100× scale-up."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    out = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == orders.o_orderkey,
        )
        # dim carries one row per customer (sf-scaled): no forced
        # broadcast — AQE broadcasts at small sf, SMJ at 100x.
        .join(dim, F.col("o_custkey") == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return out


STAR_SQL = """
SELECT r.r_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


# --- salted skew join + branch enrichment (driver rows) -------------

def join_salted_skew(spark, sf_dir):
    """Salted/skew join (operators/skew.py): orders (big, potentially
    hot custkeys) x customer (small) with an 8-way salt — the result
    must equal the plain equi-join bit-for-bit, which is exactly what
    the oracle checks. At scale the salt spreads one hot key over 8
    reducers; AQE's skew splitting is the automatic fallback."""
    from connect_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(orders, cust, on="o_custkey", salt_factor=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


SALTED_SQL = """
SELECT c_nationkey,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def branch_enrich_orders(spark, sf_dir):
    """`branch` processor (branch.adoc:26; operators/branch.py
    branch_aggregate): request_map projects (o_custkey, o_totalprice),
    the child pipeline aggregates per customer, result_map merges the
    enrichment back into every original message. The aggregate is one
    row per customer (sf-scaled), so the join back is AQE-owned."""
    from connect_spark.operators.branch import branch_aggregate

    orders = load_table(spark, sf_dir, "orders")

    def child(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("cust_order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("cust_total"),
        )

    out = branch_aggregate(orders, keys=["o_custkey"], agg_fn=child)
    return out.select(
        "o_orderkey", "o_custkey", "cust_order_count", "cust_total"
    )


BRANCH_SQL = """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey) AS cust_order_count,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2)
         AS cust_total
FROM orders
"""


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free co-located join via bucketed tables
    (operators/bucketed.py): orders and customer are both persisted
    `bucketBy(8, custkey)` + `sortBy(custkey)` as external tables,
    then joined — the SortMergeJoin consumes the bucketed scans with
    NO shuffle and NO sort on either side
    (tests/test_bucketed.py asserts the plan).  This is the persisted
    form of the reference's sharded `sequence` join (sequence.adoc
    shard mapping): pay the layout once, every later join on the
    bucket key is shuffle-free — at 100 TB that removes the two
    largest exchanges of the pipeline.  The write+read here exercises
    the full cycle in one query; only the post-join segment
    aggregation shuffles (5 groups)."""
    import hashlib
    import os
    import tempfile

    from connect_spark.operators.bucketed import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"cs_bucketed_{tag}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    write_bucketed(orders, f"cs_b_orders_{tag}",
                   os.path.join(base, "orders"), ["o_custkey"])
    write_bucketed(customer, f"cs_b_customer_{tag}",
                   os.path.join(base, "customer"), ["c_custkey"])
    o = spark.table(f"cs_b_orders_{tag}")
    c = spark.table(f"cs_b_customer_{tag}")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_revenue")))


BUCKETED_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES = [
    QuerySpec("join_sharded_full_outer", join_sharded_full_outer, SHARDED_SQL),
    QuerySpec("bucketed_join_revenue", bucketed_join_revenue, BUCKETED_SQL),
    QuerySpec("join_enrichment_lookup", join_enrichment_lookup, ENRICH_SQL, headline=True),
    QuerySpec("join_semi_big_spenders", join_semi_big_spenders, SEMI_SQL),
    QuerySpec("join_anti_no_orders", join_anti_no_orders, ANTI_SQL),
    QuerySpec("join_star_revenue_by_nation", join_star_revenue_by_nation, STAR_SQL, headline=True),
    QuerySpec("join_salted_skew", join_salted_skew, SALTED_SQL),
    QuerySpec("branch_enrich_orders", branch_enrich_orders, BRANCH_SQL),
]
