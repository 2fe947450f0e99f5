"""Classic relational coverage (F6 fixture: TPC-H Q3/Q6/Q10 shapes)
plus the bucketed range join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.operators.rangejoin import range_join
from connect_spark.queries import QuerySpec


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order, top 10."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") > "1995-03-15")
        .join(
            orders.filter(F.col("o_orderdate") < "1995-03-15").select(
                "o_orderkey", "o_custkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # No broadcast hint: customer scales with sf, so AQE must own
            # the strategy (broadcast at small sf, SMJ at 100x).
            cust.filter(F.col("c_mktsegment") == "BUILDING").select(
                "c_custkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.col("o_orderdate").cast("string").alias("o_date"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return out


Q3_SQL = """
SELECT l_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_date,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discount band — pure
    scan+filter+agg, the pushdown showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return out


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    out = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-10-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # customer is sf-scaled: no forced broadcast, AQE decides.
            cust.select("c_custkey", "c_name", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
    return out


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def range_join_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchase within 10 minutes after a view by the same
    user (bucketed equi-join — no nested loop; operators/rangejoin.py).
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    out = range_join(
        views,
        purchases,
        on=["user_id"],
        left_ts="view_ts",
        right_ts="purchase_ts",
        max_gap_seconds=600,
    )
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        (
            F.col("purchase_ts").cast("long") - F.col("view_ts").cast("long")
        ).alias("gap_s"),
    )


RANGE_JOIN_SQL = """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_id, p.purchase_id,
       CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
         - CAST(floor(epoch(v.view_ts)) AS BIGINT) AS gap_s
FROM v JOIN p ON v.user_id = p.user_id
WHERE CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
        - CAST(floor(epoch(v.view_ts)) AS BIGINT) > 0
  AND CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
        - CAST(floor(epoch(v.view_ts)) AS BIGINT) <= 600
"""


# --- Q14 shape: promo revenue share (fact x dim join + ratio) ---

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape on this schema: PROMO parts' share of revenue
    for one ship-year. part is sf-scaled so the join strategy is left
    to AQE; lineitem keeps its pushed-down date filter. Parity: both sums round to exact 2-dec
    doubles FIRST, then the ratio/floor runs on identical inputs —
    no cross-engine last-ulp hazard."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part")
    part_proj = part.select("p_partkey", "p_type")
    joined = li.join(part_proj, li["l_partkey"] == part_proj["p_partkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = joined.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2
        ).alias("promo_revenue"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.floor(
            F.col("promo_revenue") * 1000000.0 / F.col("total_revenue")
        ).cast("bigint").alias("promo_ppm"),
    )


Q14_SQL = """
WITH agg AS (
  SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0.0 END), 2) AS promo_revenue,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
           AS total_revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
)
SELECT promo_revenue, total_revenue,
       CAST(floor(promo_revenue * 1000000.0 / total_revenue) AS BIGINT)
         AS promo_ppm
FROM agg
"""


QUERIES = [
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, headline=True),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL),
    QuerySpec("range_join_view_purchase", range_join_view_purchase, RANGE_JOIN_SQL),
]
