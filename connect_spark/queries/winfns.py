"""Analytic window-function matrix + running totals.

Covers the per-row analytic family the windowed-agg queries don't:
rank / dense_rank / row_number / lag / lead / ntile / cume_dist /
percent_rank over a per-customer order history, plus an exact running
total. Parity rules applied: rational outputs (cume_dist,
percent_rank) floor-scale to basis points (floor of identical doubles
always agrees); the running total runs on integer cents so the
cumulative sum is exact in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def fn_window_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(
            Window.partitionBy("o_custkey").orderBy("o_orderpriority")
        ).alias("prio_rank"),
        F.dense_rank().over(
            Window.partitionBy("o_custkey").orderBy("o_orderpriority")
        ).alias("prio_dense"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.floor(F.cume_dist().over(w) * 10000).cast("bigint")
        .alias("cume_bp"),
        F.floor(F.percent_rank().over(w) * 10000).cast("bigint")
        .alias("prank_bp"),
        F.sum(cents).over(wrun).alias("running_cents"),
    )


WINFNS_SQL = """
SELECT o_orderkey,
       o_custkey,
       row_number() OVER w AS rn,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
         AS prio_rank,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
         AS prio_dense,
       lag(o_orderkey, 1) OVER w AS prev_order,
       lead(o_orderkey, 1) OVER w AS next_order,
       ntile(4) OVER w AS quartile,
       CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cume_bp,
       CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS prank_bp,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


QUERIES = [
    QuerySpec("fn_window_matrix", fn_window_matrix, WINFNS_SQL),
]
