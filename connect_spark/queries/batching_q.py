"""Batching-policy query (SURVEY.md §2.C batching row) with a DuckDB
oracle: count + period + check triggers combined on the events table.

The byte_size (greedy-packing) trigger has no pure-SQL oracle; it is
pinned against an independent sequential reference in
tests/test_batching.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.operators.batching import BatchPolicy, assign_batches
from connect_spark.queries import QuerySpec


def batch_policy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batching policy (`inputs/batched.adoc:110-162`): per user in
    event-time order, a batch flushes when it reaches 5 messages
    (`count`), when a purchase message arrives (`check` — that message
    ends its batch inclusively), or at an hour boundary (`period` as
    event-time bucket). Flushed batches are then aggregated — the
    post-batch `processors` composition. Pure Column algebra: one
    shuffle on user_id, three window passes over the same exchange."""
    ev = load_table(spark, sf_dir, "events")
    policy = BatchPolicy(
        count=5, period="1h", check=F.col("event_type") == F.lit("purchase")
    )
    batched = assign_batches(
        ev,
        policy,
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        ts="ts",
    )
    return batched.groupBy("user_id", "batch_id").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.sum(
            (F.col("event_type") == F.lit("purchase")).cast("long")
        ).alias("n_purchases"),
    )


BATCH_POLICY_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts, event_type,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS bkt
  FROM events
), sub AS (
  SELECT *,
         CAST(FLOOR((row_number() OVER (PARTITION BY user_id, seg, bkt
                                        ORDER BY ts, event_id) - 1) / 5)
              AS BIGINT) AS sub
  FROM base
), ids AS (
  SELECT *,
         dense_rank() OVER (PARTITION BY user_id ORDER BY seg, bkt, sub) - 1
           AS batch_id
  FROM sub
)
SELECT user_id, batch_id,
       COUNT(*) AS n_msgs,
       MIN(event_id) AS first_event,
       MAX(event_id) AS last_event,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM ids
GROUP BY user_id, batch_id
"""


QUERIES = [
    QuerySpec("batch_policy_events", batch_policy_events, BATCH_POLICY_SQL,
              headline=True),
]
