"""Batching-policy queries (SURVEY.md §2.C batching row) with DuckDB
oracles: count + period + check triggers combined on the events table
(batch_policy_events), and the byte_size greedy-packing trigger
(batch_policy_bytes) — greedy running-sum-with-reset is inherently
sequential per group, so its oracle is a RECURSIVE CTE that walks each
user's rows in order carrying (accumulated bytes, batch id), exactly
the per-group state machine `_assign_greedy` runs inside
applyInPandas.  Also pinned against an independent sequential
reference in tests/test_batching.py.
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


def batch_policy_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """byte_size batching (`inputs/batched.adoc:110-162`, the
    `byte_size` trigger): per user in event-time order, a batch
    flushes when its accumulated payload bytes REACH 2000 (the
    closing row is included — the reference flushes after append).
    Payload size is the deterministic surrogate
    (event_id mod 900) + 100, so both engines derive it exactly.
    One shuffle on user_id; the greedy state machine runs
    Arrow-batched per group (operators/batching.py::_assign_greedy),
    the unavoidable shape for an order-dependent running reset."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        (F.col("event_id") % 900 + 100).alias("payload_bytes"))
    policy = BatchPolicy(byte_size=2000, size=F.col("payload_bytes"))
    batched = assign_batches(
        ev,
        policy,
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
    )
    return batched.groupBy("user_id", "batch_id").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum("payload_bytes").alias("total_bytes"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


# the greedy packing recursion: state (bid of row rn, post-row batch /
# accumulator) stepped one row at a time per user — sequential by
# nature, which is exactly why the Spark side is an applyInPandas
# state machine rather than window algebra.
BATCH_BYTES_SQL = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_id,
         (event_id % 900) + 100 AS sz,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), st(user_id, rn, sz, bid, nbid, nacc) AS (
  SELECT user_id, rn, sz, 0,
         CASE WHEN sz >= 2000 THEN 1 ELSE 0 END,
         CASE WHEN sz >= 2000 THEN 0 ELSE sz END
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.sz, s.nbid,
         CASE WHEN s.nacc + e.sz >= 2000 THEN s.nbid + 1 ELSE s.nbid END,
         CASE WHEN s.nacc + e.sz >= 2000 THEN 0 ELSE s.nacc + e.sz END
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
), packed AS (
  SELECT s.user_id, e.event_id, s.sz, s.bid
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn
)
SELECT user_id, CAST(bid AS BIGINT) AS batch_id,
       COUNT(*) AS n_msgs,
       CAST(SUM(sz) AS BIGINT) AS total_bytes,
       MIN(event_id) AS first_event,
       MAX(event_id) AS last_event
FROM packed
GROUP BY user_id, bid
"""


QUERIES = [
    QuerySpec("batch_policy_events", batch_policy_events, BATCH_POLICY_SQL,
              headline=True),
    QuerySpec("batch_policy_bytes", batch_policy_bytes, BATCH_BYTES_SQL),
]
