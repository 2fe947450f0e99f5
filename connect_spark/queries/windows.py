"""Windowed-aggregation queries (SURVEY.md §2.C — `system_window`
buffer semantics) with DuckDB oracles.

The oracle side reproduces Spark's epoch-aligned window math explicitly
(date_trunc / bucket arithmetic), so the compare verifies the window
assignment itself, not just the aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.operators.windows import (
    sliding_window_agg,
    tumbling_window_agg,
)
from connect_spark.queries import QuerySpec


# --- tumbling window: the reference's traffic worked example (F1) ---

def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window per event_type — the
    `system_window` worked example (system_window.adoc:76-123) on the
    events table: count + sum + distinct users per window."""
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        ev,
        ts=F.col("ts"),
        size="1 hour",
        keys=[F.col("event_type")],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 2),
            "n_users": F.countDistinct("user_id"),
        },
    )
    return out.select(
        F.col("window_start").cast("string").alias("win_start"),
        "event_type",
        "n_events",
        "total_value",
        "n_users",
    )


TUMBLING_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# --- sliding window ---

def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window, size 1h slide 30m (`slide` field,
    system_window.adoc:41-47): every event lands in exactly two
    windows. Narrow row-replication before one aggregation shuffle —
    the same cost shape as the reference's per-window copies."""
    ev = load_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        ev,
        ts=F.col("ts"),
        size="1 hour",
        slide="30 minutes",
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 2),
        },
    )
    return out.select(
        F.col("window_start").cast("string").alias("win_start"),
        "n_events",
        "total_value",
    )


# Oracle replicates Spark's sliding assignment: the two windows an event
# belongs to start at bucket30(ts) and bucket30(ts) - 30min.
SLIDING_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, * FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w, *
  FROM events
)
SELECT CAST(w AS VARCHAR) AS win_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM assigned
GROUP BY w
"""


# --- session window (exceeds the reference surface; SURVEY.md §4.2) ---

def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 5-minute gap — absent in the
    reference (SURVEY.md §4.2 "free upgrade"), native in Spark."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return out.select(
        "user_id",
        F.col("w.start").cast("string").alias("session_start"),
        "n_events",
        "total_value",
    )


# Oracle: classic gaps-and-islands — a new session starts when the gap
# from the previous event of the same user exceeds 5 minutes.
SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '5 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       CAST(min(ts) AS VARCHAR) AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


# --- daily rollup over orders (batch windowing on a date column) ---

def window_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling rollup on orders — window assignment via
    date_trunc on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("day", "o_orderdate").cast("string").alias("day"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


DAILY_SQL = """
SELECT CAST(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS day,
       o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
"""


QUERIES = [
    QuerySpec("window_tumbling_hourly", window_tumbling_hourly, TUMBLING_SQL, headline=True),
    QuerySpec("window_sliding", window_sliding, SLIDING_SQL),
    QuerySpec("window_session", window_session, SESSION_SQL),
    QuerySpec("window_daily_orders", window_daily_orders, DAILY_SQL),
]


def system_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The system_window worked example VERBATIM-SHAPED
    (system_window.adoc:100-123 — buffer: system_window with
    timestamp_mapping + group_by_value on an interpolated json() key +
    the batch_index()==0 / from_all() reduce mapping) over the events
    table: lights = user_id buckets, plates = event_type, passengers
    derived from event_id. Exercises the whole YAML component chain
    including `meta("window_end_timestamp")` (adoc:47; compared as a
    session-tz-independent equality boolean, the timestamp itself as
    a cast string like every other window query).

    Scale shape: window stamp is a narrow projection; the reduce is
    ONE window over (group_key, window) — a single hash exchange, no
    per-group Python."""
    from connect_spark.catalog import load_table
    from connect_spark.plans.pipeline import apply_processor
    from connect_spark.plans.state_ext import apply_buffer

    ev = load_table(spark, sf_dir, "events")
    msgs = ev.select(
        (F.col("user_id") % 20).cast("string").alias("traffic_light"),
        F.col("ts").alias("created_at"),
        F.col("event_type").alias("registration_plate"),
        (F.col("event_id") % 5 + 1).alias("passengers"),
        F.col("event_id").alias("_arrival_order"),
    )
    out = apply_buffer(msgs, {"system_window": {
        "timestamp_mapping": "root = this.created_at",
        "size": "1h",
    }})
    out = apply_processor(out, {"group_by_value": {
        "value": '${! json("traffic_light") }',
    }})
    out = apply_processor(out, {"mapping": '''
root = if batch_index() == 0 {
  {
    "traffic_light": this.traffic_light,
    "win_end": this.window_end_timestamp,
    "meta_ok": meta("window_end_timestamp") != "",
    "total_cars": json("registration_plate").from_all().unique().length(),
    "passengers": json("passengers").from_all().sum(),
  }
} else { deleted() }
'''})
    return out.select(
        "traffic_light",
        F.col("win_end").cast("string").alias("win_end"),
        "meta_ok",
        F.col("total_cars").cast("long").alias("total_cars"),
        F.round(F.col("passengers"), 2).alias("passengers"),
    )


SYSTEM_WINDOW_TRAFFIC_SQL = """
SELECT CAST(user_id % 20 AS VARCHAR) AS traffic_light,
       CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS VARCHAR)
         AS win_end,
       TRUE AS meta_ok,
       count(DISTINCT event_type) AS total_cars,
       round(sum(event_id % 5 + 1), 2) AS passengers
FROM events
GROUP BY 1, 2
"""


QUERIES += [
    QuerySpec("system_window_traffic", system_window_traffic,
              SYSTEM_WINDOW_TRAFFIC_SQL),
]
