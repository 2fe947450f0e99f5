"""As-of join query with DuckDB's native ASOF JOIN as the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.operators.asof import asof_join
from connect_spark.queries import QuerySpec


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: for every purchase event, the most
    recent prior (or simultaneous) view by the same user, plus the gap
    in seconds. One shuffle (window by user) — see operators/asof.py."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_id"],
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.col("view_id_asof").alias("view_id"),
        # parquet may surface ts as TIMESTAMP_NTZ, which Spark 4 refuses
        # to cast straight to long; hop through TIMESTAMP (session tz is
        # UTC) on both sides.  The subtraction cancels any zone offset.
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.col("_rts_asof").cast("timestamp").cast("long")
        ).alias("gap_s"),
    )


ASOF_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, event_id AS view_id, ts
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id, p.purchase_id, v.view_id,
       CAST(floor(epoch(p.ts)) AS BIGINT)
         - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


QUERIES = [
    QuerySpec("asof_attribution", asof_attribution, ASOF_SQL, headline=True),
]
