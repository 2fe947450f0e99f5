"""MQ routing semantics as driver-checkable queries. The broker
transport itself is exercised in tests/test_mq_http.py (publish →
checkpointed subscribe → envelope); what's gated here is the routing
logic every MQ consumer depends on: NATS wildcard subject matching
compiled to Column algebra (sources/mq.py::subject_matches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec
from connect_spark.sources.mq import subject_matches


def mq_subject_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-side subject construction + subscribe-side wildcard
    filters: subject = events.<type>.u<user_id mod 10>; consumers
    `events.*.u3` (middle wildcard) and `events.purchase.>` (trailing
    wildcard) — each row reports which consumers would receive it."""
    ev = load_table(spark, sf_dir, "events")
    subject = F.concat(
        F.lit("events."),
        F.col("event_type"),
        F.lit(".u"),
        (F.col("user_id") % 10).cast("string"),
    )
    out = ev.select("event_id", subject.alias("subject"))
    return out.select(
        "event_id",
        "subject",
        subject_matches(F.col("subject"), "events.*.u3")
        .cast("int")
        .alias("to_u3_consumer"),
        subject_matches(F.col("subject"), "events.purchase.>")
        .cast("int")
        .alias("to_purchase_consumer"),
    )


MQ_SUBJECT_SQL = """
WITH m AS (
  SELECT event_id,
         'events.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR)
           AS subject,
         event_type,
         user_id % 10 AS ub
  FROM events
)
SELECT event_id, subject,
       CAST(ub = 3 AS INT) AS to_u3_consumer,
       CAST(event_type = 'purchase' AS INT) AS to_purchase_consumer
FROM m
"""


QUERIES = [
    QuerySpec("mq_subject_route", mq_subject_route, MQ_SUBJECT_SQL),
]
