"""Structured-Streaming execution checked by the SAME SQL oracle as
its batch twin: the events table is consumed as a file STREAM in
several micro-batches, aggregated with streaming window semantics into
a memory sink, and the drained result must hash-equal the DuckDB
answer — stream == batch, end to end, inside the driver's correctness
gate (not just pytest).

Reference: the system_window buffer's replay/complete semantics
(docs/.../buffers/system_window.adoc); Spark side is readStream →
window agg → complete-mode memory sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import _prepare_session, table_path
from connect_spark.queries import QuerySpec
from connect_spark.queries.windows import TUMBLING_SQL


def window_tumbling_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`window_tumbling_hourly` executed as a stream: maxFilesPerTrigger
    forces micro-batching, the windowed aggregation runs in complete
    mode, and the drained memory table is returned as a batch frame.
    Same oracle as the batch query — a streaming-execution bug (window
    assignment, state merge, sink mode) breaks the hash."""
    _prepare_session(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # file streams need a directory source: point at sf_dir and glob
    # down to the events table
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from pyspark.sql import types as T

    if isinstance(stream.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            # countDistinct is rejected on streams; an exact distinct
            # via collect_set state is the streaming equivalent
            F.size(F.collect_set("user_id")).alias("n_users"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )
    name = "strq_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the memory sink table is session-scoped and uniquely named; the
    # caller (driver) collects it immediately
    return spark.table(name)


def streaming_dedupe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedupe` executed as a STREAM (dedupe.adoc:26,53-78 — cache-add
    semantics == streaming dropDuplicates state): events stream in,
    each (user_id, event_type) key is emitted exactly once in append
    mode, and the drained sink must equal DuckDB's DISTINCT. Output is
    keys only, so the which-row-survives choice (arbitrary in both the
    reference's cache race and Spark's state store) can't skew the
    hash — this checks the state machinery, not arrival order."""
    _prepare_session(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dedup = stream.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    name = "strq_" + uuid.uuid4().hex[:12]
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


STREAM_DEDUPE_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming state in the gate: the cache-counter
    pattern (cache.adoc:167-169 incrby; streaming/stateful.py
    running_totals / applyInPandasWithState) run as a real multi-batch
    stream. Events are staged into 4 files so maxFilesPerTrigger=1
    forces 4 micro-batches and per-key state genuinely carries across
    batches; the drained update-mode sink keeps each key's LAST emit
    (highest running_count), which must equal the batch groupBy —
    a bug in state carry/merge breaks the hash."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from connect_spark.streaming.stateful import running_totals

    _prepare_session(spark)
    ev = spark.read.parquet(table_path(sf_dir, "events")).select(
        "user_id", "value"
    )
    staged = tempfile.mkdtemp(prefix="rt_stream_")
    try:
        ev.repartition(4).write.mode("overwrite").parquet(staged)
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        out = running_totals(stream, "user_id", "value")
        name = "strq_" + uuid.uuid4().hex[:12]
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        drained = spark.table(name)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    w = Window.partitionBy("key").orderBy(F.col("running_count").desc())
    return (
        drained.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("key").cast("bigint").alias("user_id"),
            "running_count",
            "running_total",
        )
    )


RUNNING_TOTALS_SQL = """
SELECT user_id,
       count(*) AS running_count,
       round(sum(value), 2) AS running_total
FROM events
GROUP BY user_id
"""


QUERIES = [
    QuerySpec("window_tumbling_streamed", window_tumbling_streamed,
              TUMBLING_SQL),
    QuerySpec("streaming_dedupe_keys", streaming_dedupe_keys,
              STREAM_DEDUPE_SQL),
    QuerySpec("streaming_running_totals", streaming_running_totals,
              RUNNING_TOTALS_SQL),
]
