"""Migrator (SURVEY.md §2.E: redpanda_migrator, 1 GB/s Kafka→Kafka —
internal/impl/redpanda/migrator/; benchmark docs/benchmark-results/
redpanda-migrator.md).

Spark form: a checkpointed streaming passthrough. Where the reference
achieves at-least-once via acks, Spark's checkpoint + replayable
source + idempotent file sink give EXACTLY-once across restarts —
`migrate_files` below is the in-container-testable form (file→file);
`migrate_kafka` builds the Kafka→Kafka variant (same plan shape, needs
brokers).

Throughput posture: the passthrough plan is scan→project→write with no
shuffle; parallelism = source partitions (Kafka partitions / file
splits), which is exactly how the reference scales (40 partitions in
its benchmark run).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from connect_spark.sources.kafka import kafka_reader_options, kafka_writer_options


def migrate_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File→file streaming migration with checkpointed exactly-once.
    Restart with the same checkpoint resumes from the last committed
    batch — no duplicates, no gaps (tested in
    tests/test_migrator.py)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = getattr(reader, fmt)(src_path)
    return (
        stream.writeStream.format(fmt)
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def migrate_kafka(
    spark: SparkSession,
    src_conf: dict,
    dst_conf: dict,
    checkpoint: str,
) -> StreamingQuery:
    """Kafka→Kafka passthrough (the redpanda_migrator shape): key,
    value, headers forwarded verbatim; offsets checkpointed."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(src_conf).items():
        reader = reader.option(k, v)
    stream = reader.load().selectExpr(
        "key", "value", "headers", "topic AS src_topic"
    )
    writer = stream.writeStream.format("kafka")
    for k, v in kafka_writer_options(dst_conf).items():
        writer = writer.option(k, v)
    return (
        writer.option("includeHeaders", "true")
        .option("checkpointLocation", checkpoint)
        .start()
    )
