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


def migrate_files_passthrough(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    glob: str = "*.parquet",
) -> int:
    """Format-identical fast path: when source and sink speak the SAME
    format and the pipeline applies no transformation, the migrator
    does not need to decode anything — it moves file bytes verbatim,
    exactly like the reference's Kafka migrator forwards record
    batches without deserializing payloads.  One task per file
    (binaryFile split planning), executor-side copy to a temp name
    then atomic rename, so a re-run after partial failure overwrites
    cleanly instead of duplicating.  Returns the number of files
    copied.  On a cluster dst must be a path every executor can reach
    (object-store mount / shared FS) — the same contract every
    Spark file sink already has."""
    import os

    os.makedirs(dst_path, exist_ok=True)
    # only PATHS ride the plan (binaryFile prunes the content column)
    # — the bytes move executor-side kernel-to-kernel, never through
    # Arrow serialization
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(src_path)
        .select("path")
    )

    def copy(batches):
        import os as _os
        import shutil as _shutil
        from urllib.parse import urlparse as _urlparse

        import pandas as _pd

        n = 0
        for pdf in batches:
            for path in pdf["path"]:
                local = _urlparse(path).path or path
                base = _os.path.basename(local)
                tmp = _os.path.join(dst_path, "." + base + ".tmp")
                _shutil.copyfile(local, tmp)
                _os.replace(tmp, _os.path.join(dst_path, base))
                n += 1
        yield _pd.DataFrame({"n": [n]})

    counts = files.mapInPandas(copy, "n LONG").collect()
    return int(sum(r["n"] for r in counts))


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
