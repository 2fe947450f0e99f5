"""Kafka-family inputs/outputs (SURVEY.md §2.D Kafka row; reference
internal/impl/kafka/, ordered reader franz_reader_ordered.go:73-74).

Maps the reference's `kafka`/`redpanda` config fields onto Spark's
native Kafka source options. Offset management, consumer ordering and
group semantics are Spark-native (checkpointed offsets replace the
reference's ack-based commit, giving exactly-once to idempotent
sinks instead of at-least-once — SURVEY.md §4.2).

No broker exists in this container, so tests cover the option mapping
and envelope projection only; the reader construction is the same call
a cluster run would use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(conf: dict) -> dict[str, str]:
    """Reference config → Spark Kafka options.

    Supported fields (docs/.../inputs/kafka.adoc): `addresses`,
    `topics`, `consumer_group`, `client_id`, `start_from_oldest`,
    `checkpoint_limit` (→ maxOffsetsPerTrigger, the rate-limit/batching
    knob)."""
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": ",".join(conf["addresses"]),
        "subscribe": ",".join(conf["topics"]),
        "startingOffsets": (
            "earliest" if conf.get("start_from_oldest", True) else "latest"
        ),
        # headers ride along by default (the reference forwards them;
        # without this option Spark's reader omits the column and any
        # `headers` projection fails at analysis)
        "includeHeaders": "true",
    }
    if conf.get("consumer_group"):
        opts["kafka.group.id"] = conf["consumer_group"]
    if conf.get("client_id"):
        opts["kafka.client.id"] = conf["client_id"]
    if conf.get("checkpoint_limit"):
        opts["maxOffsetsPerTrigger"] = str(conf["checkpoint_limit"])
    return opts


def kafka_envelope(df: DataFrame) -> DataFrame:
    """Project the Kafka source columns into the engine's message
    envelope: `content` (bytes) + `_meta` map carrying topic/
    partition/offset/timestamp/key — the reference's metadata fields
    (kafka input metadata: kafka_topic, kafka_partition, kafka_offset,
    kafka_timestamp, kafka_key)."""
    return df.select(
        F.col("value").alias("content"),
        F.map_from_arrays(
            F.array(
                F.lit("kafka_topic"),
                F.lit("kafka_partition"),
                F.lit("kafka_offset"),
                F.lit("kafka_timestamp_ms"),
                F.lit("kafka_key"),
            ),
            F.array(
                F.col("topic"),
                F.col("partition").cast("string"),
                F.col("offset").cast("string"),
                F.unix_millis("timestamp").cast("string"),
                F.col("key").cast("string"),
            ),
        ).alias("_meta"),
    )


def kafka_source(spark: SparkSession, conf: dict, streaming: bool = True):
    """Build the (lazy) Kafka reader; call `.load()` → `kafka_envelope`
    on a cluster with brokers reachable."""
    reader = spark.readStream if streaming else spark.read
    reader = reader.format("kafka")
    for k, v in kafka_reader_options(conf).items():
        if not streaming and k == "startingOffsets" and v == "latest":
            # batch reads reject startingOffsets=latest (empty range);
            # the batch analog of "start from newest" is the full range
            v = "earliest"
        reader = reader.option(k, v)
    return reader


def kafka_writer_options(conf: dict) -> dict[str, str]:
    """Reference `kafka` output config → Spark sink options
    (docs/.../outputs/kafka.adoc); `max_in_flight` maps to producer
    in-flight batching which Spark's Kafka sink manages internally."""
    return {
        "kafka.bootstrap.servers": ",".join(conf["addresses"]),
        "topic": conf["topic"],
    }
