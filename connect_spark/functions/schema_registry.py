"""`schema_registry_decode` / `schema_registry_encode` wire format
(reference: internal/impl/confluent/processor_schema_registry_
{decode,encode}.go — the Confluent frame: magic byte 0x00, 4-byte
big-endian schema id, then the encoded payload).

Frame parse/build is pure Column algebra (hex/conv/substring on
binary) — no UDF. Payload decoding dispatches on schema id: JSON
payloads decode natively via from_json; Avro payloads decode through
the pure-Python codec (functions/avro_codec.py, Arrow-batched), the
same path the reference's
processor_schema_registry_decode.go takes for avro-typed subjects.

Without a live registry server, the registry is supplied as a dict
{schema_id: str DDL | RegistrySchema} — the same information the HTTP
client would fetch and cache (the reference caches schemas the same
way)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_spark.errors import flag_error


@dataclass(frozen=True)
class RegistrySchema:
    """One registry subject version: `fmt` is "json" or "avro";
    `spark_ddl` is the Spark-side row type; `avro_schema` is the Avro
    writer schema JSON (avro only)."""

    fmt: str
    spark_ddl: str
    avro_schema: str | None = None

_MAX_LEN = (1 << 31) - 1


def parse_confluent_frame(col: Column | str) -> Column:
    """binary frame → struct(magic_ok, schema_id, payload)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        (F.hex(F.substring(c, 1, 1)) == "00").alias("magic_ok"),
        F.conv(F.hex(F.substring(c, 2, 4)), 16, 10)
        .cast("int")
        .alias("schema_id"),
        F.substring(c, 6, _MAX_LEN).alias("payload"),
    )


def encode_confluent_frame(payload: Column, schema_id: int) -> Column:
    """payload bytes + id → framed binary."""
    header = F.unhex(F.lit("00" + format(schema_id, "08x")))
    return F.concat(header, payload.cast("binary"))


def schema_registry_decode(
    df: DataFrame,
    col: str,
    registry: dict[int, str],
    out: str = "decoded",
) -> DataFrame:
    """Decode framed JSON payloads; unknown ids / bad magic set
    `_error` (the reference's per-message failure contract)."""
    frame = parse_confluent_frame(col)
    df = df.withColumn("_frame", frame)
    df = flag_error(
        df, ~F.col("_frame.magic_ok"), "schema_registry: bad magic byte"
    )
    df = flag_error(
        df,
        F.col("_frame.magic_ok")
        & ~F.col("_frame.schema_id").isin(*registry.keys()),
        "schema_registry: unknown schema id",
    )
    decoded: Column | None = None
    payload_str = F.col("_frame.payload").cast("string")
    for sid, entry in registry.items():
        if isinstance(entry, str):
            entry = RegistrySchema("json", entry)
        if entry.fmt == "json":
            branch = F.to_json(F.from_json(payload_str, entry.spark_ddl))
        elif entry.fmt == "avro":
            from connect_spark.functions.avro_codec import avro_decode_udf

            branch = F.to_json(
                F.from_json(
                    avro_decode_udf(entry.avro_schema)(F.col("_frame.payload")),
                    entry.spark_ddl,
                )
            )
        else:
            raise ValueError(f"unknown registry format {entry.fmt!r}")
        expr = F.when(F.col("_frame.schema_id") == sid, branch)
        decoded = expr if decoded is None else decoded.when(
            F.col("_frame.schema_id") == sid, branch
        )
    df = df.withColumn(out, decoded)
    return df.withColumn("schema_id", F.col("_frame.schema_id")).drop("_frame")
