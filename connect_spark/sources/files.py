"""File-family inputs + scanners (SURVEY.md §2.D object-store row,
scanners list).

The reference decomposes byte streams with scanners (`lines`, `csv`,
`json_documents`, `chunker`, `decompress`, `skip_bom`, …). Spark file
formats subsume most of them as read options; the rest are narrow
post-read transforms. Cloud stores (s3a://, abfss://, gs://) use the
same API — only the path scheme changes, so everything here is
cluster-ready as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCANNERS = ("lines", "csv", "json_documents", "chunker", "to_the_end")


def read_file_messages(
    spark: SparkSession,
    paths: str | list[str],
    scanner: str = "lines",
    scanner_conf: dict | None = None,
) -> DataFrame:
    """`file` input (docs/.../inputs/file.adoc:26) + scanner
    (docs/modules/components/pages/scanners/): rows of `content` plus
    `_meta.path` — the reference attaches the source path as metadata.
    """
    conf = scanner_conf or {}
    if scanner == "lines":
        df = spark.read.text(paths)
        out = df.select(F.col("value").alias("content"))
    elif scanner == "csv":
        out = spark.read.options(
            header=str(conf.get("parse_header_row", True)).lower(),
            inferSchema="true",
        ).csv(paths)
    elif scanner == "json_documents":
        out = spark.read.json(paths)
    elif scanner == "to_the_end":
        # whole file == one message → binaryFile format
        df = spark.read.format("binaryFile").load(paths)
        out = df.select(F.col("content"))
    elif scanner == "chunker":
        size = int(conf.get("size", 1024))
        df = spark.read.format("binaryFile").load(paths)
        n = F.ceil(F.octet_length("content") / size).cast("int")
        out = df.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                    lambda i: F.substring(
                        F.col("content"), i * size + 1, size
                    ),
                )
            ).alias("content")
        )
    else:
        raise ValueError(f"unknown scanner {scanner!r}; known: {SCANNERS}")
    return out.withColumn(
        "_meta",
        F.map_from_arrays(
            F.array(F.lit("path")),
            F.array(F.input_file_name()),
        ),
    )


def stream_files(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file input; `max_files_per_trigger` is the batching-
    policy knob (docs/.../inputs/batched.adoc:110-162 count-based
    batching → trigger sizing)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return getattr(reader, fmt)(path)
