"""`generate` input as a custom Python DataSource (streaming).

Reference: docs/modules/components/pages/inputs/generate.adoc:96-155 —
rows produced from a mapping at an interval with `count` bounding the
total. This is ALSO the template for the CDC streaming phase
(SURVEY.md §2.D): a SimpleDataSourceStreamReader whose offset (here a
row index; for CDC an LSN/GTID/SCN) is checkpointed by Spark — restart
resumes from the committed offset exactly like the reference's
checkpoint cache (internal/impl/mysql/input_mysql_stream.go:48-50).

Registered as `spark.dataSource.register(GenerateDataSource)`, then:

    spark.readStream.format("generate_stream")
         .option("rows_per_batch", 100).option("max_rows", 1000)
         .load()

Schema is fixed: (n BIGINT, gen_ts TIMESTAMP) — apply a Bloblang
mapping downstream to shape rows (compile_mapping), matching the
reference's mapping-over-counter model.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("gen_ts", TimestampType()),
    ]
)


class GenerateStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", -1))  # -1 = unbounded

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        begin = start["index"]
        if self.max_rows >= 0 and begin >= self.max_rows:
            return iter([]), {"index": begin}
        end = begin + self.rows_per_batch
        if self.max_rows >= 0:
            end = min(end, self.max_rows)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = [(i, now) for i in range(begin, end)]
        return iter(rows), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay between committed offsets (exactly the
        # CDC re-read contract); gen_ts regenerates but the key is n
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        return iter([(i, now) for i in range(start["index"], end["index"])])


class GenerateDataSource(DataSource):
    """Bounded/unbounded synthetic row stream with checkpointable
    offsets."""

    @classmethod
    def name(cls) -> str:
        return "generate_stream"

    def schema(self):
        return _SCHEMA

    def simpleStreamReader(self, schema):
        return GenerateStreamReader(self.options)
