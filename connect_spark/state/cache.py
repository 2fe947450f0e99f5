"""Cache resources + the `cache` processor operators (SURVEY.md §2.I:
17 cache backends; processor operators get/set/add/delete —
docs/.../processors/cache.adoc:167-169).

Set-based re-expression: a cache is a keyed table. The reference's 17
backends collapse into one abstraction — a path-backed parquet KV
(file/s3/gcs caches: change the path scheme; memory cache: a cached
DataFrame; redis/dynamo: foreachBatch client writes). Operators:

- set   → upsert rows (last writer wins)
- add   → insert-if-absent (the dedupe backing op, dedupe.adoc:53-78)
- get   → broadcast lookup join
- delete→ anti-join removal

At scale the store is partitioned parquet (or Delta/Iceberg for
transactional upserts); the whole-batch upsert replaces per-message
round-trips, which is the set-based superpower the reference lacks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetKVCache:
    """Path-backed keyed cache (key column + arbitrary value cols)."""

    def __init__(self, spark: SparkSession, path: str, key: str = "key"):
        self.spark = spark
        self.path = path
        self.key = key

    # Generational layout (path/v0, path/v1, …): every mutation writes
    # a NEW immutable generation and readers always resolve the latest
    # — the snapshot/manifest pattern table formats use, which also
    # sidesteps Spark's per-path file-listing cache on overwrite.

    def _latest(self) -> int:
        if not os.path.isdir(self.path):
            return -1
        vs = [
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        ]
        return max(vs, default=-1)

    def _gen_path(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def read(self) -> DataFrame | None:
        v = self._latest()
        if v < 0:
            return None
        return self.spark.read.parquet(self._gen_path(v))

    def _write(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._gen_path(self._latest() + 1))

    def set(self, rows: DataFrame) -> None:
        """Upsert: new rows win over existing (cache set)."""
        cur = self.read()
        if cur is None:
            self._write(rows)
            return
        keep = cur.join(
            rows.select(self.key).distinct(), on=self.key, how="left_anti"
        )
        # allowMissingColumns: upstream schema evolution (a new column
        # appearing mid-stream — the lakehouse evolution contract) adds
        # the column here with nulls for pre-evolution generations
        self._write(keep.unionByName(rows, allowMissingColumns=True))

    def add(self, rows: DataFrame) -> DataFrame:
        """Insert-if-absent; returns the rows actually added (the
        reference's add fails per message when present — here the
        rejected set is derivable as rows ∖ added)."""
        cur = self.read()
        if cur is None:
            deduped = rows.dropDuplicates([self.key])
            self._write(deduped)
            return deduped
        fresh = rows.join(
            cur.select(self.key), on=self.key, how="left_anti"
        ).dropDuplicates([self.key])
        self._write(cur.unionByName(fresh, allowMissingColumns=True))
        return fresh

    def get(self, df: DataFrame, on: str | None = None) -> DataFrame:
        """Lookup join (broadcast — cache sides are small by contract)."""
        cur = self.read()
        on = on or self.key
        if cur is None:
            return df
        renamed = cur.withColumnRenamed(self.key, on)
        return df.join(F.broadcast(renamed), on=on, how="left")

    def delete(self, keys: DataFrame) -> None:
        cur = self.read()
        if cur is None:
            return
        self._write(
            cur.join(
                keys.select(self.key).distinct(), on=self.key, how="left_anti"
            )
        )

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop old generations (the compaction knob)."""
        import shutil

        latest = self._latest()
        for v in range(latest - keep_last + 1):
            p = self._gen_path(v)
            if os.path.isdir(p):
                shutil.rmtree(p)
