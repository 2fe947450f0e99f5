"""Lakehouse sinks (SURVEY.md §2.E: iceberg with schema evolution —
internal/impl/iceberg/output_iceberg.go, type inference + evolution
type_inference.go:62,210).

- `write_iceberg` uses the native `df.writeTo(table)` path when an
  Iceberg catalog is configured on the session; in this container no
  Iceberg jars exist, so the call fails fast with a clear message
  (the code path is the real one for a cluster).
- `LakehouseWriter` is the self-contained analog: partitioned parquet
  with additive schema evolution (mergeSchema on read, missing
  columns null-filled on append) — the same evolution contract the
  reference's Iceberg sink implements (new columns appear, old rows
  read as null)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_iceberg(df: DataFrame, table: str, mode: str = "append") -> None:
    try:
        writer = df.writeTo(table)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "Iceberg catalog not available in this environment; "
            "configure spark.sql.catalog.<name>=org.apache.iceberg."
            "spark.SparkCatalog on a cluster, or use LakehouseWriter "
            "(partitioned parquet + schema evolution)"
        ) from exc


class LakehouseWriter:
    """Append-only partitioned parquet table with additive schema
    evolution."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by or []

    def _existing_schema(self):
        try:
            return self.spark.read.parquet(self.path).schema
        except Exception:  # noqa: BLE001 — first write
            return None

    def append(self, df: DataFrame) -> None:
        """Append with evolution: columns known to the table but
        missing from `df` are null-filled; new columns in `df` simply
        appear (readers use mergeSchema)."""
        existing = self._existing_schema()
        if existing is not None:
            for field in existing.fields:
                if field.name not in df.columns:
                    df = df.withColumn(
                        field.name, F.lit(None).cast(field.dataType)
                    )
        writer = df.write.mode("append")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.path
        )


    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
    ) -> dict:
        """Small-file compaction (the Iceberg `rewrite_data_files`
        maintenance action this sink's parquet analog needs at scale:
        streaming appends produce a file per micro-batch per partition,
        and a 100 TB table read slows to a crawl on footer overhead).

        Rewrites the table — per partition directory when partitioned —
        into ceil(bytes / target_file_bytes) files via a staging dir and
        two renames. Returns {files_before, files_after, bytes}; no-op
        below `min_files`.

        NOT atomic for concurrent access — this is a maintenance
        window operation, like running `rewrite_data_files` without a
        catalog to commit through:
        - single writer: rows appended between the staging rewrite and
          the swap would be silently dropped — callers must quiesce
          appends (a `.compact.lock` sentinel enforces one compactor
          and lets cooperating appenders check/wait);
        - readers racing the swap can observe a missing path in the
          window between the two renames;
        - `os.rename` requires staging/backup to live on the same
          filesystem as the table path (they are siblings, so this
          only breaks if a mount boundary splits the parent dir).
        A real multi-writer table needs the Iceberg catalog commit
        protocol (sinks/lakehouse.py Iceberg path) — this parquet-dir
        analog trades that for zero infrastructure.
        """
        import os

        backup = self.path.rstrip("/") + "._old"
        staging = self.path.rstrip("/") + "._compact"
        lock = self.path.rstrip("/") + ".compact.lock"
        try:
            lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"another compaction holds {lock} — one compactor at a "
                "time; remove the stale lock only if its owner is dead"
            )
        os.close(lock_fd)
        try:
            return self._compact_locked(
                backup, staging, target_file_bytes, min_files
            )
        finally:
            os.remove(lock)

    def _compact_locked(
        self, backup: str, staging: str, target_file_bytes: int, min_files: int
    ) -> dict:
        import os
        import shutil

        def parquet_files(root: str) -> list[str]:
            out = []
            for dirpath, _dirs, files in os.walk(root):
                out += [
                    os.path.join(dirpath, f)
                    for f in files
                    if f.endswith(".parquet")
                ]
            return out
        # crash recovery: a leftover backup with no live table means a
        # previous compact died between its two renames — restore it;
        # stale staging/backup dirs are otherwise discarded so the
        # renames below cannot collide
        if os.path.exists(backup) and not os.path.exists(self.path):
            os.rename(backup, self.path)
        shutil.rmtree(backup, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

        before = parquet_files(self.path)
        total = sum(os.path.getsize(f) for f in before)
        if len(before) < min_files:
            return {
                "files_before": len(before),
                "files_after": len(before),
                "bytes": total,
            }
        n_files = max(1, -(-total // target_file_bytes))
        df = self.read()
        writer = df.repartition(n_files).write.mode("overwrite")
        if self.partition_by:
            # repartition by partition columns so each output file
            # lands whole in its partition directory
            df = self.read().repartition(n_files, *self.partition_by)
            writer = df.write.mode("overwrite").partitionBy(
                *self.partition_by
            )
        writer.parquet(staging)
        os.rename(self.path, backup)
        os.rename(staging, self.path)
        shutil.rmtree(backup, ignore_errors=True)
        after = parquet_files(self.path)
        return {
            "files_before": len(before),
            "files_after": len(after),
            "bytes": total,
        }
