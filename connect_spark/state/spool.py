"""Disk spool buffer — the reference's `sqlite` buffer
(internal/impl/sql/buffer_sqlite.go:41-47: an at-least-once disk spool
that decouples input from output) re-expressed on parquet segments.

Semantics:
- `enqueue(df)` appends one immutable parquet segment per call (the
  write-side transaction: either the whole segment lands or none).
- `drain(writer)` delivers every pending segment to `writer` and marks
  it ACKED only after the writer returns — crash between delivery and
  ack ⇒ the segment re-delivers on the next drain. At-least-once,
  exactly the reference's contract ("messages … resistant to service
  restarts", buffer_sqlite.go).
- `vacuum()` removes acked segments.

Scale: a segment is a parquet directory, so the drain path is a plain
distributed read — no driver materialization; the ack ledger is a
per-segment marker file (rename-free, idempotent).
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class ParquetSpool:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _segments(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.path)
            if d.startswith("seg-")
            and os.path.isdir(os.path.join(self.path, d))
        )

    def _is_acked(self, seg: str) -> bool:
        return os.path.exists(os.path.join(self.path, seg + ".acked"))

    def enqueue(self, df: DataFrame) -> str:
        """Append one segment; returns its name. The `_SUCCESS` marker
        parquet writes is the commit point — a torn write never lists
        as a segment for drain (we require it below)."""
        seg = f"seg-{time.time_ns():020d}"
        df.write.parquet(os.path.join(self.path, seg))
        return seg

    def pending(self) -> list[str]:
        return [
            s
            for s in self._segments()
            if not self._is_acked(s)
            and os.path.exists(os.path.join(self.path, s, "_SUCCESS"))
        ]

    def read_pending(self) -> DataFrame | None:
        segs = self.pending()
        if not segs:
            return None
        return self.spark.read.parquet(
            *[os.path.join(self.path, s) for s in segs]
        )

    def drain(self, writer: Callable[[DataFrame], None]) -> int:
        """Deliver pending segments in enqueue order; ack each AFTER
        its writer call returns. Returns segments delivered. A writer
        failure stops the drain with earlier segments acked and the
        failed one still pending — re-delivered next drain
        (at-least-once)."""
        delivered = 0
        for seg in self.pending():
            df = self.spark.read.parquet(os.path.join(self.path, seg))
            writer(df)
            open(os.path.join(self.path, seg + ".acked"), "w").close()
            delivered += 1
        return delivered

    def vacuum(self) -> int:
        """Remove acked segments + markers; returns segments removed."""
        removed = 0
        for seg in self._segments():
            if self._is_acked(seg):
                shutil.rmtree(
                    os.path.join(self.path, seg), ignore_errors=True
                )
                os.remove(os.path.join(self.path, seg + ".acked"))
                removed += 1
        return removed
