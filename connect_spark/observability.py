"""Observability: the reference's `log`/`metric`/`benchmark`
processors (docs/.../processors/{log,metric,benchmark}.adoc:26; used in
docs/benchmark-results/redpanda-migrator.md:33-35 to measure msg/s and
bytes/s) mapped onto Spark's native instrumentation.

- Batch: `Benchmark` wraps an action and reports rows/sec (the rolling
  msg/sec stat of the benchmark processor, minus the rolling window —
  batch jobs have a start and an end).
- Streaming: `StreamingMetrics` is a StreamingQueryListener capturing
  per-batch numInputRows / processedRowsPerSecond — the same numbers
  the reference's metric child emits, sourced from
  StreamingQueryProgress instead of hand-counting.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BenchmarkResult:
    rows: int
    seconds: float

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else float("inf")


class Benchmark:
    """`benchmark` processor for batch plans: measure an action.

    >>> with Benchmark() as b:
    ...     n = df.count()
    ...     b.rows = n
    >>> b.result.rows_per_sec
    """

    def __init__(self) -> None:
        self.rows = 0
        self.result: BenchmarkResult | None = None

    def __enter__(self) -> "Benchmark":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.result = BenchmarkResult(
            self.rows, time.perf_counter() - self._t0
        )


@dataclass
class StreamingMetrics(StreamingQueryListener):
    """Collects per-micro-batch progress for assertions/reporting."""

    batches: list[dict] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "processedRowsPerSecond": p.processedRowsPerSecond,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(b["numInputRows"] for b in self.batches)

    def attach(self, spark: SparkSession) -> "StreamingMetrics":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
