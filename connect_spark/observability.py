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


# --------------------------------------------------------------------
# metric processor (metric.adoc:26) via Spark's Observation API
# --------------------------------------------------------------------

_OBSERVATIONS: dict[str, object] = {}


def metric_observe(df, name: str, mtype: str, value=None):
    """`metric` processor: emit a custom metric from message values
    (metric.adoc types counter / counter_by / gauge / timing).

    Spark-first mapping: `df.observe(Observation, agg...)` — the
    metric is computed JVM-side during the SAME action that processes
    the data (zero extra pass, zero Python), exactly how the
    reference's metric child rides the pipeline. Read the value after
    an action with `get_metric(name)`.

    counter    → count of messages seen
    counter_by → sum of the evaluated value
    gauge      → last evaluated value (max here: deterministic in a
                 set-based plan, matching the reference's use of gauge
                 for high-watermarks)
    timing     → avg of the evaluated value
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if mtype == "counter":
        agg = F.count(F.lit(1)).alias(name)
    elif mtype == "counter_by":
        agg = F.sum(value).alias(name)
    elif mtype == "gauge":
        agg = F.max(value).alias(name)
    elif mtype == "timing":
        agg = F.avg(value).alias(name)
    else:
        raise ValueError(
            f"metric type must be counter|counter_by|gauge|timing, got {mtype!r}"
        )
    obs = Observation()
    _OBSERVATIONS[name] = obs
    return df.observe(obs, agg)


def get_metric(name: str):
    """Value of an observed metric; blocks until the observing action
    completes. KeyError if no metric of that name was registered."""
    obs = _OBSERVATIONS[name]
    return obs.get[name]


def clear_metrics() -> None:
    _OBSERVATIONS.clear()


# --------------------------------------------------------------------
# metrics exporters (reference `metrics:` adapters —
# docs/modules/components/pages/metrics/{prometheus,json_api,logger}.adoc)
# --------------------------------------------------------------------


def _metric_snapshot() -> dict[str, float]:
    """Resolved values of every observed metric, NON-blocking: a
    metric whose observing action has not run yet is simply absent
    from the scrape (Observation.get would block on the JVM forever,
    hanging the /metrics handler)."""
    out: dict[str, float] = {}
    for name, obs in _OBSERVATIONS.items():
        try:
            jopt = obs._jo.getOrEmpty()
            it = jopt.iterator()
            while it.hasNext():
                e = it.next()
                if e._1() == name:
                    out[name] = float(e._2())
        except Exception:  # noqa: BLE001 — jvm conversion quirk
            continue
    return out


def prometheus_exposition(prefix: str = "connect_spark") -> str:
    """`metrics: prometheus` — the text exposition format
    (prometheus.adoc:26): HELP/TYPE headers + one sample per metric.
    Serve via `serve_metrics` or push through any gateway."""
    lines: list[str] = []
    for name, value in sorted(_metric_snapshot().items()):
        mname = f"{prefix}_{name}".replace("-", "_").replace(".", "_")
        lines.append(f"# TYPE {mname} gauge")
        lines.append(f"{mname} {value}")
    return "\n".join(lines) + ("\n" if lines else "")


def json_api_stats() -> dict:
    """`metrics: json_api` — the `/stats` JSON object (json_api.adoc:25)."""
    return {"metrics": _metric_snapshot()}


def logger_lines(level: str = "INFO") -> list[str]:
    """`metrics: logger` — flush metrics as log lines (logger.adoc)."""
    return [
        f"{level} metric {name}={value}"
        for name, value in sorted(_metric_snapshot().items())
    ]


def serve_metrics(port: int = 0):
    """Serve `/metrics` (prometheus exposition) and `/stats` (json_api)
    on a local HTTP endpoint — the reference's service-wide metrics
    endpoints (json_api.adoc:25). Returns (server, port); call
    `server.shutdown()` when done."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib API
            if self.path == "/metrics":
                body = prometheus_exposition().encode()
                ctype = "text/plain; version=0.0.4"
            elif self.path in ("/stats", "/metrics.json"):
                body = _json.dumps(json_api_stats()).encode()
                ctype = "application/json"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]
