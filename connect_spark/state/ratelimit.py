"""``rate_limit`` resources (local token window) + pipeline throttle.

Reference surface: `docs/modules/components/pages/rate_limits/local.adoc`
("a simple X every Y type rate limit ... shared across any number of
components within the pipeline but does not support distributed rate
limits across multiple running instances") and
`docs/.../processors/rate_limit.adoc` (throttle a pipeline by a named
rate_limit resource). The redis backend is a live-service gap, same as
the caches.

Semantics copied from the local backend: a window of ``interval``
admits at most ``count`` acquisitions; an acquisition past the budget
reports the time until the window resets (the benthos ``Access()``
contract), and the throttling caller sleeps that long and retries.

Spark mapping. Throughput throttling is per *consumer instance*; the
reference explicitly scopes the limit to one running instance, so the
honest distributed equivalent is a PER-EXECUTOR-PROCESS bucket (each
Python worker = one instance). The ``rate_limit`` processor therefore
runs as a mapInPandas pass whose worker-side bucket is lazily created
from the broadcast (count, interval) config — batches flow through
unchanged, delayed as needed; nothing is collected, the plan stays
narrow. Driver-side components (http_poll, the streaming trigger
cadence) call the SAME resource object directly.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Any, Iterator

from connect_spark.operators.batching import parse_period


@dataclass
class LocalRateLimit:
    """rate_limits/local.adoc: at most ``count`` acquisitions per
    ``interval`` window."""

    count: int = 1000
    interval: str = "1s"

    def __post_init__(self) -> None:
        if self.count <= 0:
            raise ValueError("rate limit count must be positive")
        self._period = parse_period(self.interval)
        self._lock = threading.Lock()
        self._window_start = time.monotonic()
        self._used = 0

    def access(self, n: int = 1) -> float:
        """Try to acquire ``n`` tokens. Returns 0.0 on success, else
        the seconds until the current window resets (Access contract:
        the caller sleeps and retries)."""
        with self._lock:
            now = time.monotonic()
            elapsed = now - self._window_start
            if elapsed >= self._period:
                self._window_start = now
                self._used = 0
                elapsed = 0.0
            if self._used + n <= self.count:
                self._used += n
                return 0.0
            return self._period - elapsed

    def wait(self, n: int = 1) -> float:
        """Block until ``n`` tokens are granted; returns total time
        slept. Requests larger than a whole window are granted in
        window-sized installments (matching the reference, where a
        batch acquires per message)."""
        slept = 0.0
        remaining = n
        while remaining > 0:
            chunk = min(remaining, self.count)
            delay = self.access(chunk)
            if delay <= 0.0:
                remaining -= chunk
                continue
            time.sleep(delay)
            slept += delay
        return slept


_RESOURCES: dict[str, LocalRateLimit] = {}
_LOCK = threading.Lock()


def register_rate_limit(label: str, conf: dict[str, Any]) -> LocalRateLimit:
    """Register a labeled resource (config block ``rate_limit_resources:
    [{label, local: {count, interval}}]``). The ``redis`` kind
    (rate_limits/redis.adoc) shares the same count/interval window
    semantics; without a live Redis its scope is per-instance like
    `local` (the distributed-counter client swaps in on a cluster), so
    its config maps onto the local window after validating `url`."""
    if "redis" in conf:
        c = conf["redis"] or {}
        if not c.get("url"):
            raise ValueError(
                f"rate limit {label!r}: redis kind requires `url` "
                "(rate_limits/redis.adoc)"
            )
        c = {"count": c.get("count", 1000),
             "interval": c.get("interval", "1s")}
    elif "local" not in conf:
        raise ValueError(
            f"rate limit {label!r}: unknown backend "
            f"{sorted(set(conf) - {'label'})!r}; known: local, redis"
        )
    else:
        c = conf["local"] or {}
    rl = LocalRateLimit(
        count=int(c.get("count", 1000)), interval=c.get("interval", "1s")
    )
    with _LOCK:
        _RESOURCES[label] = rl
    return rl


def get_rate_limit(label: str) -> LocalRateLimit:
    with _LOCK:
        try:
            return _RESOURCES[label]
        except KeyError:
            raise KeyError(f"unknown rate_limit resource {label!r}") from None


def clear_rate_limits() -> None:
    with _LOCK:
        _RESOURCES.clear()


# executor-side buckets, one per (label) per worker process — each
# Python worker is one "running instance" in the reference's scoping
_WORKER_BUCKETS: dict[str, LocalRateLimit] = {}


def throttle(df, count: int, interval: str, label: str = "_anon"):
    """The ``rate_limit`` processor: pass batches through unchanged,
    delaying so each worker process stays under count/interval."""
    schema = df.schema

    def run(batches: Iterator) -> Iterator:
        # key by the full config, not just the label: a re-registered
        # resource (new count/interval) must not reuse a long-lived
        # worker's stale bucket, and two anonymous throttles with
        # different rates must not share one
        bkey = f"{label}:{count}:{interval}"
        bucket = _WORKER_BUCKETS.get(bkey)
        if bucket is None:
            bucket = _WORKER_BUCKETS.setdefault(
                bkey, LocalRateLimit(count=count, interval=interval)
            )
        for pdf in batches:
            bucket.wait(len(pdf))
            yield pdf

    return df.mapInPandas(run, schema)
