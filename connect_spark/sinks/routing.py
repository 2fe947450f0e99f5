"""Output routing combinators (reference `broker`, `switch`,
`fallback`, `reject_errored` outputs — docs/modules/components/pages/
outputs/{broker,switch,fallback,reject_errored}.adoc:26).

Batch form: each writer is a `DataFrame -> None` callable (or a target
spec). Streaming form: wrap `route_batch` in `foreachBatch` — the same
combinators apply per micro-batch, which is exactly the reference's
transaction boundary (one batch == one delivery attempt).

Scale note: fan-out writes cache the routed frame once (or rely on the
shared scan under AQE) so N sinks don't mean N source scans.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_spark.errors import ERROR_COL, dead_letter_split

Writer = Callable[[DataFrame], None]


def broker_fanout(
    df: DataFrame, writers: Sequence[Writer], cache: bool = True
) -> None:
    """`broker` with the fan-out pattern: every writer gets every row.
    The frame is cached across writers to avoid recomputing the
    upstream plan per sink."""
    if cache:
        df = df.cache()
    try:
        for w in writers:
            w(df)
    finally:
        if cache:
            df.unpersist()


def switch_output(
    df: DataFrame,
    cases: Sequence[tuple[Column, Writer]],
    default: Writer | None = None,
    cache: bool = True,
) -> None:
    """`switch` output: content-based routing; first matching case
    wins; unmatched rows go to `default` (dropped if None — the
    reference's `strict_mode: false`)."""
    if cache:
        df = df.cache()
    try:
        remaining = None
        for cond, writer in cases:
            # NULL conditions must route like false (mirror the pipeline
            # switch processor): without coalesce, `remaining & ~cond`
            # is NULL for NULL-cond rows and every later filter —
            # including the default's — drops them from all sinks.
            cond = F.coalesce(cond, F.lit(False))
            writer(df.filter(cond if remaining is None else remaining & cond))
            neg = ~cond
            remaining = neg if remaining is None else remaining & neg
        if default is not None:
            default(df if remaining is None else df.filter(remaining))
    finally:
        if cache:
            df.unpersist()


def retry_write(
    df: DataFrame,
    writer: Writer,
    max_retries: int = 3,
    backoff: Callable[[int], float] | None = None,
    dlq: Writer | None = None,
    sleep: Callable[[float], None] | None = None,
) -> int:
    """`retry` output wrapper (retry.adoc:26): re-attempt the write
    with exponential backoff; after `max_retries` failures the batch
    goes to the DLQ writer (or the last error re-raises if none).

    Granularity note: the reference retries per message; a Spark sink's
    transaction unit is the (micro-)batch, so the batch IS the message
    here — same contract at the foreachBatch boundary. `backoff(i)`
    returns the sleep before attempt i (default 0.1 * 2^i, capped 30s);
    inject `sleep` to make tests instant. Returns the attempt count."""
    import time as _time

    backoff = backoff or (lambda i: min(0.1 * (2 ** i), 30.0))
    sleep = sleep or _time.sleep
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        if attempt:
            sleep(backoff(attempt - 1))
        try:
            writer(df)
            return attempt + 1
        except Exception as exc:  # noqa: BLE001 — retry semantics
            last = exc
    if dlq is not None:
        dlq(df)
        return max_retries + 1
    raise RuntimeError(f"retry: exhausted {max_retries} retries") from last


def fallback_write(df: DataFrame, writers: Sequence[Writer]) -> int:
    """`fallback`: try writers in order until one succeeds; returns the
    index that succeeded. (The reference falls back per message; batch
    granularity here matches the foreachBatch transaction unit.)"""
    last: Exception | None = None
    for i, w in enumerate(writers):
        try:
            w(df)
            return i
        except Exception as exc:  # noqa: BLE001 — fallback semantics
            last = exc
    raise RuntimeError("all fallback outputs failed") from last


def reject_errored_split(
    df: DataFrame, good: Writer, dlq: Writer | None = None
) -> None:
    """`reject_errored` + DLQ: healthy rows to the main sink, flagged
    rows (non-null _error) to the dead-letter writer."""
    healthy, dead = dead_letter_split(df)
    good(healthy.drop(ERROR_COL))
    if dlq is not None:
        dlq(dead)
