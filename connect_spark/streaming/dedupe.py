"""Streaming dedupe — the reference's `dedupe` + cache pattern
(docs/modules/components/pages/processors/dedupe.adoc:26,53-78) where
the cache TTL bounds memory.

Spark mapping: `dropDuplicatesWithinWatermark` — the watermark horizon
IS the cache TTL, and the state store replaces the external cache. At
100 TB-scale streams the state is hash-partitioned by key across
executors; skew in the dedupe key behaves like any shuffle skew (AQE
does not apply to streaming state — choose a high-cardinality key or
salt upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedupe(
    df: DataFrame,
    keys: list[str],
    ts: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Keep the first row per key.

    With `ts` + `within` (streaming): duplicates arriving inside the
    watermark horizon are dropped, state expires after `within` — the
    `cache` TTL semantic. Without: exact global dedupe (batch)."""
    if df.isStreaming and ts is not None and within is not None:
        return df.withWatermark(ts, within).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
