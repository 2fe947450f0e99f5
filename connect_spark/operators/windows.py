"""``system_window`` buffer semantics (SURVEY.md §2.C) on DataFrames.

Reference: docs/modules/components/pages/buffers/system_window.adoc —
tumbling (default) or sliding (``slide``) event-time windows
(:41-47), epoch-aligned with ``offset`` (:49-57), ``allowed_lateness``
(:59-65), window-end stamped as metadata (:130-214).

Spark's ``window()`` expression is an exact semantic match, and it is a
*narrow* operation: each row maps to its window(s) before the single
groupBy shuffle. Sliding windows replicate each row size/slide times —
same cost model as the reference, but distributed. The streaming
variants (connect_spark.streaming.window) add ``withWatermark`` for
allowed_lateness; these batch forms share the same aggregation bodies so
batch and stream stay in lockstep (the reference's serverless mode
proves the same duality, SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _project_window(df: DataFrame) -> DataFrame:
    """Flatten the window struct to sortable/comparable columns; the
    window end is the reference's ``window_end_timestamp`` metadata
    (system_window.adoc:130-214)."""
    return df.withColumns(
        {
            "window_start": F.col("window.start"),
            "window_end": F.col("window.end"),
        }
    ).drop("window")


def tumbling_window_agg(
    df: DataFrame,
    ts: Column,
    size: str,
    keys: list[Column] | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window (system_window.adoc:41-47)."""
    group = [F.window(ts, size)] + (keys or [])
    aggs = aggs or {"count": F.count(F.lit(1))}
    out = df.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()])
    return _project_window(out)


def sliding_window_agg(
    df: DataFrame,
    ts: Column,
    size: str,
    slide: str,
    keys: list[Column] | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Sliding window (``slide`` field, system_window.adoc:41-47): each
    row contributes to size/slide overlapping windows."""
    group = [F.window(ts, size, slide)] + (keys or [])
    aggs = aggs or {"count": F.count(F.lit(1))}
    out = df.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()])
    return _project_window(out)
