"""`system_window` buffer → Structured Streaming windows.

Reference semantics (docs/modules/components/pages/buffers/
system_window.adoc): tumbling by default, `slide` for sliding (:41-47),
`allowed_lateness` holds the flush for stragglers (:59-65), window
bounds stamped onto the output (:130-214).

Spark mapping is exact: `withWatermark(ts, allowed_lateness)` +
`groupBy(window(ts, size, slide))`. Where the reference *drops* late/
overflow windows under backpressure (:55-57), Spark instead spills
state and emits when the watermark passes — strictly better delivery
at the cost of state-store size, which is bounded by
(keys × size/slide windows) in flight; at 100 TB scale use RocksDB
state store + watermark to cap it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def system_window_stream(
    df: DataFrame,
    ts: str,
    size: str | None = None,
    slide: str | None = None,
    session_gap: str | None = None,
    allowed_lateness: str = "0 seconds",
    keys: list[Column] | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Windowed streaming aggregation with event-time watermarking.

    `size` (+ optional `slide`) → tumbling/sliding; `session_gap` →
    session windows (beyond the reference surface, SURVEY.md §4.2).
    Works on batch DataFrames too (watermark is a no-op there) — the
    same duality the reference's serverless mode proves (SURVEY.md
    §3.2)."""
    if df.isStreaming:
        df = df.withWatermark(ts, allowed_lateness)
    if session_gap is not None:
        win = F.session_window(ts, session_gap)
    elif slide:
        win = F.window(ts, size, slide)
    else:
        win = F.window(ts, size)
    aggs = aggs or {"count": F.count(F.lit(1))}
    out = df.groupBy(win.alias("window"), *(keys or [])).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.withColumns(
        {
            "window_start": F.col("window.start"),
            # the reference stamps window_end_timestamp metadata
            # (system_window.adoc:130-214)
            "window_end_timestamp": F.col("window.end"),
        }
    ).drop("window")
