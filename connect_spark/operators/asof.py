"""As-of join — a custom operator the reference lacks entirely
(SURVEY.md §2.B: "no theta/range/as-of joins exist in the reference")
and Spark lacks natively; built as a composition of existing DataFrame
ops (the brief's option (a)), no UDF.

Algorithm (union + windowed last-fill):
1. Tag right rows side=0, left rows side=1; union on the join keys +
   event time, carrying right payload columns (null on left rows).
2. One window per key ordered by (ts, side, tie-break):
   `last(payload, ignorenulls=True)` fills each left row with the most
   recent right row at-or-before its timestamp.
3. Keep side=1 rows.

Cost: ONE shuffle (the window partition by key) over left+right —
same as a regular sort-merge join, with no range-explosion. This is
the canonical scalable as-of: at 100 TB both sides hash-partition by
key once and sort locally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts on the same key (backward as-of). Right payload
    columns appear suffixed. `tolerance_seconds` nulls matches older
    than the horizon (pandas merge_asof semantics)."""
    keys = list(on)
    lcols = left.columns
    # The whole right row travels as ONE struct so every payload value
    # in the output comes from the SAME (most recent) right row — per-
    # column last(ignorenulls) would stitch columns from different
    # right rows when the latest one holds a NULL payload value.
    payload_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in keys and c != left_ts],
        F.col(left_ts),
        F.lit(None).cast(
            right.select(payload_struct.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys and c != left_ts],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        payload_struct.alias("_p"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_p", F.last("_p", ignorenulls=True).over(w))
    out = (
        filled.filter(F.col("_side") == 1)
        .withColumns(
            {f"{c}{suffix}": F.col("_p")[c] for c in right_payload}
            | {f"_rts{suffix}": F.col("_p")["_rts"]}
        )
        .drop("_ts", "_side", "_p")
    )
    if tolerance_seconds is not None:
        horizon = F.col(left_ts).cast("long") - F.col(
            f"_rts{suffix}"
        ).cast("long") <= tolerance_seconds
        out = out.withColumns(
            {
                f"{c}{suffix}": F.when(horizon, F.col(f"{c}{suffix}"))
                for c in right_payload
            }
            | {f"_rts{suffix}": F.when(horizon, F.col(f"_rts{suffix}"))}
        )
    return out
