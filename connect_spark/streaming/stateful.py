"""Custom stateful streaming operator — the reference's running
cache-counter pattern (SURVEY.md §2.C: `cache` counters / Redis
incrby → "stateful streaming agg (state store), mapGroupsWithState").

`running_totals` keeps per-key state (count + sum) across micro-
batches with `applyInPandasWithState`: the Spark state store replaces
the reference's external cache, checkpointing replaces cache
persistence, and a processing-time timeout (optional) replaces TTL.

Scale: state is hash-partitioned by key across executors; each
micro-batch touches only the keys present in it. This is the (b)
escape hatch of the custom-operator policy — the semantics (emit a
running value per key per batch) are not expressible as a windowed
aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG, total DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    count, total = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "batch_rows": [batch_rows],
            "running_count": [count],
            "running_total": [round(total, 2)],
        }
    )


def running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running count+sum emitted every micro-batch (the
    `cache` incrby counter). Input: any streaming frame; output: one
    row per key per batch with the updated running values."""
    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
