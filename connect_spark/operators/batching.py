"""Batching policy: ``count`` / ``byte_size`` / ``period`` / ``check``.

Reference semantics (`docs/modules/components/pages/inputs/batched.adoc:110-162`,
shared by every input/output `batching` block): messages are appended to
an open batch in arrival order and the batch is flushed when, after an
append, (a) the message count reaches ``count``, (b) the accumulated
byte size reaches ``byte_size``, or (c) the just-appended message
satisfies the Bloblang ``check`` predicate (that message ENDS its
batch, inclusively); independently, ``period`` flushes an incomplete
batch on a timer.

Spark mapping. "Arrival order" only exists per source partition, so
batch assignment is windowed by the caller's ``partition_by`` keys (at
100 TB that is the Kafka-partition / file-split key — batching never
needs a global order, so no global sort ever happens). Within a
partition group:

- ``check``-closing is a classic segment boundary: the segment id of a
  row is the count of check-true rows STRICTLY BEFORE it.
- ``period`` in replayable/batch context maps to event-time buckets
  (a batch never spans two buckets); in streaming context the same
  policy's wall-clock flush is the micro-batch trigger interval
  (``processingTime``), which Spark owns.
- ``count`` resets at every flush, and between two flush boundaries the
  only closer left is count itself — so within a (check-segment,
  period-bucket) pair batches are exact ``floor(i / count)`` blocks.
  Hence everything except ``byte_size`` is PURE Column algebra: one
  shuffle on ``partition_by``, three window passes over the same
  exchange, whole-stage codegen throughout.
- ``byte_size`` is greedy sequential packing (running sum with reset),
  which no window expression computes; that path drops to ONE
  Arrow-batched ``applyInPandas`` over the same partition keys — the
  same shuffle, with the loop vectorized per group.

The flushed batch's ``processors`` field is compositional here: after
``assign_batches`` the batch is a group key, so ``archive`` /
``groupBy(batch_id)`` IS the post-batch processor chain.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SECONDS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_period(period: str) -> float:
    """``1s`` / ``500ms`` / ``1m`` / ``2h`` → seconds (batched.adoc:134-146)."""
    p = period.strip()
    for suffix in ("ms", "s", "m", "h"):
        if p.endswith(suffix):
            return float(p[: -len(suffix)]) * _SECONDS[suffix]
    raise ValueError(f"unparseable period {period!r}")


@dataclass(frozen=True)
class BatchPolicy:
    """batched.adoc:110-162. Zero / None disables a trigger."""

    count: int = 0
    byte_size: int = 0
    period: str | None = None
    check: Column | None = None  # boolean: true ⇒ row ends its batch
    size: Column | None = None  # per-row byte size (required w/ byte_size)

    def __post_init__(self) -> None:
        if self.byte_size and self.size is None:
            raise ValueError("byte_size batching needs a `size` column")
        if not (self.count or self.byte_size or self.period or self.check is not None):
            raise ValueError("batch policy has no trigger configured")


def assign_batches(
    df: DataFrame,
    policy: BatchPolicy,
    *,
    order_by: list[str | Column],
    partition_by: list[str] | None = None,
    ts: str | Column | None = None,
    out: str = "batch_id",
) -> DataFrame:
    """Append a 0-based ``out`` column numbering batches within each
    ``partition_by`` group, in ``order_by`` order, per ``policy``."""
    parts = list(partition_by or [])
    if policy.period and ts is None:
        raise ValueError("period batching needs a `ts` column")
    if policy.byte_size:
        return _assign_greedy(df, policy, order_by, parts, ts, out)
    return _assign_pure(df, policy, order_by, parts, ts, out)


def _bucket(ts: str | Column, period: str) -> Column:
    sec = parse_period(period)
    tcol = F.col(ts) if isinstance(ts, str) else ts
    return F.floor(F.unix_micros(tcol.cast("timestamp")) / int(sec * 1_000_000))


def _assign_pure(
    df: DataFrame,
    policy: BatchPolicy,
    order_by: list[str | Column],
    parts: list[str],
    ts: str | Column | None,
    out: str,
) -> DataFrame:
    w = Window.partitionBy(*parts).orderBy(*order_by)
    seg_cols: list[Column] = []
    if policy.check is not None:
        # count of batch-ending rows strictly before this one
        prior = w.rowsBetween(Window.unboundedPreceding, -1)
        seg_cols.append(
            F.coalesce(
                F.sum(policy.check.cast("long")).over(prior), F.lit(0)
            ).alias("_bp_seg")
        )
    if policy.period:
        seg_cols.append(_bucket(ts, policy.period).alias("_bp_bucket"))
    if not seg_cols:
        seg_cols = [F.lit(0).alias("_bp_seg")]
    work = df.select("*", *seg_cols)
    seg_names = [n for n in ("_bp_seg", "_bp_bucket") if n in work.columns]
    if policy.count:
        w_seg = Window.partitionBy(*parts, *seg_names).orderBy(*order_by)
        work = work.withColumn(
            "_bp_sub",
            F.floor((F.row_number().over(w_seg) - F.lit(1)) / policy.count),
        )
    else:
        work = work.withColumn("_bp_sub", F.lit(0))
    w_rank = Window.partitionBy(*parts).orderBy(*seg_names, "_bp_sub")
    return work.withColumn(
        out, (F.dense_rank().over(w_rank) - F.lit(1)).cast("long")
    ).drop(*seg_names, "_bp_sub")


def _assign_greedy(
    df: DataFrame,
    policy: BatchPolicy,
    order_by: list[str | Column],
    parts: list[str],
    ts: str | Column | None,
    out: str,
) -> DataFrame:
    """byte_size path: greedy running-sum packing per group (one
    applyInPandas over the partition keys — same single shuffle)."""
    work = df.withColumn("_bp_size", policy.size.cast("long"))
    if policy.check is not None:
        work = work.withColumn("_bp_check", policy.check.cast("boolean"))
    if policy.period:
        work = work.withColumn("_bp_bucket", _bucket(ts, policy.period))
    if not all(isinstance(c, str) for c in order_by):
        raise ValueError("byte_size batching needs string order_by columns")
    order_names = list(order_by)
    count, byte_size = policy.count, policy.byte_size
    has_check, has_period = policy.check is not None, bool(policy.period)

    group_cols = list(parts)
    if not group_cols:
        work = work.withColumn("_bp_grp", F.lit(0))
        group_cols = ["_bp_grp"]

    schema = T.StructType(
        [f for f in work.schema.fields]
        + [T.StructField(out, T.LongType(), False)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(
            drop=True
        )
        ids = []
        bid, n, acc, bucket = 0, 0, 0, None
        sizes = pdf["_bp_size"].tolist()
        checks = pdf["_bp_check"].tolist() if has_check else None
        buckets = pdf["_bp_bucket"].tolist() if has_period else None
        for i in range(len(pdf)):
            if has_period:
                if bucket is not None and buckets[i] != bucket and n:
                    bid, n, acc = bid + 1, 0, 0
                bucket = buckets[i]
            n += 1
            sz = sizes[i]
            # null sizes arrive as None or NaN (pandas float64)
            acc += 0 if sz is None or sz != sz else int(sz)
            ids.append(bid)
            if (
                (count and n >= count)
                or (byte_size and acc >= byte_size)
                or (has_check and bool(checks[i]))
            ):
                bid, n, acc = bid + 1, 0, 0
        pdf[out] = pd.Series(ids, dtype="int64")
        return pdf

    # Pin the grouping exchange to the configured shuffle width: the
    # packing state machine's cost is Python CPU per row, invisible to
    # AQE, which coalesces this shuffle by its (tiny) byte size —
    # measured at sf0.1 the whole stage collapsed onto 1-2 tasks
    # (5.1s -> 1.5s with the pin).  An explicit numPartitions
    # repartition on the group key is exactly the pre-AQE plan (the
    # groupBy reuses the partitioning, no extra exchange) and
    # spark.sql.shuffle.partitions stays the deployment-sized knob.
    n_shuffle = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    res = (work.repartition(n_shuffle, *group_cols)
           .groupBy(*group_cols).applyInPandas(pack, schema))
    drop = ["_bp_size"]
    if "_bp_grp" in res.columns:
        drop.append("_bp_grp")
    if has_check:
        drop.append("_bp_check")
    if has_period:
        drop.append("_bp_bucket")
    return res.drop(*drop)
