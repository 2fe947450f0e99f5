"""Join mechanisms (SURVEY.md §2.B) — all four the reference has.

- ``sequence`` input ``sharded_join`` — docs/modules/components/pages/
  inputs/sequence.adoc:199-247. The reference shards a full-outer join
  over N passes to bound memory in one process; on Spark the shuffle
  already shards by key across executors, so the knob disappears and
  Catalyst/AQE picks broadcast vs sort-merge.
- ``branch`` + ``cache`` hydration join — config/examples/
  joining_streams.yaml:23-60 → stream-static / lookup join.
- ``sql_select``-style enrichment — internal/impl/sql/
  processor_sql_select.go:32-67 → set-based join against the external
  table instead of a per-message SELECT.
- Semi/anti emerge from dedupe-vs-cache + filters (§2.B note).

Scale notes: small dimension sides are explicitly ``broadcast()`` so the
fact table never shuffles for them; big-big joins shuffle once on the
key with AQE skew splitting enabled (session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sharded_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "full_outer",
    collect: dict[str, Column] | None = None,
    sort_arrays: bool = True,
) -> DataFrame:
    """Full-outer merge join with ``merge_strategy: array``
    (sequence.adoc:199-247): many right rows per key collapse into an
    array column. We pre-aggregate the many-side *before* the join so
    the join itself is 1:1 — one shuffle for the groupBy, and the join
    reuses the same hash partitioning (Catalyst sees the co-partitioned
    exchange and elides the second shuffle).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if collect:
        aggs = []
        for name, col in collect.items():
            arr = F.collect_list(col)
            if sort_arrays:
                arr = F.sort_array(arr)
            aggs.append(arr.alias(name))
        right = right.groupBy(*keys).agg(*aggs)
    return left.join(right, on=keys, how=how)


def enrichment_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """``sql_select`` / cache-hydration enrichment
    (processor_sql_select.go:32-67; joining_streams.yaml:23-60): instead
    of one SELECT per message, join the whole external table set-based.
    Dimension sides are broadcast by default — at 100 TB the fact side
    must never shuffle just to pick up a few MB of lookup data."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """EXISTS — the dedupe-vs-cache positive case."""
    return left.join(right, on=on, how="left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """NOT EXISTS — ``dedupe`` against a cache of already-seen keys
    (dedupe.adoc:53-78)."""
    return left.join(right, on=on, how="left_anti")
