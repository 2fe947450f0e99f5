"""Range join (time-proximity join) — like the as-of join, absent in
the reference (SURVEY.md §2.B: equi-join only) and expensive if done
naively in Spark (inequality-only joins degenerate to
BroadcastNestedLoop).

Scalable construction: bucket both sides by `floor(ts / width)` and
equi-join on (key, bucket) for the band of adjacent buckets each row
can reach, then filter the exact predicate. Cost: rows replicate into
≤ ceil(range/width)+1 buckets — a constant — and the join is a plain
hash equi-join on (key, bucket); no nested loop, no cross join, AQE
handles skewed buckets. This is the standard interval-bucketing
scheme used by Databricks' range-join optimization and friends.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    direction: str = "forward",
) -> DataFrame:
    """Pairs (l, r) with the same key where r's timestamp falls within
    `max_gap_seconds` after (direction='forward') l's — e.g. "view
    followed by purchase within 5 minutes". Columns from both sides
    survive (right's ts column must be named differently or be
    renamed by the caller)."""
    if direction != "forward":
        raise ValueError("only forward supported (flip sides otherwise)")
    width = max_gap_seconds  # bucket width == range → band of 2 buckets
    lb = F.floor(F.col(left_ts).cast("long") / width)
    rb = F.floor(F.col(right_ts).cast("long") / width)
    l = left.withColumn("_bucket", lb)
    # right rows land in their own bucket and the previous one, so a
    # left row only ever probes ONE bucket value
    r = right.withColumn(
        "_bucket", F.explode(F.array(rb, rb - 1))
    )
    joined = l.join(r, on=on + ["_bucket"], how="inner").drop("_bucket")
    gap = F.col(right_ts).cast("long") - F.col(left_ts).cast("long")
    # no dedup needed: the left row carries exactly one bucket value and
    # the right row's two exploded buckets are distinct, so each (l, r)
    # pair joins at most once
    return joined.filter((gap > 0) & (gap <= max_gap_seconds))
