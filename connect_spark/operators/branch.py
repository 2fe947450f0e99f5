"""`branch` and `workflow` processors (SURVEY.md §2.A).

Reference semantics:
- `branch` (docs/.../processors/branch.adoc:26): `request_map` projects
  a request doc, child processors transform it, `result_map` merges the
  result back into the original message.
- `workflow` (docs/.../processors/workflow.adoc:26,37-43,64-70): a DAG
  of branches executed in dependency order, parallel where possible.

Spark-first: a branch whose children are column transforms is simply a
set of derived-column expressions; a workflow is a topologically-sorted
sequence of `withColumns` calls. The reference's explicit DAG scheduler
disappears — Catalyst already evaluates independent column expressions
in one projection, and chained projections collapse into one
WholeStageCodegen stage, so "parallel where possible" is the default.
For branches that change cardinality (aggregate children), the
join-back variant keeps the original rows and merges by key.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from graphlib import TopologicalSorter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def branch(
    df: DataFrame,
    result_map: dict[str, Column],
) -> DataFrame:
    """Column-transform branch: derived columns merged into the
    original message (request_map/processors folded into the exprs)."""
    return df.withColumns(dict(result_map))


def branch_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    agg_fn: Callable[[DataFrame], DataFrame],
    how: str = "left",
    broadcast_result: bool = False,
) -> DataFrame:
    """Cardinality-changing branch: run an aggregating sub-pipeline on
    a projected copy and join the result back by key — the enrichment
    shape of branch+cache (joining_streams.yaml:23-60). The aggregate
    has one row per key group, which usually scales with the data, so
    the join strategy is left to AQE unless the caller KNOWS the
    result is O(1)-bounded and opts in to ``broadcast_result``."""
    result = agg_fn(df)
    if broadcast_result:
        result = F.broadcast(result)
    return df.join(result, on=list(keys), how=how)


def workflow(
    df: DataFrame,
    branches: dict[str, dict[str, Column]],
    dependencies: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """`workflow`: named branches applied in dependency order
    (workflow.adoc:37-43 explicit `order`, :64-70 inferred DAG).

    `branches`: name → {column: expr}; `dependencies`: name → upstream
    branch names. Independent branches end up in the same projection.
    """
    deps = dependencies or {}
    ts = TopologicalSorter({name: tuple(deps.get(name, ())) for name in branches})
    out = df
    for name in ts.static_order():
        out = out.withColumns(dict(branches[name]))
    return out
