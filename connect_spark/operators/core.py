"""Core processors re-expressed as DataFrame transforms.

Reference semantics (cites are paths under /root/reference/):

- ``mapping`` — docs/modules/components/pages/processors/mapping.adoc:26
- ``mutation`` — docs/.../processors/mutation.adoc:26
- ``switch`` — docs/.../processors/switch.adoc:26,38-73
- ``group_by`` / ``group_by_value`` — docs/.../processors/group_by.adoc:26,
  group_by_value.adoc:26
- ``dedupe`` — docs/.../processors/dedupe.adoc:26,53-78
- ``select_parts`` — docs/.../processors/select_parts.adoc:26
- ``archive`` / ``unarchive`` — docs/.../processors/archive.adoc:26,46-58,
  unarchive.adoc:26
- ``bounds_check`` — docs/.../processors/bounds_check.adoc:26

Everything here is pure Column algebra: Catalyst sees one logical plan,
so projections collapse, filters push down to the parquet scan, and all
of it stays inside whole-stage codegen. At 100 TB the only shuffles are
the ones the semantics require (dedupe and archive group by key; the
rest are narrow).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mapping(df: DataFrame, **exprs: Column) -> DataFrame:
    """``mapping`` processor: produce a *new* document from the old one.

    The reference's Bloblang map builds a fresh object (mapping.adoc:26);
    the Spark equivalent is a plain projection — only the named columns
    survive, which also hands Catalyst maximal column pruning.
    """
    return df.select(*[c.alias(name) for name, c in exprs.items()])


def mutation(df: DataFrame, **exprs: Column) -> DataFrame:
    """``mutation`` processor: in-place assignment, keeps other columns
    (mutation.adoc:26)."""
    return df.withColumns(dict(exprs))


def switch(
    df: DataFrame,
    cases: Sequence[tuple[Column, dict[str, Column]]],
    default: dict[str, Column] | None = None,
) -> DataFrame:
    """``switch`` processor: first matching ``check`` wins (switch.adoc:38-73).

    Each case is ``(predicate, {col: expr})``. Instead of splitting the
    batch per case and re-unioning (the reference routes each message to
    a processor list), we compile one ``when/otherwise`` chain per
    assigned column — a single narrow projection, no shuffle, no union
    explosion at scale.
    """
    assigned: set[str] = set()
    for _, m in cases:
        assigned.update(m)
    if default:
        assigned.update(default)
    out = {}
    for name in assigned:
        expr: Column | None = None
        for pred, m in cases:
            val = m.get(name, F.col(name) if name in df.columns else F.lit(None))
            expr = F.when(pred, val) if expr is None else expr.when(pred, val)
        if expr is None:
            expr = F.lit(None)
        fallback = (
            default.get(name)
            if default and name in default
            else (F.col(name) if name in df.columns else F.lit(None))
        )
        out[name] = expr.otherwise(fallback)
    return df.withColumns(out)


def group_by_value(
    df: DataFrame, key: Column, aggs: dict[str, Column]
) -> DataFrame:
    """``group_by_value``: dynamic grouping key → one reduced row per
    group (group_by_value.adoc:26 + the batch-reduce pattern in
    buffers/system_window.adoc:108-123). Map-side partial aggregation
    makes this one shuffle of pre-combined partials at scale."""
    return df.groupBy(key.alias("group_key")).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def dedupe(
    df: DataFrame,
    keys: Sequence[str | Column],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """``dedupe`` processor: keep one row per key (dedupe.adoc:26,53-78).

    The reference drops a message when its key was already seen in a
    cache — i.e. "first writer wins" in arrival order. A distributed
    engine has no global arrival order, so determinism comes from an
    explicit ``order_by`` (e.g. a monotonically increasing id): we keep
    the first row per key under that ordering via ``row_number``. With
    ``order_by=None`` this degrades to ``dropDuplicates`` (any winner).

    Scale: one hash shuffle on the key; AQE handles skewed keys.
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    if order_by is None:
        # Column keys have no resolvable name (str(Column) is
        # "Column<'id'>", which dropDuplicates can't resolve) — project
        # each key expression to a temp column, dedupe on those, drop.
        names: list[str] = []
        tmp = df
        for i, k in enumerate(keys):
            if isinstance(k, str):
                names.append(k)
            else:
                tmp_name = f"_dedupe_k{i}"
                tmp = tmp.withColumn(tmp_name, k)
                names.append(tmp_name)
        out = tmp.dropDuplicates(names)
        return out.drop(*[n for n in names if n.startswith("_dedupe_k")])
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def select_parts(
    df: DataFrame,
    n: int,
    partition_by: Sequence[Column],
    order_by: Sequence[Column],
) -> DataFrame:
    """``select_parts``: cherry-pick batch members by index
    (select_parts.adoc:26). Batches have no global meaning in a
    distributed plan, so "the batch" is defined by ``partition_by`` and
    the index by ``order_by`` — this is top-k per group, a single
    windowed shuffle."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("_idx", F.row_number().over(w))
        .filter(F.col("_idx") <= n)
        .drop("_idx")
    )


def archive_concat(
    df: DataFrame,
    group_by: Sequence[Column],
    value: Column,
    sep: str = "\n",
    sort: bool = True,
) -> DataFrame:
    """``archive`` with ``format: lines/concatenate`` (archive.adoc:46-58):
    fold a whole group into ONE message. ``sort=True`` makes the result
    deterministic under distributed aggregation order."""
    arr = F.collect_list(value)
    if sort:
        arr = F.sort_array(arr)
    return df.groupBy(*group_by).agg(F.array_join(arr, sep).alias("archived"))


def archive_json_array(
    df: DataFrame, group_by: Sequence[Column], value: Column, sort: bool = True
) -> DataFrame:
    """``archive`` with ``format: json_array`` (archive.adoc:46-58)."""
    arr = F.collect_list(value)
    if sort:
        arr = F.sort_array(arr)
    return df.groupBy(*group_by).agg(F.to_json(arr).alias("archived"))


def unarchive(df: DataFrame, col: Column, out: str = "part") -> DataFrame:
    """``unarchive``: one message → many (unarchive.adoc:26). Narrow
    ``explode`` — no shuffle."""
    return df.withColumn(out, F.explode(col))


def collapse(df: DataFrame, sep: str = ".") -> DataFrame:
    """Bloblang `collapse` (methods.adoc:2369): flatten nested objects
    into dotted top-level keys — here struct columns flatten into
    `parent.child` columns, recursively. Pure projection."""
    from pyspark.sql import types as T

    cols: list[Column] = []

    def walk(prefix: str, dtype, accessor: Column) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}", f.dataType, accessor[f.name])
        else:
            cols.append(accessor.alias(prefix))

    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            walk(field.name, field.dataType, F.col(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def bounds_check(
    df: DataFrame,
    value: Column,
    min_len: int | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """``bounds_check``: drop rows outside size bounds
    (bounds_check.adoc:26). Pure filter — pushes down to the scan when
    ``value`` is a raw column."""
    cond = F.lit(True)
    if min_len is not None:
        cond = cond & (F.length(value) >= min_len)
    if max_len is not None:
        cond = cond & (F.length(value) <= max_len)
    return df.filter(cond)
