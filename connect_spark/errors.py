"""Per-row error-flag semantics (the reference's try/catch model).

In the reference, a processor failure marks the *message* with an error
flag rather than crashing the stream; later processors can be gated on
that flag, and `try`/`catch` blocks scope execution to the un-errored /
errored subsets (reference: docs/modules/components/pages/processors/
{try,catch,try_catch}.adoc:26; errored()/error() functions in
docs/modules/guides/pages/bloblang/functions.adoc:504,584).

Spark-first re-expression: a reserved ``_error`` STRING column, null when
the row is healthy. All of this stays inside Catalyst (``when`` exprs and
``try_*`` functions) — no Python in the hot path, whole-stage codegen
keeps working, and the convention survives any shuffle because the flag
travels with the row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "_error"
ERROR_SOURCE_COL = "_error_source"


# component-provenance stack: apply_processor pushes (name, label,
# path) around each dispatch so every flag_error inside inherits the
# flagging component's identity without threading args through every
# call site (error_source_* functions, functions.adoc:523-583)
_SOURCE_CTX: list[tuple[str | None, str | None, str | None]] = []


class source_context:
    """Context manager: the component identity for flag_error calls
    inside the block. None fields inherit from the enclosing scope."""

    def __init__(self, name: str | None = None, label: str | None = None,
                 path: str | None = None):
        outer = _SOURCE_CTX[-1] if _SOURCE_CTX else (None, None, None)
        self.entry = (
            name if name is not None else outer[0],
            label if label is not None else outer[1],
            path if path is not None else outer[2],
        )

    def __enter__(self):
        _SOURCE_CTX.append(self.entry)
        return self

    def __exit__(self, *exc):
        _SOURCE_CTX.pop()
        return False


def current_source() -> tuple[str | None, str | None, str | None]:
    return _SOURCE_CTX[-1] if _SOURCE_CTX else (None, None, None)


def ensure_error_col(df: DataFrame) -> DataFrame:
    """Add a null ``_error`` column if the frame doesn't carry one yet."""
    if ERROR_COL in df.columns:
        return df
    return df.withColumn(ERROR_COL, F.lit(None).cast("string"))


def errored() -> Column:
    """Predicate: row carries an error flag (functions.adoc:584)."""
    return F.col(ERROR_COL).isNotNull()


def error() -> Column:
    """The error message, null when healthy (functions.adoc:504)."""
    return F.col(ERROR_COL)


def flag_error(
    df: DataFrame,
    condition: Column,
    message: Column | str,
    *,
    source_name: str | None = None,
    source_label: str | None = None,
    source_path: str | None = None,
) -> DataFrame:
    """Set ``_error`` where ``condition`` holds (keeps an existing flag).

    When the flagging component identifies itself (name/label/path),
    the provenance lands in a ``_error_source`` struct so the Bloblang
    ``error_source_name()``/``error_source_label()``/
    ``error_source_path()`` functions (functions.adoc:523-583) can
    read it — first flag wins, matching the message's first error."""
    df = ensure_error_col(df)
    msg = F.lit(message) if isinstance(message, str) else message
    cols: dict[str, Column] = {
        ERROR_COL: F.coalesce(F.col(ERROR_COL), F.when(condition, msg))
    }
    if not (source_name or source_label or source_path):
        source_name, source_label, source_path = current_source()
    if source_name or source_label or source_path:
        # first flag wins: `newly` reads the PRE-UPDATE _error (both
        # columns are assigned in one withColumns over the input frame)
        newly = condition & F.col(ERROR_COL).isNull()
        src = F.struct(
            F.lit(source_label).alias("label"),
            F.lit(source_name).alias("name"),
            F.lit(source_path).alias("path"),
        )
        if ERROR_SOURCE_COL in df.columns:
            cols[ERROR_SOURCE_COL] = F.coalesce(
                F.col(ERROR_SOURCE_COL), F.when(newly, src)
            )
        else:
            cols[ERROR_SOURCE_COL] = F.when(newly, src)
    return df.withColumns(cols)


def try_processor(
    df: DataFrame, *steps: Callable[[DataFrame], DataFrame]
) -> DataFrame:
    """`try` processor (try.adoc:26): apply steps only to healthy rows.

    Errored rows pass through untouched; healthy rows flow through every
    step (steps themselves use :func:`flag_error` to mark failures, which
    stops later steps from touching those rows).
    """
    df = ensure_error_col(df)
    # r16 shape: the previous form re-unioned the full frame after
    # EVERY step (df = step(healthy) ∪ errored), so step i's subtree
    # was re-evaluated by both branch filters of step i+1 — 2^k plan
    # copies and 2^k re-executions of the earliest step's work for a
    # k-step block (measured: a 6-processor reference suite collected
    # one document through 446 tasks).  Accumulating each step's
    # newly-errored slice and unioning ONCE at the end keeps every
    # subtree's consumer count at two (next step + its error filter):
    # linear plans, identical row multiset (errored rows freeze at the
    # step that flagged them in both forms).
    err_parts = [df.filter(errored())]
    cur = df.filter(~errored())
    for step in steps:
        out = ensure_error_col(step(cur))
        err_parts.append(out.filter(errored()))
        cur = out.filter(~errored())
    for part in err_parts:
        cur = cur.unionByName(part, allowMissingColumns=True)
    return cur


def catch_processor(
    df: DataFrame, *steps: Callable[[DataFrame], DataFrame], clear: bool = True
) -> DataFrame:
    """`catch` processor (catch.adoc:26): steps run only on errored rows;
    afterwards the error flag is cleared (matching the reference, which
    considers a caught message recovered)."""
    df = ensure_error_col(df)
    bad = df.filter(errored())
    for step in steps:
        bad = step(bad)
    if clear:
        bad = bad.withColumn(ERROR_COL, F.lit(None).cast("string"))
        if ERROR_SOURCE_COL in bad.columns:
            # a recovered message sheds its error provenance too
            bad = bad.drop(ERROR_SOURCE_COL)
    return df.filter(~errored()).unionByName(bad, allowMissingColumns=True)


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(healthy, dead_letter) pair — the `reject_errored` output pattern
    (docs/.../outputs/reject_errored.adoc:26)."""
    df = ensure_error_col(df)
    return df.filter(~errored()), df.filter(errored())
