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


def flag_error(df: DataFrame, condition: Column, message: Column | str) -> DataFrame:
    """Set ``_error`` where ``condition`` holds (keeps an existing flag)."""
    df = ensure_error_col(df)
    msg = F.lit(message) if isinstance(message, str) else message
    return df.withColumn(
        ERROR_COL, F.coalesce(F.col(ERROR_COL), F.when(condition, msg))
    )


def try_processor(
    df: DataFrame, *steps: Callable[[DataFrame], DataFrame]
) -> DataFrame:
    """`try` processor (try.adoc:26): apply steps only to healthy rows.

    Errored rows pass through untouched; healthy rows flow through every
    step (steps themselves use :func:`flag_error` to mark failures, which
    stops later steps from touching those rows).
    """
    df = ensure_error_col(df)
    for step in steps:
        healthy = step(df.filter(~errored()))
        df = healthy.unionByName(df.filter(errored()), allowMissingColumns=True)
    return df


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
    return df.filter(~errored()).unionByName(bad, allowMissingColumns=True)


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(healthy, dead_letter) pair — the `reject_errored` output pattern
    (docs/.../outputs/reject_errored.adoc:26)."""
    df = ensure_error_col(df)
    return df.filter(~errored()), df.filter(errored())
