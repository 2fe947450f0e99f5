"""`command` / `subprocess` processors (docs/.../processors/
{command,subprocess}.adoc:26): pipe each message through an external
program.

Spark-first: one subprocess per Arrow batch per partition (NOT per
row — the reference's `subprocess` also keeps a long-lived child),
line-delimited stdin/stdout. Narrow mapInPandas: at 100 TB each
executor core streams its partition through its own child process;
no shuffle, backpressure via pipe buffering.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pipe_through(
    df: DataFrame, col: str, argv: list[str], out: str = "piped"
) -> DataFrame:
    """Pipe the string column through `argv` (one line per row; the
    program must emit exactly one output line per input line, the
    reference's contract)."""
    fields = df.schema.fields + [T.StructField(out, T.StringType())]
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = pdf[col].fillna("").tolist()
            proc = subprocess.run(
                argv,
                input="\n".join(lines) + "\n" if lines else "",
                capture_output=True,
                text=True,
                check=True,
            )
            out_lines = proc.stdout.splitlines()
            if len(out_lines) != len(lines):
                raise ValueError(
                    f"subprocess emitted {len(out_lines)} lines for "
                    f"{len(lines)} inputs"
                )
            pdf = pdf.copy()
            pdf[out] = out_lines
            yield pdf

    return df.mapInPandas(run, schema)
