"""Local replica of the driver's DuckDB-oracle compare.

Runs a QuerySpec's Spark side and oracle SQL side-by-side, sorts
columns by name, and compares the (order-insensitive) multiset of rows
— the same shape as the driver's value-hash gate, but with readable
diffs on mismatch.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from connect_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(sf_dir, t)}')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; keep floats exact but collapse -0.0.
        # Tag floats so an int on one side vs a float on the other (e.g.
        # DuckDB HUGEINT -> pandas float64 in the driver) is a MISMATCH
        # here too, not silently equal via Python's 239 == 239.0.
        return ("f", v + 0.0)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return v


def normalize(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(
    spark_df, oracle_cols: list[str], oracle_rows: list[tuple]
) -> list[str]:
    """Return a list of human-readable problems (empty == match)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}"
        )
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    left = normalize(s_cols, s_rows)
    right = normalize(oracle_cols, oracle_rows)
    if left != right:
        only_spark = list((left - right).items())[:5]
        only_oracle = list((right - left).items())[:5]
        problems.append(
            f"row multiset mismatch: {sum((left - right).values())} spark-only,"
            f" {sum((right - left).values())} oracle-only rows\n"
            f"  sorted cols: {sorted(s_cols)}\n"
            f"  spark-only sample: {only_spark}\n"
            f"  oracle-only sample: {only_oracle}"
        )
    return problems
