"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where expressible) a
DuckDB oracle SQL string over the same parquet tables.

Contract notes (driver compare):
- Column names must match between Spark and oracle exactly; every
  computed column is aliased on both sides.
- The compare hashes values order-insensitively, so no ORDER BY needed.
- Double aggregates are rounded on BOTH sides (engine summation order
  differs at the 1e-12 level; rounding makes the hash stable).
- Timestamps are cast to strings on both sides (identical formatting in
  Spark-UTC and DuckDB-naive).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check
    headline: bool = False  # included in bench.py


def all_queries() -> list[QuerySpec]:
    from connect_spark.queries import (
        analytics,
        asof,
        cdc,
        core,
        engines,
        extended,
        formats,
        functions as fns,
        joins,
        mq,
        relational,
        streaming_q,
        textops,
        vectors,
        windows,
        winfns,
    )

    specs: list[QuerySpec] = []
    for mod in (
        core, joins, windows, fns, textops, vectors, extended, asof, formats,
        relational, analytics, cdc, mq, engines, streaming_q, winfns,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs
