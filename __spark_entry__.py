"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query on sf0.001 (windowed traffic example,
                  the reference's system_window worked example).
queries()       — one (spark, sf_dir) -> DataFrame per implemented
                  operator from SURVEY.md §2 (+ training-data ops).
oracle_sql()    — DuckDB-equivalent SQL per query for the correctness
                  gate; column names are aliased identically on both
                  sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connect_spark.queries import all_queries
from connect_spark.queries.windows import window_tumbling_hourly


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return window_tumbling_hourly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in all_queries()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in all_queries()
        if spec.oracle is not None
    }
