"""Bucketed (pre-shuffled) tables for exchange-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact equality join is the
shuffle of both sides.  Spark's bucketed tables eliminate it: both
sides are written `bucketBy(n, key)` + `sortBy(key)`, so at read time
every bucket pair is already co-partitioned AND co-sorted — the
SortMergeJoin consumes the scans directly with NO Exchange and NO
Sort (spark.sql.sources.bucketing.enabled, default on).  This is the
Spark-native equivalent of the reference's sharded `sequence` join
(sequence.go shard mapping): the shard assignment is persisted in the
table layout once, then every subsequent join of any two tables
bucketed on the same key by the same count is shuffle-free — the
write cost amortizes across reads, exactly the contract a daily-run
training-data pipeline wants.

Bucket metadata only survives through the session catalog
(saveAsTable); plain parquet paths lose it.  `write_bucketed`
registers an EXTERNAL table at an explicit path so the data lives
where the caller says and the catalog entry is just metadata —
re-runs drop + recreate idempotently.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    num_buckets: int = 8,
) -> None:
    """Persist `df` bucketed+sorted by `keys` as external table
    `table` at `path` (overwrite semantics, idempotent re-runs)."""
    if not re.fullmatch(r"[A-Za-z0-9_]+", table):
        raise ValueError(f"unsafe table name {table!r}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (df.write.mode("overwrite")
       .option("path", path)
       .bucketBy(num_buckets, *keys)
       .sortBy(*keys)
       .saveAsTable(table))


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the first shuffle-join node's OWN subtree contains no
    Exchange — the bucketed co-location proof used by tests
    (plan-shape guard, not a correctness gate). The subtree is scoped
    by the plan printer's indentation, so Exchanges in sibling
    operator subtrees printed after the join don't pollute the
    verdict."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def prefix_len(line: str) -> int:
        # tree-drawing prefix before the node text (":  +- " etc.,
        # optionally followed by a codegen stage tag "*(3) ")
        m = re.match(r"^([\s:+\-|]*)(\*\(\d+\)\s*)?", line)
        return len(m.group(1))

    for i, line in enumerate(lines):
        if re.search(r"SortMergeJoin|ShuffledHashJoin", line):
            d = prefix_len(line)
            j = i + 1
            while j < len(lines) and prefix_len(lines[j]) > d:
                if "Exchange" in lines[j]:
                    return False
                j += 1
            return True
    return False
