"""SparkSession factory tuned for this engine.

Local test mode runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM, but every
config here is chosen to also hold on a large multi-executor cluster:

- AQE on (runtime re-plan: coalesce small shuffle partitions, skew-join
  splitting, dynamic broadcast) — the reference has no optimizer at all
  (SURVEY.md §4.1), Catalyst+AQE is our substitute and upgrade.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE coalescing makes the initial number mostly a ceiling.
- Arrow enabled so the pandas-UDF tail (the few operators that genuinely
  need Python) moves columnar batches, not pickled rows.
- Session timezone pinned to UTC so event-time windows and the DuckDB
  oracle agree on timestamp arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    """$SPARK_GRAFT_CPUS if set and positive, else 0 (= use cpu_count).
    The previous max(1, ...) clamped the unset sentinel 0 up to 1, so
    sessions built without the env var silently ran local[1]."""
    try:
        n = int(os.environ.get("SPARK_GRAFT_CPUS", "0"))
    except ValueError:
        return 0
    return n if n > 0 else 0


def get_spark(app_name: str = "connect_spark") -> SparkSession:
    """Build (or return) the shared SparkSession."""
    n = _cpus() or (os.cpu_count() or 4)
    # Shuffle width defaults to the core count; override for sessions
    # whose workloads are dominated by fixed per-partition overhead
    # (the unit suite: streaming state stores open one per shuffle
    # partition per micro-batch, and AQE cannot coalesce streaming).
    # bench.py and the round driver never set it.
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") or str(n)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        # Bloblang merge/squash: right side wins on duplicate map keys
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # test tables carry TIMESTAMP(NANOS) parquet columns (events.ts);
        # read them as int64 nanos and convert in the catalog loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Optional override for sc.parallelize / local-list createDataFrame
    # slice counts (RDD default parallelism).  Unset = Spark's own
    # default (total cores).  The test suite pins a small value so
    # control-plane-sized local frames stop fanning into one empty
    # Python-RDD slice per core; bench.py and the round driver never
    # set it, so measured query behavior is unchanged.
    dp = os.environ.get("SPARK_GRAFT_DEFAULT_PARALLELISM")
    if dp:
        builder = builder.config("spark.default.parallelism", dp)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
