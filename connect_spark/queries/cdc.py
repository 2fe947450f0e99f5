"""CDC materialization as a driver-checkable query.

The streaming transport (snapshot→WAL handoff, checkpointed LSN
resume) lives in `connect_spark/sources/cdc_stream.py` and is proven
by `tests/test_cdc_stream.py` (resume-mid-stream, deterministic
replay) — streaming isn't SQL-expressible, so THIS entry pins the
apply semantics instead: a deterministic change log (snapshot `read`
rows + inserts + updates + deletes with monotonically increasing
sequence numbers, the envelope of
internal/impl/postgresql/input_pg_stream.go:86-89) replayed into the
final materialized table with last-writer-wins per key and delete
tombstones — exactly what `apply_cdc_batch` does per micro-batch.

Scale: the only shuffle is the per-key window over the change log —
the same single hash-partition a 100-TB streaming apply does per
micro-batch (change batches are small relative to state; state lookup
is the KV store's problem, not a join here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def cdc_materialize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def frame(pred, op, seq, status, price):
        return orders.filter(pred).select(
            k.alias("o_orderkey"),
            F.lit(op).alias("operation"),
            seq.cast("bigint").alias("_seq"),
            status.alias("status"),
            price.alias("price"),
        )

    log = (
        # snapshot pinned at seq 0
        frame(k % 10 < 8, "read", F.lit(0), F.col("o_orderstatus"),
              F.col("o_totalprice"))
        # rows created after the snapshot
        .unionByName(frame(k % 10 >= 8, "insert", F.lit(1_000_000_000) + k,
                           F.col("o_orderstatus"), F.col("o_totalprice")))
        # later updates (win over snapshot/insert by seq)
        .unionByName(frame(k % 5 == 0, "update", F.lit(2_000_000_000) + k,
                           F.lit("X"), F.col("o_totalprice") + F.lit(1.0)))
        # tombstones
        .unionByName(frame(k % 13 == 0, "delete", F.lit(3_000_000_000) + k,
                           F.lit(None).cast("string"),
                           F.lit(None).cast("double")))
    )

    w = Window.partitionBy("o_orderkey").orderBy(F.col("_seq").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("operation") != "delete"))
        .select(
            "o_orderkey",
            F.col("operation").alias("src_op"),
            "status",
            "price",
        )
    )


CDC_MATERIALIZE_SQL = """
WITH log AS (
  SELECT o_orderkey, 'read' AS operation, 0 AS seq,
         o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 < 8
  UNION ALL
  SELECT o_orderkey, 'insert', 1000000000 + o_orderkey,
         o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 >= 8
  UNION ALL
  SELECT o_orderkey, 'update', 2000000000 + o_orderkey,
         'X', o_totalprice + 1.0
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', 3000000000 + o_orderkey, NULL, NULL
  FROM orders WHERE o_orderkey % 13 = 0
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
  FROM log
)
SELECT o_orderkey, operation AS src_op, status, price
FROM latest WHERE rn = 1 AND operation <> 'delete'
"""


QUERIES = [
    QuerySpec("cdc_materialize_orders", cdc_materialize_orders,
              CDC_MATERIALIZE_SQL, headline=True),
]
