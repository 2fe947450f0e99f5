"""Bucketed co-located joins (operators/bucketed.py): correctness of
the write->table->join cycle and the plan guarantee the module exists
for — no Exchange, no Sort between the bucketed scans and the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connect_spark.operators.bucketed import (
    is_exchange_free_join,
    write_bucketed,
)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    left = spark.createDataFrame(
        [(i % 100, i, float(i)) for i in range(2000)],
        "k LONG, id LONG, v DOUBLE")
    right = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "k LONG, name STRING")
    write_bucketed(left, "t_bleft", str(tmp_path / "l"), ["k"], 4)
    write_bucketed(right, "t_bright", str(tmp_path / "r"), ["k"], 4)
    yield spark.table("t_bleft"), spark.table("t_bright")
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")


def test_bucketed_join_correct_and_exchange_free(spark, bucketed_pair):
    l, r = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, "k")
        assert joined.count() == 2000
        # the whole point: co-partitioned AND co-sorted scans feed the
        # SortMergeJoin directly — no Exchange below the join
        assert is_exchange_free_join(joined)
        # the same data from a non-bucketed source DOES exchange
        flat = spark.createDataFrame(
            [(i % 100, i) for i in range(2000)], "k LONG, id LONG")
        assert not is_exchange_free_join(flat.join(r, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_rewrite_is_idempotent(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, s STRING")
    for _ in range(2):  # drop + recreate must not fail or duplicate
        write_bucketed(df, "t_bidem", str(tmp_path / "t"), ["k"], 2)
    got = spark.table("t_bidem")
    assert sorted((r.k, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]
    spark.sql("DROP TABLE IF EXISTS t_bidem")


def test_unsafe_table_name_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "k LONG")
    with pytest.raises(ValueError):
        write_bucketed(df, "bad name; drop", str(tmp_path / "x"), ["k"])
