"""Batching policy (operators/batching.py): count / byte_size / period /
check triggers vs an independent sequential reference implementation."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from connect_spark.operators.batching import (
    BatchPolicy,
    assign_batches,
    parse_period,
)


def ref_pack(rows, *, count=0, byte_size=0, period_sec=None):
    """Independent reference: rows = [(size, check, epoch_sec)]."""
    ids, bid, n, acc, bucket = [], 0, 0, 0, None
    for size, check, epoch in rows:
        if period_sec is not None:
            b = int(epoch // period_sec)
            if bucket is not None and b != bucket and n:
                bid, n, acc = bid + 1, 0, 0
            bucket = b
        n += 1
        acc += size
        ids.append(bid)
        if (count and n >= count) or (byte_size and acc >= byte_size) or check:
            bid, n, acc = bid + 1, 0, 0
    return ids


def _mk(spark, rows):
    """rows: list of (idx, size, check, epoch_sec)."""
    data = [
        (i, s, c, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=e))
        for i, s, c, e in rows
    ]
    return spark.createDataFrame(data, ["idx", "size", "chk", "ts"])


def _ids(df):
    return [
        r["batch_id"] for r in df.orderBy("idx").select("batch_id").collect()
    ]


def test_parse_period():
    assert parse_period("500ms") == 0.5
    assert parse_period("1s") == 1.0
    assert parse_period("2m") == 120.0
    assert parse_period("1h") == 3600.0
    with pytest.raises(ValueError):
        parse_period("10 parsecs")


def test_count_only(spark):
    rows = [(i, 1, False, 0) for i in range(7)]
    df = _mk(spark, rows)
    out = assign_batches(df, BatchPolicy(count=3), order_by=["idx"])
    assert _ids(out) == [0, 0, 0, 1, 1, 1, 2]


def test_check_ends_batch_inclusively(spark):
    rows = [(0, 1, False, 0), (1, 1, True, 0), (2, 1, False, 0), (3, 1, True, 0), (4, 1, False, 0)]
    df = _mk(spark, rows)
    out = assign_batches(df, BatchPolicy(check=F.col("chk")), order_by=["idx"])
    assert _ids(out) == [0, 0, 1, 1, 2]


def test_check_plus_count_matches_reference(spark):
    import random

    rng = random.Random(7)
    rows = [(i, 1, rng.random() < 0.2, 0) for i in range(200)]
    df = _mk(spark, rows)
    out = assign_batches(
        df, BatchPolicy(count=5, check=F.col("chk")), order_by=["idx"]
    )
    assert _ids(out) == ref_pack([(s, c, e) for _, s, c, e in rows], count=5)


def test_byte_size_greedy_matches_reference(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 40), rng.random() < 0.1, 0) for i in range(300)]
    df = _mk(spark, rows)
    out = assign_batches(
        df,
        BatchPolicy(byte_size=100, check=F.col("chk"), size=F.col("size")),
        order_by=["idx"],
    )
    assert _ids(out) == ref_pack(
        [(s, c, e) for _, s, c, e in rows], byte_size=100
    )


def test_period_buckets_close_batches(spark):
    rows = [(0, 1, False, 0), (1, 1, False, 30), (2, 1, False, 70), (3, 1, False, 75), (4, 1, False, 200)]
    df = _mk(spark, rows)
    out = assign_batches(
        df, BatchPolicy(period="1m"), order_by=["idx"], ts="ts"
    )
    assert _ids(out) == [0, 0, 1, 1, 2]
    # greedy path must agree on the same data when byte_size is huge
    out2 = assign_batches(
        df,
        BatchPolicy(period="1m", byte_size=10**9, size=F.col("size")),
        order_by=["idx"],
        ts="ts",
    )
    assert _ids(out2) == [0, 0, 1, 1, 2]


def test_all_four_triggers_together(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, rng.randint(1, 30), rng.random() < 0.1, i * 7)
        for i in range(200)
    ]
    df = _mk(spark, rows)
    out = assign_batches(
        df,
        BatchPolicy(
            count=8, byte_size=120, period="1m",
            check=F.col("chk"), size=F.col("size"),
        ),
        order_by=["idx"],
        ts="ts",
    )
    assert _ids(out) == ref_pack(
        [(s, c, e) for _, s, c, e in rows],
        count=8, byte_size=120, period_sec=60,
    )


def test_partitioned_assignment_is_per_group(spark):
    data = [(u, i, datetime.datetime(2024, 1, 1)) for u in (1, 2) for i in range(5)]
    df = spark.createDataFrame(data, ["user", "idx", "ts"])
    out = assign_batches(
        df, BatchPolicy(count=2), order_by=["idx"], partition_by=["user"]
    )
    got = {
        (r["user"], r["idx"]): r["batch_id"]
        for r in out.collect()
    }
    for u in (1, 2):
        assert [got[(u, i)] for i in range(5)] == [0, 0, 1, 1, 2]


def test_policy_validation():
    with pytest.raises(ValueError):
        BatchPolicy()  # no trigger
    with pytest.raises(ValueError):
        BatchPolicy(byte_size=10)  # byte_size without size column


def test_byte_size_null_sizes_count_as_zero(spark):
    import datetime

    from pyspark.sql import functions as F

    from connect_spark.operators.batching import BatchPolicy, assign_batches

    data = [
        (0, 50, datetime.datetime(2024, 1, 1)),
        (1, None, datetime.datetime(2024, 1, 1)),
        (2, 60, datetime.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(data, "idx INT, size INT, ts TIMESTAMP")
    out = assign_batches(
        df,
        BatchPolicy(byte_size=100, size=F.col("size")),
        order_by=["idx"],
    )
    ids = [r["batch_id"] for r in out.orderBy("idx").collect()]
    assert ids == [0, 0, 0]  # 50 + 0 + 60 >= 100 flushes AFTER row 2
