"""ParquetSpool buffer (state/spool.py): the sqlite disk-spool
contract — at-least-once delivery across failures and restarts."""

from __future__ import annotations

import pytest

from connect_spark.state.spool import ParquetSpool


def test_enqueue_drain_ack_cycle(spark, tmp_path):
    spool = ParquetSpool(spark, str(tmp_path / "sp"))
    spool.enqueue(spark.range(5).toDF("n"))
    spool.enqueue(spark.range(5, 8).toDF("n"))
    assert len(spool.pending()) == 2
    assert spool.read_pending().count() == 8

    seen = []
    assert spool.drain(lambda df: seen.append(df.count())) == 2
    assert seen == [5, 3]
    assert spool.pending() == []
    # drained spool delivers nothing more (acks persist)
    assert spool.drain(lambda df: seen.append(df.count())) == 0


def test_failed_delivery_redelivers(spark, tmp_path):
    spool = ParquetSpool(spark, str(tmp_path / "sp"))
    spool.enqueue(spark.range(2).toDF("n"))
    spool.enqueue(spark.range(2, 4).toDF("n"))

    calls = []

    def flaky(df):
        calls.append(df.count())
        if len(calls) == 2:
            raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        spool.drain(flaky)
    # first segment acked, second still pending -> re-delivered
    assert len(spool.pending()) == 1
    got = []
    assert spool.drain(lambda df: got.append(sorted(r["n"] for r in df.collect()))) == 1
    assert got == [[2, 3]]


def test_restart_resumes_from_disk(spark, tmp_path):
    path = str(tmp_path / "sp")
    ParquetSpool(spark, path).enqueue(spark.range(4).toDF("n"))
    # "restart": a fresh instance over the same path sees the backlog
    spool2 = ParquetSpool(spark, path)
    assert len(spool2.pending()) == 1
    n = []
    spool2.drain(lambda df: n.append(df.count()))
    assert n == [4]


def test_vacuum_removes_acked(spark, tmp_path):
    spool = ParquetSpool(spark, str(tmp_path / "sp"))
    spool.enqueue(spark.range(3).toDF("n"))
    spool.drain(lambda df: None)
    assert spool.vacuum() == 1
    assert spool.pending() == []
    assert spool.read_pending() is None
