"""Sources (file scanners, kafka option mapping, CDC snapshot plan)
and sink routing combinators."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.errors import flag_error
from connect_spark.sinks import (
    broker_fanout,
    fallback_write,
    reject_errored_split,
    switch_output,
)
from connect_spark.sources import (
    kafka_reader_options,
    read_file_messages,
    snapshot_jdbc_plan,
)
from connect_spark.sources.kafka import kafka_envelope

SF = "/root/testdata/sf0.001"


@pytest.fixture
def textfile(tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    return str(p)


def test_file_lines_scanner(spark, textfile):
    df = read_file_messages(spark, textfile, scanner="lines")
    rows = df.collect()
    assert {r["content"] for r in rows} == {"alpha", "beta", "gamma"}
    assert all(r["_meta"]["path"].endswith("lines.txt") for r in rows)


def test_file_chunker_scanner(spark, textfile):
    df = read_file_messages(
        spark, textfile, scanner="chunker", scanner_conf={"size": 4}
    )
    chunks = [bytes(r["content"]) for r in df.collect()]
    assert b"".join(chunks) == b"alpha\nbeta\ngamma\n"
    assert all(len(c) <= 4 for c in chunks)


def test_file_to_the_end_scanner(spark, textfile):
    df = read_file_messages(spark, textfile, scanner="to_the_end")
    [r] = df.collect()
    assert bytes(r["content"]) == b"alpha\nbeta\ngamma\n"


def test_kafka_option_mapping(spark):
    opts = kafka_reader_options(
        {
            "addresses": ["k1:9092", "k2:9092"],
            "topics": ["events", "audit"],
            "consumer_group": "g1",
            "start_from_oldest": False,
            "checkpoint_limit": 5000,
        }
    )
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["subscribe"] == "events,audit"
    assert opts["startingOffsets"] == "latest"
    assert opts["kafka.group.id"] == "g1"
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_kafka_envelope_projection(spark):
    # simulate the Kafka source schema
    import datetime

    df = spark.createDataFrame(
        [
            (
                b"k",
                b"payload",
                "events",
                3,
                42,
                datetime.datetime(2024, 1, 1, 0, 0, 1),
                0,
            )
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )
    out = kafka_envelope(df)
    [r] = out.collect()
    assert bytes(r["content"]) == b"payload"
    assert r["_meta"]["kafka_topic"] == "events"
    assert r["_meta"]["kafka_partition"] == "3"
    assert r["_meta"]["kafka_offset"] == "42"


def test_snapshot_plan_sizing():
    plan = snapshot_jdbc_plan(
        "jdbc:postgresql://db/x",
        "public.orders",
        "o_orderkey",
        pk_min=1,
        pk_max=10_000_000,
        target_rows_per_partition=500_000,
    )
    assert plan.num_partitions == 20
    kw = plan.jdbc_kwargs()
    assert kw["column"] == "o_orderkey"
    assert kw["numPartitions"] == 20
    with pytest.raises(ValueError):
        snapshot_jdbc_plan("u", "t", "pk", pk_min=10, pk_max=1)


def _parquet_writer(path):
    def write(df):
        df.write.mode("overwrite").parquet(path)

    return write


def test_broker_fanout(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "event_type")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    broker_fanout(ev, [_parquet_writer(a), _parquet_writer(b)])
    assert spark.read.parquet(a).count() == ev.count()
    assert spark.read.parquet(b).count() == ev.count()


def test_switch_output_routes_with_default(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "event_type")
    errs, rest = str(tmp_path / "errs"), str(tmp_path / "rest")
    switch_output(
        ev,
        cases=[(F.col("event_type") == "error", _parquet_writer(errs))],
        default=_parquet_writer(rest),
    )
    n_err = spark.read.parquet(errs).count()
    n_rest = spark.read.parquet(rest).count()
    assert n_err == ev.filter(F.col("event_type") == "error").count()
    assert n_err + n_rest == ev.count()


def test_fallback_write(spark, tmp_path):
    ev = load_table(spark, SF, "events").limit(5)
    good = str(tmp_path / "good")

    def failing(df):
        raise IOError("sink down")

    idx = fallback_write(ev, [failing, _parquet_writer(good)])
    assert idx == 1
    assert spark.read.parquet(good).count() == 5
    with pytest.raises(RuntimeError, match="all fallback outputs failed"):
        fallback_write(ev, [failing, failing])


def test_reject_errored_split(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    flagged = flag_error(ev, F.col("value") > 30, "too big")
    good_dir, dlq_dir = str(tmp_path / "good"), str(tmp_path / "dlq")
    reject_errored_split(
        flagged, _parquet_writer(good_dir), _parquet_writer(dlq_dir)
    )
    good = spark.read.parquet(good_dir)
    dlq = spark.read.parquet(dlq_dir)
    assert good.count() + dlq.count() == ev.count()
    assert "_error" not in good.columns
    assert dlq.filter(F.col("_error") != "too big").count() == 0


def test_retry_write_backoff_then_dlq(spark):
    from connect_spark.sinks.routing import retry_write

    df = spark.createDataFrame([(1,)], ["a"])
    sleeps: list[float] = []

    # succeeds on 3rd attempt
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    attempts = retry_write(
        df, flaky, max_retries=3, sleep=sleeps.append
    )
    assert attempts == 3
    assert sleeps == [0.1, 0.2]  # exponential backoff before retries

    # exhausts retries -> DLQ receives the batch
    dlq_rows: list = []

    def always_fail(d):
        raise RuntimeError("down")

    attempts = retry_write(
        df,
        always_fail,
        max_retries=2,
        dlq=lambda d: dlq_rows.extend(d.collect()),
        sleep=lambda s: None,
    )
    assert attempts == 3
    assert [r.a for r in dlq_rows] == [1]

    # no DLQ -> raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="exhausted"):
        retry_write(df, always_fail, max_retries=1, sleep=lambda s: None)
