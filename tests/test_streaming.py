"""Structured Streaming tests: system_window equivalence vs batch,
streaming dedupe, late-data handling. File-based streaming source fed
from the driver's events table; memory sink collected after
processAllAvailable — deterministic, no timing races."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.streaming import streaming_dedupe, system_window_stream

SF = "/root/testdata/sf0.001"


def _write_time_ordered(df, ts_col, src, n_slices):
    """Write time-range slices sequentially (append, distinct mtimes) so
    the file stream source replays them IN EVENT-TIME ORDER — an
    in-order source like Kafka with time-ordered partitions. Without
    this, file mtime ties make micro-batch order nondeterministic and
    watermark late-drops become flaky."""
    import time

    qs = ", ".join(str((i + 1) / n_slices) for i in range(n_slices - 1))
    bounds = df.selectExpr(
        f"percentile(unix_micros({ts_col}), array({qs})) AS b"
    ).collect()[0]["b"]
    bounds = [
        __import__("datetime").datetime.utcfromtimestamp(b / 1_000_000)
        for b in bounds
    ]
    lows = [None] + list(bounds)
    highs = list(bounds) + [None]
    for lo, hi in zip(lows, highs):
        part = df
        if lo is not None:
            part = part.filter(F.col(ts_col) > lo)
        if hi is not None:
            part = part.filter(F.col(ts_col) <= hi)
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)


def _stream_events(spark, tmp_path):
    """Events table as a deterministic in-order file stream; one file
    per micro-batch."""
    batch = load_table(spark, SF, "events")
    src = str(tmp_path / "stream_src")
    _write_time_ordered(batch, "ts", src, 4)
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)  # batching policy → trigger knob
        .parquet(src),
        batch,
    )


def _run_to_memory(stream_df, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name


def test_streaming_window_matches_batch(spark, tmp_path):
    stream, batch = _stream_events(spark, tmp_path)
    agg = {"n": F.count(F.lit(1)), "total": F.round(F.sum("value"), 2)}

    out = system_window_stream(
        stream,
        ts="ts",
        size="1 hour",
        allowed_lateness="10 minutes",
        keys=[F.col("event_type")],
        aggs=agg,
    )
    name = _run_to_memory(out, mode="append")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total"])
        for r in spark.table(name).collect()
    }

    expected_df = system_window_stream(
        batch, ts="ts", size="1 hour", keys=[F.col("event_type")], aggs=agg
    )
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total"])
        for r in expected_df.collect()
    }
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result exactly, and most
    # windows must have been emitted (the tail stays open).
    assert got, "no windows emitted"
    for key, val in got.items():
        assert expected[key] == val, key
    # windows newer than the final watermark (≈ the last file's span)
    # stay open and unemitted — everything else must have flushed
    assert len(got) >= len(expected) * 0.7


def test_streaming_sliding_window(spark, tmp_path):
    stream, batch = _stream_events(spark, tmp_path)
    out = system_window_stream(
        stream,
        ts="ts",
        size="1 hour",
        slide="30 minutes",
        allowed_lateness="5 minutes",
        aggs={"n": F.count(F.lit(1))},
    )
    name = _run_to_memory(out)
    rows = spark.table(name).collect()
    assert rows
    # every event lands in two windows: emitted counts must be half of
    # the doubled row total for fully-closed regions; spot-check that
    # window bounds are 1h wide and starts align to 30m
    for r in rows[:50]:
        delta = r["window_end_timestamp"] - r["window_start"]
        assert delta.total_seconds() == 3600
        assert r["window_start"].minute in (0, 30)


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    batch = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    dup = batch.unionByName(batch)  # every row duplicated
    src = str(tmp_path / "dedupe_src")
    # in-order source: both copies of a row share a ts, so they land in
    # the same time slice and arrive inside the watermark horizon
    _write_time_ordered(dup, "ts", src, 3)
    stream = (
        spark.readStream.schema(dup.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_dedupe(
        stream, keys=["event_id"], ts="ts", within="2 hours"
    )
    name = _run_to_memory(out)
    got = spark.table(name).collect()
    n_unique = batch.count()
    assert len(got) == n_unique
    assert len({r["event_id"] for r in got}) == n_unique


def test_batch_fallback_paths(spark):
    batch = load_table(spark, SF, "events")
    w = system_window_stream(
        batch, ts="ts", size="1 hour", aggs={"n": F.count(F.lit(1))}
    )
    assert w.count() > 0
    d = streaming_dedupe(batch, keys=["user_id"])
    assert d.count() == batch.select("user_id").distinct().count()


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState running counters: state accumulates
    across micro-batches and matches the batch ground truth."""
    from connect_spark.streaming.stateful import running_totals

    batch = load_table(spark, SF, "events").select("event_type", "value")
    src = str(tmp_path / "stateful_src")
    _write_time_ordered(
        load_table(spark, SF, "events"), "ts", src, 3
    )
    stream = (
        spark.readStream.schema(load_table(spark, SF, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals(stream, "event_type", "value")
    name = "st" + __import__("uuid").uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    # the LAST emission per key must equal the batch totals
    last = {}
    for r in rows:
        last[r["key"]] = (r["running_count"], r["running_total"])
    expected = {
        r["event_type"]: (r["n"], r["t"])
        for r in batch.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
        )
        .collect()
    }
    assert {k: v[0] for k, v in last.items()} == {
        k: v[0] for k, v in expected.items()
    }
    for k in expected:
        assert abs(last[k][1] - expected[k][1]) < 0.05
    # state accumulated over multiple batches (multiple emissions/key)
    assert len(rows) > len(expected)


def test_streaming_session_windows(spark, tmp_path):
    """Session windows (session_gap) over the in-order stream."""
    batch = load_table(spark, SF, "events")
    src = str(tmp_path / "sess_src")
    _write_time_ordered(batch, "ts", src, 3)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = system_window_stream(
        stream,
        ts="ts",
        session_gap="5 minutes",
        allowed_lateness="1 minute",
        keys=[F.col("user_id")],
        aggs={"n": F.count(F.lit(1))},
    )
    name = _run_to_memory(out)
    rows = spark.table(name).collect()
    assert rows
    # compare emitted sessions against batch session_window result
    expected = {
        (r["user_id"], str(r["window_start"])): r["n"]
        for r in system_window_stream(
            batch, ts="ts", session_gap="5 minutes",
            keys=[F.col("user_id")], aggs={"n": F.count(F.lit(1))},
        ).collect()
    }
    for r in rows:
        key = (r["user_id"], str(r["window_start"]))
        assert expected.get(key) == r["n"], key


def test_streaming_running_totals_carries_state_across_batches(spark):
    """The gate query must exercise REAL multi-batch state: with 4
    staged files and maxFilesPerTrigger=1, most keys appear in several
    micro-batches, so the update-mode sink holds more rows than keys
    and running counts increase monotonically per key."""
    from connect_spark.queries.streaming_q import streaming_running_totals

    sf = "/root/testdata/sf0.001"
    out = streaming_running_totals(spark, sf)
    rows = out.collect()
    n_keys = len(rows)
    ev = spark.read.parquet(sf + "/events.parquet")
    per_user = {
        r["user_id"]: (r["cnt"], float(r["s"]))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("s"))
        .collect()
    }
    assert n_keys == len(per_user)
    for r in rows:
        assert r["running_count"] == per_user[r["user_id"]][0]
        assert abs(r["running_total"] - round(per_user[r["user_id"]][1], 2)) < 1e-9
