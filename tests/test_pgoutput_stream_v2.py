"""pgoutput protocol v2: streamed in-progress transactions
(PG 14 `streaming` option — StreamStart/Stop/Commit/Abort, xid-
prefixed content messages)."""
from __future__ import annotations

import pytest

from connect_spark.sources.pgoutput import (
    OID_INT8,
    OID_TEXT,
    PgoutputFixtureWriter,
    decode_pgoutput_bytes,
)

COLS = [("id", OID_INT8), ("name", OID_TEXT)]


def _decode(w):
    return list(decode_pgoutput_bytes(w.getvalue()))


def test_streamed_transaction_emits_at_commit():
    w = PgoutputFixtureWriter()
    w.relation(500, "t", COLS)
    w.stream_start(77)
    w.insert({"id": 1, "name": "a"})
    w.insert({"id": 2, "name": "b"})
    w.stream_stop()
    w.stream_commit(77, commit_ts_us=5_000_000)
    w.copy_done()
    recs = _decode(w)
    ops = [r["operation"] for r in recs]
    assert ops == ["begin", "insert", "insert", "commit"]
    assert recs[1]["after"] == {"id": 1, "name": "a"}
    # commit timestamp stamped on the buffered changes
    assert all(r["commit_ts_ms"] == recs[0]["commit_ts_ms"]
               for r in recs)


def test_streamed_segments_interleave_two_transactions():
    w = PgoutputFixtureWriter()
    w.relation(500, "t", COLS)
    w.stream_start(10)
    w.insert({"id": 1, "name": "t10-a"})
    w.stream_stop()
    w.stream_start(20)
    w.insert({"id": 2, "name": "t20-a"})
    w.stream_stop()
    w.stream_start(10, first_segment=False)
    w.insert({"id": 3, "name": "t10-b"})
    w.stream_stop()
    w.stream_commit(20, commit_ts_us=1_000_000)
    w.stream_commit(10, commit_ts_us=2_000_000)
    w.copy_done()
    recs = [r for r in _decode(w) if r["operation"] == "insert"]
    # txn 20 commits first; txn 10's two segments reunite in order
    assert [r["after"]["name"] for r in recs] == [
        "t20-a", "t10-a", "t10-b"]


def test_stream_abort_whole_transaction_drops_changes():
    w = PgoutputFixtureWriter()
    w.relation(500, "t", COLS)
    w.stream_start(30)
    w.insert({"id": 1, "name": "gone"})
    w.stream_stop()
    w.stream_abort(30)
    w.begin(commit_ts_us=1_000_000)
    w.insert({"id": 2, "name": "kept"})
    w.commit(commit_ts_us=1_000_000)
    w.copy_done()
    recs = [r for r in _decode(w) if r["operation"] == "insert"]
    assert [r["after"]["name"] for r in recs] == ["kept"]


def test_stream_abort_subtransaction_keeps_the_rest():
    w = PgoutputFixtureWriter()
    w.relation(500, "t", COLS)
    w.stream_start(40)
    w.insert({"id": 1, "name": "main"})
    w.stream_sub(41)  # SAVEPOINT: subtransaction changes
    w.insert({"id": 2, "name": "sub"})
    w.stream_sub(40)
    w.insert({"id": 3, "name": "main2"})
    w.stream_stop()
    w.stream_abort(40, sub_xid=41)  # ROLLBACK TO SAVEPOINT
    w.stream_commit(40, commit_ts_us=9_000_000)
    w.copy_done()
    recs = [r for r in _decode(w) if r["operation"] == "insert"]
    assert [r["after"]["name"] for r in recs] == ["main", "main2"]


def test_relation_inside_stream_registers_schema():
    w = PgoutputFixtureWriter()
    w.stream_start(50)
    w.relation(600, "s", COLS)  # Relation carried inside the stream
    w.insert({"id": 9, "name": "x"})
    w.stream_stop()
    w.stream_commit(50, commit_ts_us=1_000_000)
    w.copy_done()
    recs = [r for r in _decode(w) if r["operation"] == "insert"]
    assert recs[0]["table"] == "s" and recs[0]["after"]["id"] == 9
