"""Kafka transactional semantics: control markers + read_committed
(functions/kafka_records.py, KIP-98)."""
from __future__ import annotations

import pytest

from connect_spark.functions.kafka_records import (
    CONTROL_ABORT,
    CONTROL_COMMIT,
    KafkaRecord,
    decode_batch,
    decode_segment,
    decode_segment_read_committed,
    encode_batch,
    encode_control_batch,
    parse_control_record,
)


def _recs(offsets, tag):
    return [
        KafkaRecord(offset=o, timestamp_ms=1_700_000_000_000 + o,
                    key=b"k%d" % o, value=b"%s-%d" % (tag, o))
        for o in offsets
    ]


def test_control_batch_roundtrip():
    seg = encode_control_batch(10, producer_id=7, commit=True)
    batch, nxt = decode_batch(seg, 0)
    assert nxt == len(seg)
    assert batch["control"] and batch["producer_id"] == 7
    assert parse_control_record(batch["records"][0]) == CONTROL_COMMIT
    seg = encode_control_batch(11, producer_id=7, commit=False)
    batch, _ = decode_batch(seg, 0)
    assert parse_control_record(batch["records"][0]) == CONTROL_ABORT


def test_read_committed_drops_aborted_txn():
    seg = (
        encode_batch(_recs([0, 1], b"txn"), base_offset=0,
                     producer_id=5, transactional=True)
        + encode_batch(_recs([2], b"plain"), base_offset=2)
        + encode_control_batch(3, producer_id=5, commit=False)
    )
    got = decode_segment_read_committed(seg)
    assert [r.offset for r in got] == [2]
    # read_uncommitted still sees the aborted rows
    assert [r.offset for r in decode_segment(seg)] == [0, 1, 2]


def test_read_committed_interleaved_producers():
    seg = (
        encode_batch(_recs([0, 1], b"a"), 0, producer_id=1,
                     transactional=True)
        + encode_batch(_recs([2, 3], b"b"), 2, producer_id=2,
                       transactional=True)
        + encode_batch(_recs([4], b"a"), 4, producer_id=1,
                       transactional=True)
        + encode_control_batch(5, producer_id=1, commit=False)
        + encode_control_batch(6, producer_id=2, commit=True)
    )
    got = decode_segment_read_committed(seg)
    # producer 1's whole txn (offsets 0,1,4) dropped; producer 2 kept
    assert [r.offset for r in got] == [2, 3]
    assert all(r.value.startswith(b"b") for r in got)


def test_marker_scopes_to_records_since_previous_marker():
    seg = (
        encode_batch(_recs([0], b"t1"), 0, producer_id=9,
                     transactional=True)
        + encode_control_batch(1, producer_id=9, commit=True)
        + encode_batch(_recs([2], b"t2"), 2, producer_id=9,
                       transactional=True)
        + encode_control_batch(3, producer_id=9, commit=False)
    )
    got = decode_segment_read_committed(seg)
    # first txn committed, second (same pid) aborted
    assert [r.offset for r in got] == [0]


def test_open_transaction_withheld_past_lso():
    seg = (
        encode_batch(_recs([0], b"plain"), 0)
        + encode_batch(_recs([1, 2], b"open"), 1, producer_id=3,
                       transactional=True)
    )
    got = decode_segment_read_committed(seg)
    assert [r.offset for r in got] == [0]


def test_offset_order_across_txn_boundaries():
    seg = (
        encode_batch(_recs([0], b"t"), 0, producer_id=1,
                     transactional=True)
        + encode_batch(_recs([1], b"plain"), 1)
        + encode_control_batch(2, producer_id=1, commit=True)
    )
    got = decode_segment_read_committed(seg)
    assert [r.offset for r in got] == [0, 1]


def test_log_segment_input_isolation_level(spark, tmp_path):
    from connect_spark.sources.kafka import kafka_log_segment_input

    seg = (
        encode_batch(_recs([0, 1], b"txn"), 0, producer_id=5,
                     transactional=True)
        + encode_batch(_recs([2], b"plain"), 2)
        + encode_control_batch(3, producer_id=5, commit=False)
    )
    d = tmp_path / "topic-0"
    d.mkdir()
    (d / "00000000000000000000.log").write_bytes(seg)
    committed = kafka_log_segment_input(
        spark, {"path": str(tmp_path),
                "isolation_level": "read_committed"})
    assert [r["offset"] for r in committed.collect()] == [2]
    everything = kafka_log_segment_input(spark, {"path": str(tmp_path)})
    assert sorted(r["offset"] for r in everything.collect()) == [0, 1, 2]
    with pytest.raises(ValueError):
        kafka_log_segment_input(
            spark, {"path": str(tmp_path), "isolation_level": "bogus"})


def test_malformed_control_key_raises():
    with pytest.raises(ValueError):
        parse_control_record(KafkaRecord(0, 0, b"\x00", b""))
    with pytest.raises(ValueError):
        parse_control_record(
            KafkaRecord(0, 0, b"\x00\x01\x00\x05", b""))
