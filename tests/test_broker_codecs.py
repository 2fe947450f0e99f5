"""Wire codecs for NSQ / beanstalkd / ZMTP / SP / Pulsar recorded
sessions (functions/broker_codecs.py, functions/pulsar_codec.py)."""
from __future__ import annotations

import pytest

from connect_spark.functions.broker_codecs import (
    decode_beanstalkd_stream,
    decode_nsq_stream,
    decode_sp_stream,
    decode_zmtp_stream,
    encode_beanstalkd_reply,
    encode_beanstalkd_reserved,
    encode_nsq_message,
    encode_nsq_response,
    encode_sp_handshake,
    encode_sp_message,
    encode_zmtp_frame,
    encode_zmtp_greeting,
    encode_zmtp_message,
)
from connect_spark.functions.pulsar_codec import (
    TYPE_CONNECTED,
    TYPE_PING,
    decode_stream as decode_pulsar_stream,
    encode_message_frame,
    encode_simple_command,
)


# --- NSQ ---

def test_nsq_roundtrip_with_heartbeats():
    wire = (
        b"  V2"
        + encode_nsq_response(b"OK")
        + encode_nsq_message(1_700_000_000_000_000_000, 1,
                             "0123456789abcdef", b"hello")
        + encode_nsq_response(b"_heartbeat_")
        + encode_nsq_message(1_700_000_000_000_000_001, 3,
                             "fedcba9876543210", b"world")
    )
    got = list(decode_nsq_stream(wire))
    assert [m["body"] for m in got] == [b"hello", b"world"]
    assert got[0]["message_id"] == "0123456789abcdef"
    assert got[1]["attempts"] == 3
    assert got[0]["timestamp_ns"] == 1_700_000_000_000_000_000


def test_nsq_error_frame_raises():
    import struct

    err = struct.pack(">iI", 4 + 9, 1) + b"E_BAD_MSG"
    with pytest.raises(ValueError, match="E_BAD_MSG"):
        list(decode_nsq_stream(err))


def test_nsq_truncated_raises():
    wire = encode_nsq_message(0, 1, "0123456789abcdef", b"xy")
    with pytest.raises(ValueError):
        list(decode_nsq_stream(wire[:-1]))


# --- beanstalkd ---

def test_beanstalkd_reserved_jobs():
    wire = (
        encode_beanstalkd_reply("USING default")
        + encode_beanstalkd_reply("WATCHING 2")
        + encode_beanstalkd_reserved(42, b"job body\r\nwith crlf")
        + encode_beanstalkd_reply("TIMED_OUT")
        + encode_beanstalkd_reserved(43, b"")
    )
    got = list(decode_beanstalkd_stream(wire))
    assert [(j["job_id"], j["body"]) for j in got] == [
        (42, b"job body\r\nwith crlf"), (43, b"")]


def test_beanstalkd_ok_yaml_body_skipped():
    yaml = b"---\n- default\n"
    wire = (b"OK %d\r\n%s\r\n" % (len(yaml), yaml)
            + encode_beanstalkd_reserved(1, b"x"))
    got = list(decode_beanstalkd_stream(wire))
    assert [(j["job_id"], j["body"]) for j in got] == [(1, b"x")]


def test_beanstalkd_truncated_body_raises():
    wire = b"RESERVED 1 10\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        list(decode_beanstalkd_stream(wire))


def test_beanstalkd_unknown_reply_raises():
    with pytest.raises(ValueError, match="unknown reply"):
        list(decode_beanstalkd_stream(b"WHATEVER 1\r\n"))


# --- ZMTP ---

def test_zmtp_multipart_and_commands():
    ready = encode_zmtp_frame(b"\x05READY", command=True)
    wire = (
        encode_zmtp_greeting()
        + ready
        + encode_zmtp_message([b"topic.a", b"payload-1"])
        + encode_zmtp_message([b"single"])
    )
    got = list(decode_zmtp_stream(wire))
    assert got == [[b"topic.a", b"payload-1"], [b"single"]]


def test_zmtp_long_frame():
    big = b"z" * 300
    wire = encode_zmtp_message([big])
    assert wire[0] & 0x02  # LONG flag
    assert list(decode_zmtp_stream(wire)) == [[big]]


def test_zmtp_mid_message_truncation_raises():
    wire = encode_zmtp_message([b"a", b"b"])
    # drop the final (MORE=0) frame
    with pytest.raises(ValueError):
        list(decode_zmtp_stream(wire[:3]))


# --- nanomsg SP ---

def test_sp_stream_roundtrip():
    wire = (encode_sp_handshake()
            + encode_sp_message(b"first")
            + encode_sp_message(b"")
            + encode_sp_message(b"third"))
    assert list(decode_sp_stream(wire)) == [b"first", b"", b"third"]


def test_sp_truncated_raises():
    wire = encode_sp_message(b"payload")
    with pytest.raises(ValueError):
        list(decode_sp_stream(wire[:-2]))


# --- Pulsar ---

def test_pulsar_message_roundtrip():
    wire = (
        encode_simple_command({"type": TYPE_CONNECTED})
        + encode_message_frame(
            consumer_id=1, ledger_id=7, entry_id=3,
            producer_name="prod-1", sequence_id=11,
            publish_time_ms=1_700_000_000_000,
            partition_key="pk", properties={"a": "1", "b": "2"},
            payload=b'{"v":1}')
        + encode_simple_command({"type": TYPE_PING})
        + encode_message_frame(
            consumer_id=1, ledger_id=7, entry_id=4,
            producer_name="prod-1", sequence_id=12,
            publish_time_ms=1_700_000_000_001, payload=b"raw")
    )
    got = list(decode_pulsar_stream(wire))
    assert len(got) == 2
    m = got[0]
    assert (m["ledger_id"], m["entry_id"]) == (7, 3)
    assert m["producer_name"] == "prod-1"
    assert m["publish_time_ms"] == 1_700_000_000_000
    assert m["partition_key"] == "pk"
    assert m["properties"] == {"a": "1", "b": "2"}
    assert m["payload"] == b'{"v":1}'
    assert got[1]["payload"] == b"raw"
    assert got[1]["partition_key"] is None


def test_pulsar_checksum_verified():
    wire = encode_message_frame(
        consumer_id=1, ledger_id=1, entry_id=1, producer_name="p",
        sequence_id=1, publish_time_ms=0, payload=b"x",
        corrupt_checksum=True)
    with pytest.raises(ValueError, match="CRC32C"):
        list(decode_pulsar_stream(wire))


def test_pulsar_truncated_raises():
    wire = encode_message_frame(
        consumer_id=1, ledger_id=1, entry_id=1, producer_name="p",
        sequence_id=1, publish_time_ms=0, payload=b"x")
    with pytest.raises(ValueError):
        list(decode_pulsar_stream(wire[:-3]))


# --- session_path input kinds (plans/mq_ext.py) ---

def _session_df(spark, tmp_path, kind, fname, wire, conf=None):
    from connect_spark.plans.pipeline import Pipeline

    d = tmp_path / "sess"
    d.mkdir(exist_ok=True)
    (d / fname).write_bytes(wire)
    c = {"session_path": str(d), **(conf or {})}
    return Pipeline(spark, {"input": {kind: c}}).dataframe()


def test_nsq_input_kind_session_path(spark, tmp_path):
    wire = (
        encode_nsq_response(b"OK")
        + encode_nsq_message(1_700_000_000_000_000_000, 2,
                             "0123456789abcdef", b'{"n": 1}')
    )
    df = _session_df(spark, tmp_path, "nsq", "cap.nsq", wire,
                     {"topic": "t", "channel": "ch"})
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].content == '{"n": 1}'
    assert rows[0]._meta["nsq_id"] == "0123456789abcdef"
    assert rows[0]._meta["nsq_attempts"] == "2"


def test_beanstalkd_input_kind_session_path(spark, tmp_path):
    wire = (encode_beanstalkd_reply("WATCHING 1")
            + encode_beanstalkd_reserved(7, b"job-7"))
    df = _session_df(spark, tmp_path, "beanstalkd", "cap.beanstalkd",
                     wire, {"tube": "jobs"})
    rows = df.collect()
    assert rows[0].content == "job-7"
    assert rows[0]._meta["beanstalkd_job_id"] == "7"


def test_zmq4_input_kind_session_path(spark, tmp_path):
    wire = (encode_zmtp_greeting()
            + encode_zmtp_message([b"topic.x", b"payload"]))
    df = _session_df(spark, tmp_path, "zmq4", "cap.zmtp", wire,
                     {"sub_filters": ["topic."]})
    rows = df.collect()
    assert rows[0].content == "payload"
    assert rows[0]._meta["zmq_topic"] == "topic.x"


def test_nanomsg_input_kind_session_path(spark, tmp_path):
    wire = encode_sp_handshake() + encode_sp_message(b"nm-payload")
    df = _session_df(spark, tmp_path, "nanomsg", "cap.sp", wire,
                     {"sub_filters": ["x"]})
    assert df.collect()[0].content == "nm-payload"


def test_pulsar_input_kind_session_path(spark, tmp_path):
    wire = encode_message_frame(
        consumer_id=1, ledger_id=9, entry_id=2, producer_name="p1",
        sequence_id=5, publish_time_ms=1_700_000_000_500,
        partition_key="k1", properties={"env": "prod"},
        payload=b'{"x": 1}')
    df = _session_df(spark, tmp_path, "pulsar", "cap.pulsar", wire,
                     {"topics": ["t"]})
    rows = df.collect()
    m = rows[0]._meta
    assert rows[0].content == '{"x": 1}'
    assert m["pulsar_message_id"] == "9:2"
    assert m["pulsar_publish_time_unix"] == "1700000000"
    assert m["pulsar_key"] == "k1" and m["env"] == "prod"


def test_amqp1_input_kind_session_path(spark, tmp_path):
    from connect_spark.functions.amqp1_codec import (
        encode_message,
        encode_transfer,
    )

    msg = encode_message(
        message_id="m1", subject="created",
        content_type="application/json",
        application_properties={"region": "emea"},
        data=b'{"ok": true}')
    wire = encode_transfer(0, 1, 3, b"t3", msg, max_frame_payload=64)
    df = _session_df(spark, tmp_path, "amqp_1", "cap.amqp1", wire,
                     {"source_address": "queue://q"})
    rows = df.collect()
    m = rows[0]._meta
    assert rows[0].content == '{"ok": true}'
    assert m["amqp_subject"] == "created"
    assert m["amqp_content_type"] == "application/json"
    assert m["region"] == "emea" and m["amqp_delivery_id"] == "3"
