"""MQTT 3.1.1 packet codec + NATS text protocol over recorded
sessions (functions/mqtt_codec.py), and the mqtt/nats input kinds
consuming session_path recordings."""

from __future__ import annotations

import pytest

from connect_spark.functions.mqtt_codec import (
    MqttFixtureWriter,
    decode_nats_stream,
    decode_session,
)


def test_mqtt_session_roundtrip():
    w = MqttFixtureWriter()
    w.connect("client-1")
    w.connack()
    w.subscribe(7, [("sensors/+/temp", 1)])
    w.publish("sensors/a/temp", b"21.5", qos=0, retain=True)
    w.publish("sensors/b/temp", b"19.0", qos=1, packet_id=42,
              dup=True)
    w.puback(42)
    w.pingreq()
    w.disconnect()
    pkts = list(decode_session(w.getvalue()))
    names = [p.type_name for p in pkts]
    assert names == ["connect", "connack", "subscribe", "publish",
                     "publish", "puback", "pingreq", "disconnect"]
    assert pkts[0].client_id == "client-1"
    assert pkts[2].packet_id == 7
    assert pkts[2].topics == [("sensors/+/temp", 1)]
    p0, p1 = pkts[3], pkts[4]
    assert p0.topic == "sensors/a/temp" and p0.payload == b"21.5"
    assert p0.retain is True and p0.qos == 0 and p0.packet_id is None
    assert p1.qos == 1 and p1.packet_id == 42 and p1.dup is True


def test_mqtt_large_payload_varint_length():
    w = MqttFixtureWriter()
    big = bytes(range(256)) * 800  # > 127 and > 16383 remaining length
    w.publish("big/topic", big)
    pkts = list(decode_session(w.getvalue()))
    assert pkts[0].payload == big


def test_mqtt_bad_protocol_name():
    raw = bytearray()
    body = b"\x00\x04MQTX" + bytes([4, 2, 0, 60]) + b"\x00\x01c"
    raw += bytes([0x10, len(body)]) + body
    with pytest.raises(ValueError, match="protocol name"):
        list(decode_session(bytes(raw)))


def test_nats_stream_decode():
    data = (
        b'INFO {"server_id":"x"}\r\n'
        b"PING\r\n"
        b"MSG orders.us 1 10\r\n{\"id\": 42}\r\n"
        b"MSG orders.eu 2 reply.to 2\r\nhi\r\n"
        b"+OK\r\n"
    )
    msgs = list(decode_nats_stream(data))
    assert len(msgs) == 2
    assert msgs[0]["subject"] == "orders.us"
    assert msgs[0]["payload"] == b'{"id": 42}'
    assert msgs[0]["reply"] is None
    assert msgs[1]["reply"] == "reply.to"
    assert msgs[1]["payload"] == b"hi"


def test_mqtt_input_kind_session_path(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    w = MqttFixtureWriter()
    w.connect("rec")
    w.publish("t/a", b'{"v": 1}', qos=1, packet_id=9)
    w.publish("t/b", b'{"v": 2}')
    d = tmp_path / "sess"
    d.mkdir()
    (d / "cap-001.mqtt").write_bytes(w.getvalue())
    df = Pipeline(spark, {"input": {"mqtt": {
        "session_path": str(d), "topics": ["t/#"]}}}).dataframe()
    rows = sorted(df.collect(), key=lambda r: r._meta["mqtt_topic"])
    assert [r._meta["mqtt_topic"] for r in rows] == ["t/a", "t/b"]
    assert rows[0]._meta["mqtt_qos"] == "1"
    assert rows[0]._meta["mqtt_message_id"] == "9"
    assert rows[0].content == '{"v": 1}'


def test_nats_input_kind_session_path(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    d = tmp_path / "nsess"
    d.mkdir()
    (d / "cap-001.nats").write_bytes(
        b"MSG sub.a 1 5\r\nhello\r\nPONG\r\nMSG sub.b 2 5\r\nworld\r\n")
    df = Pipeline(spark, {"input": {"nats": {
        "session_path": str(d), "subject": "sub.>"}}}).dataframe()
    rows = sorted(df.collect(), key=lambda r: r._meta["nats_subject"])
    assert [r.content for r in rows] == ["hello", "world"]
    assert rows[0]._meta["nats_subject"] == "sub.a"
