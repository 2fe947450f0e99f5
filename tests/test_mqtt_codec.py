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


# --- AMQP 0-9-1 -------------------------------------------------------

def test_amqp_session_roundtrip():
    from connect_spark.functions.amqp_codec import (
        AmqpFixtureWriter,
        decode_session as amqp_decode,
    )

    w = AmqpFixtureWriter(frame_max=8)
    w.heartbeat()
    w.deliver(b"hello world over frames", routing_key="orders.us",
              exchange="ex", consumer_tag="c-1", delivery_tag=7,
              content_type="application/json",
              headers={"k": "v", "n": 5, "b": True},
              delivery_mode=2, timestamp=1_700_000_000)
    w.deliver(b"", routing_key="empty.body", delivery_tag=8,
              channel=2)
    dels = list(amqp_decode(w.getvalue()))
    assert len(dels) == 2
    d = dels[0]
    # multi-frame body reassembled (frame_max=8 splits it)
    assert d.body == b"hello world over frames"
    assert d.routing_key == "orders.us" and d.exchange == "ex"
    assert d.delivery_tag == 7 and d.consumer_tag == "c-1"
    assert d.content_type == "application/json"
    assert d.headers == {"k": "v", "n": 5, "b": True}
    assert d.delivery_mode == 2 and d.timestamp == 1_700_000_000
    # zero-size body completes on the header frame
    assert dels[1].body == b"" and dels[1].routing_key == "empty.body"


def test_amqp_frame_end_validation():
    import pytest as _pytest

    from connect_spark.functions.amqp_codec import (
        AmqpFixtureWriter,
        decode_session as amqp_decode,
    )

    w = AmqpFixtureWriter()
    w.deliver(b"x", routing_key="r")
    raw = bytearray(w.getvalue())
    raw[-1] = 0x00  # clobber the last frame-end octet
    with _pytest.raises(ValueError, match="frame-end"):
        list(amqp_decode(bytes(raw)))


def test_amqp_input_kind_session_path(spark, tmp_path):
    from connect_spark.functions.amqp_codec import AmqpFixtureWriter
    from connect_spark.plans.pipeline import Pipeline

    w = AmqpFixtureWriter()
    w.deliver(b'{"id": 1}', routing_key="q.a", delivery_tag=5,
              headers={"trace": "t1"})
    d = tmp_path / "asess"
    d.mkdir()
    (d / "cap-001.amqp").write_bytes(w.getvalue())
    df = Pipeline(spark, {"input": {"amqp_0_9": {
        "session_path": str(d), "queue": "q"}}}).dataframe()
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].content == '{"id": 1}'
    assert rows[0]._meta["amqp_routing_key"] == "q.a"
    assert rows[0]._meta["amqp_delivery_tag"] == "5"
    assert rows[0]._meta["amqp_header_trace"] == "t1"


def test_amqp_all_property_flags_advance_cursor():
    """Properties set BETWEEN the handled ones (content-encoding,
    correlation-id, reply-to, message-id) must not shift later
    property offsets — the full spec §4.2.6.1 flag walk."""
    from connect_spark.functions.amqp_codec import (
        AmqpFixtureWriter,
        decode_session as amqp_decode,
    )

    w = AmqpFixtureWriter()
    w.deliver(b"payload", routing_key="r", delivery_tag=3,
              content_type="text/plain",
              headers={"h": "1"},
              delivery_mode=2,
              correlation_id="corr-99",
              reply_to="amq.reply",
              message_id="msg-7",
              timestamp=1_700_000_123)
    d = list(amqp_decode(w.getvalue()))[0]
    assert d.content_type == "text/plain"
    assert d.headers == {"h": "1"}
    assert d.delivery_mode == 2
    assert d.correlation_id == "corr-99"
    assert d.reply_to == "amq.reply"
    assert d.message_id == "msg-7"
    assert d.timestamp == 1_700_000_123
    assert d.body == b"payload"


def test_nats_hmsg_frames():
    """Headers-enabled NATS deliveries (HMSG) parse the header block
    and payload without desyncing the stream."""
    hdr = b"NATS/1.0\r\nTrace-Id: t-9\r\n\r\n"
    payload = b"MSG looks like a frame"
    total = len(hdr) + len(payload)
    data = (
        b"HMSG sub.h 3 " + str(len(hdr)).encode() + b" "
        + str(total).encode() + b"\r\n" + hdr + payload + b"\r\n"
        + b"MSG sub.t 4 2\r\nok\r\n"
    )
    msgs = list(decode_nats_stream(data))
    assert len(msgs) == 2
    assert msgs[0]["subject"] == "sub.h"
    assert msgs[0]["payload"] == payload
    assert msgs[0]["headers"]["Trace-Id"] == "t-9"
    assert msgs[1]["payload"] == b"ok"


def test_mqtt5_publish_properties_roundtrip():
    """MQTT 5 sessions (protocol level 5): the CONNECT level switches
    the parser; PUBLISH property blocks decode to a dict."""
    w = MqttFixtureWriter()
    w.connect("c5", level=5)
    w.publish("t/a", b'{"v":1}', qos=1, packet_id=3, properties={
        "content_type": "application/json",
        "response_topic": "replies/a",
        "correlation_data": b"\x01\x02",
        "message_expiry": 120,
        "payload_format": 1,
        "user": [("trace", "abc"), ("env", "prod")],
    })
    w.publish("t/b", b"plain")  # v5 publish with no properties
    pkts = [p for p in decode_session(w.getvalue())
            if p.type_name == "publish"]
    p = pkts[0].properties
    assert p["content_type"] == "application/json"
    assert p["response_topic"] == "replies/a"
    assert p["correlation_data"] == b"\x01\x02"
    assert p["message_expiry"] == 120 and p["payload_format"] == 1
    assert p["user"] == [("trace", "abc"), ("env", "prod")]
    assert pkts[0].payload == b'{"v":1}'
    assert pkts[1].properties == {} and pkts[1].payload == b"plain"


def test_mqtt311_sessions_unchanged():
    w = MqttFixtureWriter()
    w.connect("c4")  # level 4: no property blocks anywhere
    w.publish("t", b"x", qos=1, packet_id=9)
    pkts = [p for p in decode_session(w.getvalue())
            if p.type_name == "publish"]
    assert pkts[0].payload == b"x" and pkts[0].properties == {}
