"""AMQP 1.0 wire codec (functions/amqp1_codec.py): type-system
matrix, described types, frame decode, multi-transfer reassembly."""
from __future__ import annotations

import struct
import uuid

import pytest

from connect_spark.functions.amqp1_codec import (
    Amqp1Message,
    Described,
    Symbol,
    Timestamp,
    decode_message_sections,
    decode_session,
    decode_value,
    encode_descriptor,
    encode_frame,
    encode_message,
    encode_transfer,
    encode_ulong,
    encode_value,
)


def rt(v):
    got, i = decode_value(encode_value(v))
    assert i == len(encode_value(v))
    return got


@pytest.mark.parametrize("v", [
    None, True, False, 0, 1, 255, -1, -128, 127, 1 << 20, -(1 << 20),
    (1 << 40), -(1 << 40), 3.5, -0.25,
    "", "hello", "café 日本", "x" * 300,
    b"", b"\x00\xff", b"y" * 300,
    [], [1, "two", None], {"k": 1, "j": "v"},
    uuid.UUID("12345678-1234-5678-1234-567812345678"),
    Timestamp(1_700_000_000_000),
])
def test_primitive_roundtrip(v):
    assert rt(v) == v


def test_symbol_roundtrips_as_symbol():
    got = rt(Symbol("application/json"))
    assert got == "application/json" and isinstance(got, Symbol)
    got_str = rt("application/json")
    assert not isinstance(got_str, Symbol)


def test_nested_compound_roundtrip():
    v = {"a": [1, {"b": [None, True, b"\x01"]}], "c": "d"}
    assert rt(v) == v


def test_large_list_uses_list32():
    v = ["item-%04d" % i for i in range(100)]
    raw = encode_value(v)
    assert raw[0] == 0xD0  # list32
    assert rt(v) == v


def test_described_type_roundtrip():
    d = rt(Described(encode_descriptor(0x73), ["mid", None, "dest"]))
    assert isinstance(d, Described)
    assert d.descriptor == 0x73 and d.value == ["mid", None, "dest"]


def test_compound_size_mismatch_raises():
    raw = bytearray(encode_value([1, 2, 3]))
    raw[1] += 2  # corrupt the size octet
    with pytest.raises(ValueError):
        decode_value(bytes(raw))


def test_truncated_string_raises():
    raw = encode_value("hello world")[:-3]
    with pytest.raises(ValueError):
        decode_value(raw)


def test_message_sections_roundtrip():
    msg = encode_message(
        message_id="m-1", to="queue://orders", subject="created",
        content_type="application/json",
        application_properties={"region": "emea", "attempt": 2},
        data=b'{"ok":true}')
    s = decode_message_sections(msg)
    assert s["properties"][0] == "m-1"
    assert s["properties"][2] == "queue://orders"
    assert s["properties"][3] == "created"
    assert s["properties"][6] == "application/json"
    assert s["application_properties"] == {"region": "emea", "attempt": 2}
    assert s["data"] == b'{"ok":true}'


def test_session_single_transfer():
    msg = encode_message(message_id=7, data=b"payload")
    wire = encode_transfer(0, 1, 100, b"tag-0", msg)
    out = list(decode_session(wire))
    assert len(out) == 1
    m = out[0]
    assert isinstance(m, Amqp1Message)
    assert m.delivery_id == 100 and m.delivery_tag == b"tag-0"
    assert m.message_id == 7 and m.data == b"payload"


def test_session_multi_transfer_reassembly():
    big = b"x" * 2000
    msg = encode_message(message_id="big", data=big)
    wire = encode_transfer(3, 2, 5, b"t5", msg, max_frame_payload=256)
    # really split into multiple frames
    assert wire.count(struct.pack(">BH", 0x00, 3)) >= 8
    out = list(decode_session(wire))
    assert len(out) == 1
    assert out[0].data == big and out[0].message_id == "big"


def test_session_interleaved_channels():
    m1 = encode_message(message_id="a", data=b"A" * 600)
    m2 = encode_message(message_id="b", data=b"B" * 600)
    w1 = encode_transfer(1, 1, 1, b"t1", m1, max_frame_payload=300)
    w2 = encode_transfer(2, 1, 2, b"t2", m2, max_frame_payload=300)
    # interleave frame-by-frame
    def frames(w):
        i, out = 0, []
        while i < len(w):
            (size,) = struct.unpack_from(">I", w, i)
            out.append(w[i:i + size])
            i += size
        return out
    f1, f2 = frames(w1), frames(w2)
    inter = b"".join(x for pair in zip(f1, f2) for x in pair)
    out = sorted(decode_session(inter), key=lambda m: m.delivery_id)
    assert [m.message_id for m in out] == ["a", "b"]
    assert out[0].data == b"A" * 600 and out[1].data == b"B" * 600


def test_session_skips_header_and_plumbing():
    msg = encode_message(message_id=1, value={"k": Symbol("v")})
    open_perf = encode_value(
        Described(encode_descriptor(0x10), ["container-1"]))
    wire = (b"AMQP\x00\x01\x00\x00"
            + encode_frame(0, open_perf)
            + encode_transfer(0, 0, 0, b"t", msg))
    out = list(decode_session(wire))
    assert len(out) == 1 and out[0].value == {"k": "v"}


def test_session_mid_delivery_truncation_raises():
    msg = encode_message(message_id="x", data=b"z" * 1000)
    wire = encode_transfer(0, 0, 0, b"t", msg, max_frame_payload=300)
    (size,) = struct.unpack_from(">I", wire, 0)
    with pytest.raises(ValueError):
        list(decode_session(wire[:size]))  # only the first (more=true)


def test_ulong_compact_forms():
    assert encode_ulong(0) == b"\x44"
    assert encode_ulong(5) == b"\x53\x05"
    v, _ = decode_value(encode_ulong(1 << 32))
    assert v == 1 << 32
