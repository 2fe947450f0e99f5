"""Protobuf wire-format and msgpack codecs: spec golden bytes,
roundtrips over every supported shape, packed repeated fields, unknown
field skipping (internal/impl/protobuf/processor_protobuf.go,
internal/impl/msgpack/processor.go)."""

from __future__ import annotations

from connect_spark.functions import msgpack_codec as mp
from connect_spark.functions import protobuf_codec as pb


def test_protobuf_spec_golden_bytes():
    # protobuf encoding docs: field 1 varint 150 -> 08 96 01
    d = {"fields": {1: {"name": "a", "type": "int64"}}}
    assert pb.encode({"a": 150}, d) == b"\x08\x96\x01"
    # field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
    d2 = {"fields": {2: {"name": "b", "type": "string"}}}
    assert pb.encode({"b": "testing"}, d2) == b"\x12\x07testing"


def test_protobuf_roundtrip_shapes():
    desc = {
        "fields": {
            1: {"name": "i", "type": "int64"},
            2: {"name": "s", "type": "sint64"},
            3: {"name": "d", "type": "double"},
            4: {"name": "f", "type": "float"},
            5: {"name": "b", "type": "bool"},
            6: {"name": "txt", "type": "string"},
            7: {"name": "raw", "type": "bytes"},
            8: {"name": "tags", "type": "string", "repeated": True},
            9: {"name": "inner", "type": "message", "message": {
                "fields": {1: {"name": "x", "type": "int32"}}}},
            10: {"name": "f32", "type": "fixed32"},
            11: {"name": "sf64", "type": "sfixed64"},
        }
    }
    msg = {
        "i": -5, "s": -1234567, "d": 2.5, "f": 0.25, "b": True,
        "txt": "héllo", "raw": b"\x00\x01", "tags": ["x", "y"],
        "inner": {"x": 9}, "f32": 7, "sf64": -8,
    }
    got = pb.decode(pb.encode(msg, desc), desc)
    assert got == msg


def test_protobuf_negative_int_ten_bytes():
    # proto int64 -1 is the 10-byte varint; sint64 -1 is one byte
    d = {"fields": {1: {"name": "a", "type": "int64"}}}
    enc = pb.encode({"a": -1}, d)
    assert len(enc) == 11  # tag + 10-byte varint
    assert pb.decode(enc, d)["a"] == -1


def test_protobuf_packed_and_unknown_fields():
    write_desc = {
        "fields": {
            1: {"name": "known", "type": "int64"},
            2: {"name": "extra", "type": "string"},
        }
    }
    read_desc = {"fields": {1: {"name": "known", "type": "int64"}}}
    enc = pb.encode({"known": 3, "extra": "dropme"}, write_desc)
    assert pb.decode(enc, read_desc) == {"known": 3}

    # packed repeated varints: one length-delimited payload
    import io
    buf = io.BytesIO()
    pb._write_varint(buf, (1 << 3) | 2)
    payload = io.BytesIO()
    for v in (1, 2, 300):
        pb._write_varint(payload, v)
    raw = payload.getvalue()
    pb._write_varint(buf, len(raw))
    buf.write(raw)
    desc = {"fields": {1: {"name": "xs", "type": "int64", "repeated": True}}}
    assert pb.decode(buf.getvalue(), desc) == {"xs": [1, 2, 300]}


def test_msgpack_spec_golden_bytes():
    # msgpack.org front-page example
    assert (
        mp.packb({"compact": True, "schema": 0})
        == b"\x82\xa7compact\xc3\xa6schema\x00"
    )


def test_msgpack_roundtrip_shapes():
    v = {
        "nil": None, "t": True, "f": False,
        "small": 5, "neg": -3, "u8": 200, "u16": 60000, "u32": 70000,
        "u64": 1 << 40, "i8": -100, "i16": -3000, "i32": -70000,
        "i64": -(1 << 40), "d": 3.14159,
        "s": "x" * 40,  # str8
        "arr": list(range(20)),  # array16
        "m": {str(i): i for i in range(20)},  # map16
        "nested": {"a": [1, {"b": None}]},
    }
    assert mp.unpackb(mp.packb(v)) == v


def test_msgpack_bin_types():
    for n in (5, 300, 70000):
        raw = bytes(range(256)) * (n // 256 + 1)
        raw = raw[:n]
        assert mp.unpackb(mp.packb(raw)) == raw
