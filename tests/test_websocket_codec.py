"""RFC 6455 websocket codec (functions/websocket_codec.py)."""
from __future__ import annotations

import pytest

from connect_spark.functions.websocket_codec import (
    OP_BINARY,
    OP_CLOSE,
    OP_PING,
    OP_TEXT,
    accept_key,
    decode_session,
    encode_frame,
    encode_message,
)


def test_accept_key_rfc_example():
    # the worked example in RFC 6455 §1.3
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_single_text_frame_roundtrip():
    wire = encode_frame("hello".encode(), OP_TEXT)
    got = list(decode_session(wire))
    assert len(got) == 1
    assert got[0].opcode == OP_TEXT and got[0].text == "hello"


def test_masked_client_frame():
    wire = encode_frame(b"masked!", OP_TEXT, mask=b"\x12\x34\x56\x78")
    got = list(decode_session(wire))
    assert got[0].payload == b"masked!"


@pytest.mark.parametrize("size", [125, 126, 65535, 65536, 100_000])
def test_length_encodings(size):
    payload = bytes(i % 251 for i in range(size))
    wire = encode_frame(payload, OP_BINARY)
    got = list(decode_session(wire))
    assert got[0].payload == payload


def test_fragmented_message_reassembles():
    wire = encode_message(b"x" * 1000, OP_BINARY, max_fragment=300)
    assert wire[0] & 0x80 == 0  # first frame FIN clear
    got = list(decode_session(wire))
    assert len(got) == 1 and got[0].payload == b"x" * 1000


def test_ping_interleaves_fragments():
    w = bytearray()
    w += encode_frame(b"ab", OP_TEXT, fin=False)
    w += encode_frame(b"", OP_PING)
    w += encode_frame(b"cd", 0x0, fin=True)  # continuation
    got = list(decode_session(bytes(w)))
    assert got[0].payload == b"abcd"


def test_close_ends_stream():
    w = (encode_frame(b"one", OP_TEXT)
         + encode_frame(b"\x03\xe8", OP_CLOSE)
         + encode_frame(b"never", OP_TEXT))
    got = list(decode_session(w))
    assert [m.payload for m in got] == [b"one"]


def test_handshake_skipped():
    hs = (b"HTTP/1.1 101 Switching Protocols\r\n"
          b"Upgrade: websocket\r\n"
          b"Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo=\r\n\r\n")
    wire = hs + encode_frame(b"data", OP_TEXT)
    assert list(decode_session(wire))[0].payload == b"data"


def test_errors():
    with pytest.raises(ValueError, match="truncated"):
        list(decode_session(encode_frame(b"abcdef", OP_TEXT)[:-2]))
    with pytest.raises(ValueError, match="mid-message"):
        list(decode_session(encode_frame(b"a", OP_TEXT, fin=False)))
    with pytest.raises(ValueError, match="no message open"):
        list(decode_session(encode_frame(b"a", 0x0, fin=True)))


def test_websocket_input_kind_session_path(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    d = tmp_path / "sess"
    d.mkdir()
    wire = (encode_frame(b'{"a": 1}', OP_TEXT)
            + encode_message(b"B" * 500, OP_BINARY, max_fragment=200))
    (d / "cap.ws").write_bytes(wire)
    df = Pipeline(spark, {"input": {"websocket": {
        "session_path": str(d), "url": "ws://x"}}}).dataframe()
    rows = sorted(df.collect(), key=lambda r: r.content)
    assert rows[1].content == '{"a": 1}'
    assert rows[1]._meta["websocket_opcode"] == "text"
    assert rows[0].content == "B" * 500
    assert rows[0]._meta["websocket_opcode"] == "binary"
