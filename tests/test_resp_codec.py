"""Redis RESP2 codec over recorded sessions (functions/resp_codec.py)
plus the redis_pubsub / redis_streams inputs on session_path."""

from __future__ import annotations

import pytest

from connect_spark.functions.resp_codec import (
    RespError,
    decode_resp,
    decode_stream,
    encode_resp,
    pubsub_messages,
    xread_entries,
)


def test_resp_scalar_roundtrips():
    for v in ["OK", 42, -7, b"bulk bytes", None,
              [b"a", 1, None, [b"nested"]], []]:
        raw = encode_resp(v)
        got, used = decode_resp(raw)
        assert got == v and used == len(raw)
    err, _ = decode_resp(b"-ERR bad command\r\n")
    assert isinstance(err, RespError) and "bad command" in err


def test_resp_bulk_with_crlf_payload():
    raw = encode_resp(b"line1\r\nline2")
    got, _ = decode_resp(raw)
    assert got == b"line1\r\nline2"


def test_pubsub_messages():
    data = (
        encode_resp([b"subscribe", b"news", 1])
        + encode_resp([b"message", b"news", b"hello"])
        + encode_resp([b"pmessage", b"n*", b"news.eu", b"bonjour"])
        + encode_resp([b"unsubscribe", b"news", 0])
    )
    msgs = list(pubsub_messages(data))
    assert len(msgs) == 2
    assert msgs[0] == {"channel": "news", "pattern": None,
                       "payload": b"hello"}
    assert msgs[1]["channel"] == "news.eu"
    assert msgs[1]["pattern"] == "n*"


def test_xread_entries():
    reply = encode_resp([
        [b"events", [
            [b"1700000000000-0", [b"body", b"p1", b"kind", b"click"]],
            [b"1700000000001-0", [b"body", b"p2"]],
        ]],
    ])
    entries = list(xread_entries(reply))
    assert len(entries) == 2
    assert entries[0] == {"stream": "events", "id": "1700000000000-0",
                          "fields": {"body": "p1", "kind": "click"}}


def test_redis_pubsub_input_session_path(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    d = tmp_path / "rsess"
    d.mkdir()
    (d / "cap.resp").write_bytes(
        encode_resp([b"subscribe", b"c1", 1])
        + encode_resp([b"message", b"c1", b"payload-1"]))
    df = Pipeline(spark, {"input": {"redis_pubsub": {
        "session_path": str(d), "channels": ["c1"]}}}).dataframe()
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].content == "payload-1"
    assert rows[0]._meta["redis_pubsub_channel"] == "c1"


def test_redis_streams_input_session_path(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    d = tmp_path / "xsess"
    d.mkdir()
    (d / "cap.resp").write_bytes(encode_resp([
        [b"orders", [[b"1-1", [b"body", b"o1", b"region", b"eu"]]]],
    ]))
    df = Pipeline(spark, {"input": {"redis_streams": {
        "session_path": str(d), "streams": ["orders"],
        "body_key": "body"}}}).dataframe()
    rows = df.collect()
    assert rows[0].content == "o1"
    assert rows[0]._meta["region"] == "eu"
    assert rows[0]._meta["redis_stream"] == "orders"
    assert rows[0]._meta["redis_stream_id"] == "1-1"


def test_resp3_types_decode():
    from connect_spark.functions.resp_codec import (
        RespPush,
        decode_resp,
        decode_stream,
    )

    assert decode_resp(b"_\r\n")[0] is None
    assert decode_resp(b"#t\r\n")[0] is True
    assert decode_resp(b"#f\r\n")[0] is False
    assert decode_resp(b",3.25\r\n")[0] == 3.25
    assert decode_resp(b"(12345678901234567890\r\n")[0] == \
        12345678901234567890
    m, _ = decode_resp(b"%2\r\n$1\r\na\r\n:1\r\n$1\r\nb\r\n:2\r\n")
    assert m == {"a": 1, "b": 2}
    s, _ = decode_resp(b"~2\r\n:1\r\n:2\r\n")
    assert s == [1, 2]
    v, _ = decode_resp(b"=15\r\ntxt:Some string\r\n")
    assert v == b"Some string"
    p, _ = decode_resp(b">3\r\n$7\r\nmessage\r\n$2\r\nch\r\n$2\r\nhi\r\n")
    assert isinstance(p, RespPush) and p[2] == b"hi"
    # mixed RESP2/RESP3 stream decodes end to end
    wire = b":1\r\n_\r\n%1\r\n$1\r\nk\r\n#t\r\n"
    assert list(decode_stream(wire)) == [1, None, {"k": True}]


def test_resp3_push_framed_pubsub():
    from connect_spark.functions.resp_codec import pubsub_messages

    wire = (b">3\r\n$7\r\nmessage\r\n$4\r\nnews\r\n$5\r\nhello\r\n"
            b">4\r\n$8\r\npmessage\r\n$3\r\nn.*\r\n$5\r\nnews2\r\n"
            b"$2\r\nok\r\n")
    got = list(pubsub_messages(wire))
    assert got[0] == {"channel": "news", "pattern": None,
                      "payload": b"hello"}
    assert got[1]["pattern"] == "n.*" and got[1]["payload"] == b"ok"
