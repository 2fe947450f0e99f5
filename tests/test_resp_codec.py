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
