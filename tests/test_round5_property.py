"""Property tests (hypothesis) for the round-5 wire codecs that the
round-6 additions build on: snappy/LZ4 block compression (the Kafka
batch codecs ride these), RecordBatch v2 roundtrips across codecs,
RESP value framing, and the Avro resolution identity (reader ==
writer must decode exactly like plain decode)."""
from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.functions.lz4_codec import (
    compress as lz4_compress,
    decompress as lz4_decompress,
)
from connect_spark.functions.snappy_codec import (
    compress as snappy_compress,
    decompress as snappy_decompress,
)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=10_000))
def test_snappy_roundtrips_any_bytes(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.one_of(
    st.binary(max_size=10_000),
    # highly repetitive inputs exercise the match/copy paths
    st.builds(lambda b, n: b * n, st.binary(min_size=1, max_size=20),
              st.integers(1, 500)),
))
def test_lz4_roundtrips_any_bytes(data):
    assert lz4_decompress(lz4_compress(data)) == data


_records = st.lists(
    st.tuples(
        st.one_of(st.none(), st.binary(max_size=40)),   # key
        st.one_of(st.none(), st.binary(max_size=200)),  # value
        st.lists(st.tuples(
            st.text(max_size=10),
            st.one_of(st.none(), st.binary(max_size=20))), max_size=3),
    ),
    min_size=1, max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(_records, st.sampled_from([0, 1, 2, 3]))
def test_kafka_batch_roundtrips_any_records(rows, codec):
    from connect_spark.functions.kafka_records import (
        KafkaRecord,
        decode_segment,
        encode_batch,
    )

    recs = [
        KafkaRecord(offset=100 + i, timestamp_ms=1_700_000_000_000 + i,
                    key=k, value=v, headers=list(h))
        for i, (k, v, h) in enumerate(rows)
    ]
    seg = encode_batch(recs, base_offset=100, codec=codec)
    got = list(decode_segment(seg))
    assert [(r.offset, r.key, r.value, r.headers) for r in got] == [
        (r.offset, r.key, r.value, r.headers) for r in recs]


_resp_values = st.recursive(
    st.one_of(
        st.none(),
        st.integers(min_value=-(2 ** 60), max_value=2 ** 60),
        st.binary(max_size=60),
    ),
    lambda kids: st.lists(kids, max_size=5),
    max_leaves=15,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_resp_values, max_size=6))
def test_resp_stream_roundtrips(values):
    from connect_spark.functions.resp_codec import (
        decode_stream,
        encode_resp,
    )

    wire = b"".join(encode_resp(v) for v in values)
    assert list(decode_stream(wire)) == values


_avro_rec = st.fixed_dictionaries({
    "a": st.integers(min_value=-(2 ** 50), max_value=2 ** 50),
    "b": st.one_of(st.none(), st.text(max_size=30)),
    "c": st.lists(st.integers(-1000, 1000), max_size=5),
})

_AVRO = {
    "type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "int"}},
    ],
}


@settings(max_examples=100, deadline=None)
@given(_avro_rec)
def test_avro_resolution_identity(rec):
    # reader == writer must behave exactly like the plain decoder
    from connect_spark.functions.avro_codec import (
        decode,
        decode_resolved,
        encode,
        resolve_names,
    )

    schema = resolve_names(json.loads(json.dumps(_AVRO)))
    raw = encode(rec, schema)
    assert decode_resolved(raw, _AVRO, _AVRO) == decode(raw, schema)


_topic = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=1000,
                           blacklist_characters="#+"),
    min_size=1, max_size=30)


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.tuples(_topic, st.binary(max_size=500),
              st.integers(0, 2), st.booleans()),
    min_size=1, max_size=8))
def test_mqtt_session_roundtrips_any_publishes(pubs):
    from connect_spark.functions.mqtt_codec import (
        MqttFixtureWriter,
        decode_session,
    )

    w = MqttFixtureWriter()
    w.connect("fuzz")
    for i, (topic, payload, qos, retain) in enumerate(pubs):
        w.publish(topic, payload, qos=qos, retain=retain,
                  packet_id=i + 1 if qos else None)
    got = [p for p in decode_session(bytes(w.buf))
           if p.type_name == "publish"]
    assert [(p.topic, p.payload, p.qos, p.retain) for p in got] == [
        (t, b, q, r) for t, b, q, r in pubs]


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.binary(max_size=6000),       # body (multi-frame at >4096)
        st.text(min_size=1, max_size=30),  # routing key
        st.dictionaries(
            st.text(min_size=1, max_size=10),
            st.one_of(st.text(max_size=20),
                      st.integers(-(2 ** 31), 2 ** 31 - 1),
                      st.booleans()),
            max_size=3),
    ),
    min_size=1, max_size=5))
def test_amqp09_session_roundtrips_any_deliveries(msgs):
    from connect_spark.functions.amqp_codec import (
        AmqpFixtureWriter,
        decode_session,
    )

    w = AmqpFixtureWriter()
    for i, (body, rkey, headers) in enumerate(msgs):
        w.deliver(body, rkey, delivery_tag=i + 1,
                  headers=headers or None)
        if i % 2:
            w.heartbeat()
    got = list(decode_session(bytes(w.buf)))
    assert [(d.body, d.routing_key, d.headers or {}) for d in got] == [
        (b, r, h) for b, r, h in msgs]


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.tuples(
        st.sampled_from(["insert", "delete"]),
        st.integers(min_value=-(2 ** 40), max_value=2 ** 40),
        st.text(max_size=40).filter(lambda s: "\x00" not in s),
        st.integers(min_value=-(2 ** 30), max_value=2 ** 30),
    ),
    min_size=1, max_size=10))
def test_pgoutput_transaction_roundtrips_any_rows(ops):
    from connect_spark.sources.pgoutput import (
        OID_INT4,
        OID_INT8,
        OID_TEXT,
        PgoutputFixtureWriter,
        decode_pgoutput_bytes,
    )

    w = PgoutputFixtureWriter()
    w.relation(16385, "fuzz",
               [("id", OID_INT8), ("name", OID_TEXT),
                ("qty", OID_INT4)])
    w.begin(commit_ts_us=1_000_000, xid=1)
    for kind, i, name, qty in ops:
        row = {"id": i, "name": name, "qty": qty}
        if kind == "insert":
            w.insert(row)
        else:
            w.delete({"id": i})
    w.commit(commit_ts_us=1_000_000)
    w.copy_done()
    recs = [r for r in decode_pgoutput_bytes(w.getvalue())
            if r["operation"] in ("insert", "delete")]
    assert len(recs) == len(ops)
    for rec, (kind, i, name, qty) in zip(recs, ops):
        assert rec["operation"] == kind
        if kind == "insert":
            assert rec["after"] == {"id": i, "name": name, "qty": qty}
        else:
            assert rec["before"]["id"] == i


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2 ** 50), max_value=2 ** 50),
            st.text(max_size=20).filter(lambda s: len(s.encode()) < 64),
            st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
        ),
        min_size=1, max_size=8),
    st.booleans(),
)
def test_binlog_write_rows_roundtrips_any_values(rows, checksum):
    from connect_spark.sources.binlog import (
        BinlogDecoder,
        BinlogFixtureWriter,
        T_LONG,
        T_LONGLONG,
        T_VARCHAR,
        decode_binlog_bytes,
    )

    cols = [("id", T_LONGLONG, 0), ("name", T_VARCHAR, 64),
            ("qty", T_LONG, 0)]
    w = BinlogFixtureWriter(ts=1_700_000_000, checksum=checksum)
    w.begin()
    w.table_map(101, "shop", "items", cols)
    w.write_rows([{"id": i, "name": n, "qty": q}
                  for i, n, q in rows])
    w.xid(9)
    dec = BinlogDecoder(column_names={"shop.items": ["id", "name",
                                                     "qty"]})
    recs = [r for r in decode_binlog_bytes(w.getvalue(), dec)
            if r["operation"] == "insert"]
    assert [(r["after"]["id"], r["after"]["name"], r["after"]["qty"])
            for r in recs] == rows
