"""Property tests (hypothesis) for the round-6 codecs: AMQP 1.0
values, websocket framing, WAV samples, BMP rasters, Kafka
read_committed invariants, and BPE lossless-ness."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.functions.amqp1_codec import (
    Symbol,
    decode_value,
    encode_value,
)
from connect_spark.functions.broker_codecs import (
    decode_sp_stream,
    decode_zmtp_stream,
    encode_sp_handshake,
    encode_sp_message,
    encode_zmtp_message,
)
from connect_spark.functions.websocket_codec import (
    OP_BINARY,
    decode_session as ws_decode,
    encode_message as ws_encode,
)
from connect_spark.text.bpe import default_tokenizer
from connect_spark.text.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)

_amqp_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=60),
    st.binary(max_size=60),
    st.builds(Symbol, st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        max_size=20)),
)

_amqp_values = st.recursive(
    _amqp_scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=5),
        st.dictionaries(st.text(max_size=10), kids, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=150, deadline=None)
@given(_amqp_values)
def test_amqp1_value_roundtrips(v):
    raw = encode_value(v)
    got, consumed = decode_value(raw)
    assert consumed == len(raw)
    assert got == v


@settings(max_examples=100, deadline=None)
@given(
    st.binary(max_size=5000),
    st.integers(min_value=1, max_value=700),
    st.one_of(st.none(), st.binary(min_size=4, max_size=4)),
)
def test_websocket_message_roundtrips(payload, frag, mask):
    wire = ws_encode(payload, OP_BINARY, mask=mask, max_fragment=frag)
    got = list(ws_decode(wire))
    assert len(got) == 1 and got[0].payload == payload


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                max_size=300),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_pcm16_roundtrips(samples, rate):
    d = decode_wav(encode_wav(samples, sample_rate=rate))
    assert d["samples"] == samples and d["sample_rate"] == rate


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=0, max_value=255))
def test_bmp_dimensions_roundtrip(w, h, seed):
    pixels = [[((x * seed) % 256, (y + seed) % 256, (x ^ y) % 256)
               for x in range(w)] for y in range(h)]
    d = decode_bmp(encode_bmp(pixels))
    assert (d["width"], d["height"]) == (w, h)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=200), max_size=8, min_size=1))
def test_zmtp_parts_roundtrip(parts):
    got = list(decode_zmtp_stream(encode_zmtp_message(parts)))
    assert got == [parts]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=300), max_size=10))
def test_sp_stream_roundtrips(payloads):
    wire = encode_sp_handshake() + b"".join(
        encode_sp_message(p) for p in payloads)
    assert list(decode_sp_stream(wire)) == payloads


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_bpe_is_lossless_on_any_text(text):
    tok = default_tokenizer()
    assert tok.decode(tok.encode(text)) == text
    assert tok.count(text) == len(tok.encode(text))


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 2),  # 0 plain, 1 commit-txn, 2 abort-txn
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=12))
def test_read_committed_equals_manual_filter(spec):
    from connect_spark.functions.kafka_records import (
        KafkaRecord,
        decode_segment_read_committed,
        encode_batch,
        encode_control_batch,
    )

    seg = bytearray()
    expected = []
    offset = 0
    markers = bytearray()
    marker_off = 1_000_000
    for i, (kind, n) in enumerate(spec):
        recs = [KafkaRecord(offset + j, offset + j, b"%d" % (offset + j),
                            b"v") for j in range(n)]
        offset += max(n, 1)
        if not recs:
            continue
        if kind == 0:
            seg += encode_batch(recs, base_offset=recs[0].offset)
            expected += [r.offset for r in recs]
        else:
            pid = 1000 + i
            seg += encode_batch(recs, base_offset=recs[0].offset,
                                producer_id=pid, transactional=True)
            markers += encode_control_batch(
                marker_off, pid, commit=kind == 1)
            marker_off += 1
            if kind == 1:
                expected += [r.offset for r in recs]
    got = decode_segment_read_committed(bytes(seg + markers))
    assert [r.offset for r in got] == sorted(expected)


# --- model-based: connected components vs union-find -----------------

@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)),
    min_size=1, max_size=25))
def test_connected_components_matches_union_find(spark, edges):
    from connect_spark.operators.cluster import connected_components

    parent = list(range(21))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e if e[0] != e[1]}
    expected = {n: min(m for m in nodes if find(m) == find(n))
                for n in nodes}
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long")
    got = {r["node"]: r["comp"]
           for r in connected_components(df).collect()}
    assert got == expected


# --- model-based: iceberg upsert/delete vs a dict --------------------

@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["upsert", "delete"]),
              st.lists(st.integers(0, 6), min_size=1, max_size=4)),
    min_size=1, max_size=6))
def test_iceberg_merge_matches_dict_model(spark, tmp_path_factory, ops):
    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    loc = str(tmp_path_factory.mktemp("icemodel") / "tbl")
    t = IcebergTable(spark, loc)
    model: dict[int, str] = {}
    version = 0
    for kind, keys in ops:
        version += 1
        if kind == "upsert":
            rows = [(k, f"v{version}") for k in sorted(set(keys))]
            t.upsert(spark.createDataFrame(rows, "k long, v string"),
                     ["k"])
            for k, v in rows:
                model[k] = v
        else:
            if t.metadata() is None:
                continue
            t.delete_by_keys(spark.createDataFrame(
                [(k,) for k in sorted(set(keys))], "k long"))
            for k in keys:
                model.pop(k, None)
    if t.metadata() is None:
        return
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == model
