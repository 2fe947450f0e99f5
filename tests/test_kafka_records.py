"""Kafka RecordBatch v2 codec matrix: CRC32C vectors, record/batch
roundtrips, compression codecs, null keys/values, headers, control
batches, segment iteration (public Kafka protocol 'Record Batch'
layout — the byte format every reference kafka connector moves)."""

from __future__ import annotations

import struct

import pytest

from connect_spark.functions.kafka_records import (
    CODEC_GZIP,
    CODEC_LZ4,
    CODEC_NONE,
    CODEC_SNAPPY,
    KafkaRecord,
    crc32c,
    decode_batch,
    decode_segment,
    encode_batch,
)


def test_crc32c_vectors():
    """RFC 3720 / public CRC32C test vectors."""
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def _records():
    return [
        KafkaRecord(100, 1_700_000_000_000, b"k1", b"v1",
                    [("h1", b"x"), ("h2", b"")]),
        KafkaRecord(101, 1_700_000_000_500, None, b"v2", []),
        KafkaRecord(102, 1_700_000_001_000, b"k3", None, []),
    ]


@pytest.mark.parametrize("codec", [CODEC_NONE, CODEC_GZIP,
                                   CODEC_SNAPPY, CODEC_LZ4])
def test_batch_roundtrip(codec):
    raw = encode_batch(_records(), base_offset=100, codec=codec)
    batch, nxt = decode_batch(raw)
    assert nxt == len(raw)
    assert batch["base_offset"] == 100
    assert batch["codec"] == codec
    recs = batch["records"]
    assert [r.offset for r in recs] == [100, 101, 102]
    assert [r.timestamp_ms for r in recs] == [
        1_700_000_000_000, 1_700_000_000_500, 1_700_000_001_000]
    assert recs[0].key == b"k1" and recs[0].value == b"v1"
    assert recs[0].headers == [("h1", b"x"), ("h2", b"")]
    assert recs[1].key is None and recs[1].value == b"v2"
    assert recs[2].key == b"k3" and recs[2].value is None


def test_crc_detects_corruption():
    raw = bytearray(encode_batch(_records(), base_offset=0))
    # flip a CONTENT byte (inside value "v1") so the structure still
    # parses — only the checksum catches it
    at = raw.index(b"v1")
    raw[at] ^= 0x20
    with pytest.raises(ValueError, match="CRC32C"):
        decode_batch(bytes(raw))
    # verify_crc=False surfaces the (corrupt) value — the
    # inspect-corrupt-segment path
    batch, _ = decode_batch(bytes(raw), verify_crc=False)
    assert batch["records"][0].value == b"V1"


def test_segment_iteration_and_control_skip():
    b1 = encode_batch(_records(), base_offset=100)
    # a control batch (attributes bit 5): hand-stamp the bit
    ctrl = bytearray(encode_batch(
        [KafkaRecord(103, 0, b"\x00\x00\x00\x01", b"")], base_offset=103))
    # attributes live 21 bytes in (8 offset + 4 len + 4 epoch + 1 magic
    # + 4 crc); set bit 5 then re-stamp the CRC
    attrs_at = 8 + 4 + 4 + 1 + 4
    ctrl[attrs_at + 1] |= 0x20
    after_crc = bytes(ctrl[attrs_at:])
    struct.pack_into(">I", ctrl, 8 + 4 + 4 + 1, crc32c(after_crc))
    b3 = encode_batch([KafkaRecord(104, 5, b"k", b"v")], base_offset=104)
    segment = b1 + bytes(ctrl) + b3
    recs = list(decode_segment(segment))
    assert [r.offset for r in recs] == [100, 101, 102, 104]
    # with skip_control=False the marker surfaces
    all_recs = list(decode_segment(segment, skip_control=False))
    assert [r.offset for r in all_recs] == [100, 101, 102, 103, 104]


def test_magic_v2_only():
    raw = bytearray(encode_batch(_records(), base_offset=0))
    raw[16] = 1  # magic byte
    with pytest.raises(ValueError, match="magic"):
        decode_batch(bytes(raw))


def test_large_offsets_and_timestamps():
    recs = [KafkaRecord(2**40 + i, 2**41 + i * 1000, None,
                        bytes([i] * 100)) for i in range(50)]
    raw = encode_batch(recs, base_offset=2**40, codec=CODEC_LZ4)
    back = decode_batch(raw)[0]["records"]
    assert [r.offset for r in back] == [2**40 + i for i in range(50)]
    assert back[49].value == bytes([49] * 100)


def test_kafka_log_segment_input(spark, tmp_path):
    """Recorded .log segments under partition dirs decode through the
    kafka_log_segment input kind — one task per segment, partition
    from the directory name, headers as JSON."""
    import json

    from connect_spark.plans.pipeline import Pipeline

    d0 = tmp_path / "topic-0"
    d1 = tmp_path / "topic-1"
    d0.mkdir()
    d1.mkdir()
    (d0 / "00000000000000000000.log").write_bytes(
        encode_batch([
            KafkaRecord(0, 1000, b"a", b"va", [("h", b"1")]),
            KafkaRecord(1, 2000, b"b", b"vb"),
        ], base_offset=0, codec=CODEC_SNAPPY))
    (d1 / "00000000000000000005.log").write_bytes(
        encode_batch([KafkaRecord(5, 3000, None, b"vc")],
                     base_offset=5))
    df = Pipeline(spark, {"input": {"kafka_log_segment": {
        "path": str(tmp_path)}}}).dataframe()
    rows = sorted(df.collect(), key=lambda r: (r.partition, r.offset))
    assert [(r.partition, r.offset) for r in rows] == [
        (0, 0), (0, 1), (1, 5)]
    assert bytes(rows[0].value) == b"va"
    assert json.loads(rows[0].headers) == [["h", "1"]]
    assert rows[2].key is None
    assert rows[0].timestamp_ms == 1000


def test_zstd_batch_roundtrip():
    """All five Kafka codecs are now real — zstd rides pyarrow's
    bundled libzstd with the RFC 8878 frame-header size parse."""
    from connect_spark.functions.kafka_records import (
        CODEC_ZSTD,
        KafkaRecord,
        decode_segment,
        encode_batch,
    )

    recs = [KafkaRecord(i, 1_700_000_000_000 + i, b"k%d" % i,
                        b"value-%d" % i * 20) for i in range(50)]
    seg = encode_batch(recs, base_offset=0, codec=CODEC_ZSTD)
    got = list(decode_segment(seg))
    assert [(r.offset, r.key, r.value) for r in got] == [
        (r.offset, r.key, r.value) for r in recs]


def test_zstd_frame_content_size_forms():
    from connect_spark.functions.zstd_codec import (
        compress,
        decompress,
        frame_content_size,
    )

    for size in (0, 1, 100, 300, 70_000, 1 << 17):
        data = bytes(i % 251 for i in range(size))
        frame = compress(data)
        fcs = frame_content_size(frame)
        assert fcs is None or fcs == len(data)
        assert decompress(frame) == data
