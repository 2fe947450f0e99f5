"""LZ4 block/frame codec + XXH32 (functions/lz4_codec.py)."""

from __future__ import annotations

import random

import pytest

from connect_spark.functions.lz4_codec import (
    compress,
    compress_block,
    decompress,
    decompress_block,
    xxh32,
)


def test_xxh32_known_vectors():
    # public xxHash reference vectors
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=1) == 0x0B2CB792
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_block_roundtrip_shapes():
    rng = random.Random(9)
    cases = [
        b"",
        b"a",
        b"hello world",
        b"ab" * 5000,
        bytes(rng.randrange(256) for _ in range(8_000)),
        (b"lz4 block format " * 300),
        bytes(range(256)) * 100,
    ]
    for data in cases:
        assert decompress_block(compress_block(data), len(data)) == data


def test_block_golden_decode():
    # token 0x22: 2 literals "ab", match len 2+4=6 at offset 2
    blob = bytes([0x22]) + b"ab" + (2).to_bytes(2, "little")
    assert decompress_block(blob) == b"abababab"


def test_frame_roundtrip_and_ratio():
    data = b"spark lz4 frame " * 4096
    packed = compress(data)
    assert len(packed) < len(data) // 4
    assert decompress(packed) == data
    assert decompress(compress(b"")) == b""


def test_frame_detects_corruption():
    packed = bytearray(compress(b"payload payload payload payload"))
    packed[-1] ^= 0xFF  # content checksum
    with pytest.raises(ValueError, match="checksum"):
        decompress(bytes(packed))
    with pytest.raises(ValueError, match="magic"):
        decompress(b"\x00\x00\x00\x00")


def test_udf_wiring_lz4(spark):
    from pyspark.sql import functions as F

    from connect_spark.functions.formats import compress_udf, decompress_udf

    df = spark.createDataFrame([("round and round it goes " * 40,)], ["t"])
    out = df.select(
        decompress_udf("lz4")(
            compress_udf("lz4")(F.encode("t", "UTF-8"))
        ).alias("b")
    ).collect()[0]["b"]
    assert bytes(out).decode() == df.collect()[0]["t"]


def test_frame_with_content_size_and_dictid_fields():
    # frames carrying the optional content-size field place the header
    # checksum AFTER it; build one by hand and decode
    from connect_spark.functions.lz4_codec import (
        _MAGIC, compress_block, xxh32,
    )

    payload = b"content-size framed " * 10
    flg = 0x40 | 0x08  # version, content-size present (no checksums)
    bd = 0x70
    desc = bytes([flg, bd]) + len(payload).to_bytes(8, "little")
    hc = (xxh32(desc) >> 8) & 0xFF
    block = compress_block(payload)
    frame = (
        _MAGIC.to_bytes(4, "little") + desc + bytes([hc])
        + len(block).to_bytes(4, "little") + block
        + (0).to_bytes(4, "little")
    )
    assert decompress(frame) == payload
