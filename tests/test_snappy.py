"""Snappy block codec (functions/snappy_codec.py) + flate/pgzip wiring."""

from __future__ import annotations

import random

import pytest

from connect_spark.functions.snappy_codec import compress, decompress


def test_golden_decode_handcrafted():
    # preamble varint 15; literal "hello" (tag (5-1)<<2); copy1 of
    # len 10 offset 5 (tag 0x01 | (10-4)<<2, offset byte 5)
    blob = bytes([15, (5 - 1) << 2]) + b"hello" + bytes([0x01 | (6 << 2), 5])
    assert decompress(blob) == b"hellohellohello"


def test_roundtrip_shapes():
    rng = random.Random(5)
    cases = [
        b"",
        b"a",
        b"hello world",
        b"ab" * 5000,                      # highly repetitive
        bytes(rng.randrange(256) for _ in range(10_000)),  # incompressible
        (b"the quick brown fox " * 400)[:-3],
        bytes(range(256)) * 300,
    ]
    for data in cases:
        assert decompress(compress(data)) == data


def test_compresses_repetitive_data():
    data = b"spark" * 10_000
    packed = compress(data)
    assert len(packed) < len(data) // 10


def test_rejects_corrupt_stream():
    blob = compress(b"hello world, hello world, hello world")
    with pytest.raises(ValueError):
        decompress(blob[:-2] + b"\xff\xff\xff")


def test_udf_wiring_flate_snappy_pgzip(spark):
    from pyspark.sql import functions as F

    from connect_spark.functions.formats import compress_udf, decompress_udf

    df = spark.createDataFrame(
        [("the rain in spain stays mainly in the plain " * 20,)], ["t"]
    )
    for codec in ("flate", "snappy", "pgzip"):
        out = (
            df.select(
                decompress_udf(codec)(
                    compress_udf(codec)(F.encode("t", "UTF-8"))
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        assert bytes(out).decode() == df.collect()[0]["t"]
