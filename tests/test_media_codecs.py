"""Real pure-Python media codecs (text/media_codecs.py) and their
integration into decode_media."""
from __future__ import annotations

import pytest

from connect_spark.text.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_wav_roundtrip_16bit():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    wav = encode_wav(samples, sample_rate=16000)
    d = decode_wav(wav)
    assert d["samples"] == samples
    assert d["sample_rate"] == 16000 and d["n_channels"] == 1
    assert d["bits"] == 16 and d["n_samples"] == 6
    assert d["duration_ms"] == 6 * 1000 // 16000


def test_wav_roundtrip_8bit_stereo():
    samples = [0, -128, 127, 64, -64, 1]
    wav = encode_wav(samples, sample_rate=8000, n_channels=2, bits=8)
    d = decode_wav(wav)
    assert d["samples"] == samples
    assert d["n_channels"] == 2
    assert d["duration_ms"] == 3 * 1000 // 8000


def test_wav_skips_unknown_chunks():
    import struct

    wav = bytearray(encode_wav([1, 2, 3]))
    # splice a LIST chunk between fmt and data
    fmt_end = wav.find(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["samples"] == [1, 2, 3]


def test_wav_rejects_non_pcm_and_truncation():
    wav = encode_wav([1, 2])
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00JUNK")
    with pytest.raises(ValueError):
        decode_wav(wav[:-1])


def test_bmp_roundtrip_and_means():
    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    bmp = encode_bmp(pixels)
    d = decode_bmp(bmp)
    assert (d["width"], d["height"]) == (3, 2)
    assert d["mean_r_x1000"] == (255 + 10 + 40 + 70) * 1000 // 6
    assert d["mean_g_x1000"] == (255 + 20 + 50 + 80) * 1000 // 6
    assert d["mean_b_x1000"] == (255 + 30 + 60 + 90) * 1000 // 6


def test_bmp_row_padding_exercised():
    # width 3 → 9-byte rows padded to 12; a width-4 image has no pad
    for w in (3, 4, 5):
        pixels = [[(x * 40 % 256, y * 90 % 256, (x + y) % 256)
                   for x in range(w)] for y in range(3)]
        d = decode_bmp(encode_bmp(pixels))
        assert (d["width"], d["height"]) == (w, 3)


def test_bmp_rejects_other_depths():
    bmp = bytearray(encode_bmp([[(1, 2, 3)]]))
    bmp[28] = 8  # depth byte → 8bpp
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bmp))


def test_decode_media_real_wav_and_bmp(spark):
    from connect_spark.text.multimodal import MEDIA_SCHEMA, decode_media

    wav = encode_wav([0, 16384, -16384, 8192], sample_rate=4000)
    bmp = encode_bmp([[(100, 150, 200)]])
    df = spark.createDataFrame([
        (1, bytearray(wav), "audio/wav", {}),
        (2, bytearray(bmp), "image/bmp", {}),
        (3, bytearray(b"whatever"), "image/jpeg", {}),
    ], MEDIA_SCHEMA)
    rows = {r["media_id"]: r
            for r in decode_media(df, decode_stub=True).collect()}
    # wav: width=sample_rate, height=channels, feature=[dur, n, peak]
    assert rows[1]["width"] == 4000 and rows[1]["height"] == 1
    assert rows[1]["feature"][0] == 1.0  # 4 frames @4kHz = 1ms
    assert rows[1]["feature"][1] == 4.0
    assert abs(rows[1]["feature"][2] - 0.5) < 1e-5
    # bmp: real dimensions + channel means
    assert rows[2]["width"] == 1 and rows[2]["height"] == 1
    assert abs(rows[2]["feature"][0] - 100 / 255) < 1e-2
    # compressed mime still rides the deterministic stub
    assert rows[3]["width"] >= 64
