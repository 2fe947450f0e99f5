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


def test_bmp_pixel_roundtrip_and_resize():
    from connect_spark.text.media_codecs import (
        decode_bmp_pixels, encode_bmp, resize_bmp)

    rows = [[(x * 10 + y, (x * 3) % 256, (y * 7) % 256)
             for x in range(6)] for y in range(4)]
    payload = encode_bmp(rows)
    d = decode_bmp_pixels(payload)
    assert (d["width"], d["height"]) == (6, 4)
    assert d["pixels"] == rows   # top-down orientation restored
    # non-integral ratio: 6x4 -> 4x3, out (x,y) = src (x*6//4, y*4//3)
    rz = decode_bmp_pixels(resize_bmp(payload, 4, 3))
    for y in range(3):
        for x in range(4):
            assert rz["pixels"][y][x] == rows[y * 4 // 3][x * 6 // 4]
    with pytest.raises(ValueError):
        resize_bmp(payload, 0, 3)


def test_resize_media_mixed_mimes(spark):
    from connect_spark.text.media_codecs import (
        decode_bmp_pixels, encode_bmp)
    from connect_spark.text.multimodal import (
        MEDIA_SCHEMA, resize_media)

    rows = [[(y, x, 0) for x in range(8)] for y in range(8)]
    bmp = encode_bmp(rows)
    df = spark.createDataFrame(
        [(1, bytearray(bmp), "image/bmp", {}),
         (2, bytearray(b"opaque"), "video/fake", {})],
        MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_media(df, 2, 2).collect()}
    rz = decode_bmp_pixels(bytes(out[1].payload))
    assert (rz["width"], rz["height"]) == (2, 2)
    assert rz["pixels"] == [[(0, 0, 0), (0, 4, 0)],
                            [(4, 0, 0), (4, 4, 0)]]
    assert out[1].meta["resize"] == "2x2"
    # non-BMP passes through untouched, flagged metadata-only
    assert bytes(out[2].payload) == b"opaque"
    assert out[2].meta["resize_applied"] == "metadata-only"


def test_wav_window_features_values(spark):
    from connect_spark.text.media_codecs import encode_wav
    from connect_spark.text.multimodal import (
        MEDIA_SCHEMA, wav_window_features)

    samples = [100, -100, 200, 0, -50, 50]   # 2 windows of 4 + tail 2
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(samples)), "audio/wav", {})],
        MEDIA_SCHEMA)
    out = {r.win_idx: r for r in
           wav_window_features(df, window=4).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_samples == 4
    assert out[0].energy == 100**2 + 100**2 + 200**2 + 0**2
    # crossings: 100->-100 yes, -100->200 yes, 200->0 no (strict)
    assert out[0].zero_crossings == 2
    assert out[1].n_samples == 2
    assert out[1].energy == 50**2 + 50**2
    assert out[1].zero_crossings == 1
