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
        (3, bytearray(b"whatever"), "video/mp4", {}),
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


# --- GIF (LZW) --------------------------------------------------------


def test_gif_golden_smallest_white():
    """The canonical 35-byte 1x1 white GIF (external golden vector:
    hand-assembled from the GIF89a spec, LZW stream 0x44 0x01 =
    clear, index 0, EOI at 3-bit width)."""
    from connect_spark.text.media_codecs import decode_gif_frames

    golden = bytes.fromhex(
        "474946383961010001008000"
        "00ffffff000000"
        "2c000000000100010000"
        "02024401003b")
    d = decode_gif_frames(golden)
    assert (d["width"], d["height"]) == (1, 1)
    assert d["frames"] == [[[0]]]
    assert d["palette"][0] == (255, 255, 255)
    assert d["palette"][1] == (0, 0, 0)


def test_gif_lzw_roundtrip_property():
    import random

    from connect_spark.text.media_codecs import _lzw_decode, _lzw_encode

    rnd = random.Random(7)
    for _ in range(20):
        n = rnd.choice([1, 5, 64, 300, 5000])
        data = bytes(rnd.randrange(256) for _ in range(n))
        for mcs in (2, 4, 8):
            d2 = bytes(b % (1 << mcs) for b in data)
            assert _lzw_decode(_lzw_encode(d2, mcs), mcs) == d2


def test_gif_animated_roundtrip_with_table_growth():
    from connect_spark.text.media_codecs import (
        decode_gif_frames, encode_gif)

    pal = [(i, (3 * i) % 256, (7 * i) % 256) for i in range(256)]
    frames = [
        [[(11 + 17 * x + 29 * y + 53 * f) % 256 for x in range(8)]
         for y in range(8)]
        for f in range(3)
    ]
    d = decode_gif_frames(encode_gif(frames, pal, delay_cs=4))
    assert d["frames"] == frames
    assert d["palette"] == pal
    assert d["delays_cs"] == [4, 4, 4]
    # large frame: exercises 12-bit growth and the clear/reset path
    big = [[(x * y + x + 3 * y) % 256 for x in range(80)]
           for y in range(80)]
    assert decode_gif_frames(encode_gif([big], pal))["frames"] == [big]


def test_gif_small_palette_min_code_size():
    from connect_spark.text.media_codecs import (
        decode_gif_frames, encode_gif)

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    grid = [[(x + y) % 4 for x in range(5)] for y in range(3)]
    d = decode_gif_frames(encode_gif([grid], pal))
    assert d["frames"] == [grid]
    assert d["palette"] == pal


# --- G.711 mu-law -----------------------------------------------------


def test_mulaw_known_anchors():
    from connect_spark.text.media_codecs import mulaw_compress, mulaw_expand

    assert mulaw_compress(0) == 0xFF
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0          # negative zero folds to 0
    assert mulaw_compress(32767) == 0x80    # positive clip
    assert mulaw_expand(0x80) == 32124      # top reconstruction level
    assert mulaw_compress(-32768) == 0x00
    assert mulaw_expand(0x00) == -32124


def test_mulaw_code_idempotence_and_error_bound():
    from connect_spark.text.media_codecs import mulaw_compress, mulaw_expand

    for c in range(256):
        if c == 0x7F:
            continue  # -0: expands to 0, which re-compresses as +0
        assert mulaw_compress(mulaw_expand(c)) == c
    for x in range(-32768, 32768, 97):
        r = mulaw_expand(mulaw_compress(x))
        clipped = max(-32635, min(32635, x))
        # quantization step doubles per segment: error < 2^(seg+3)
        assert abs(r - clipped) <= max(4, (abs(clipped) + 132) // 16)


def test_mulaw_wav_roundtrip():
    from connect_spark.text.media_codecs import (
        decode_wav, encode_wav_mulaw, mulaw_compress, mulaw_expand)

    samples = [((j * 7 + 5) % 256 - 128) * 128 for j in range(64)]
    d = decode_wav(encode_wav_mulaw(samples, 8000))
    assert d["encoding"] == "mulaw"
    assert d["bits"] == 8
    assert d["n_samples"] == 64
    assert d["samples"] == [
        mulaw_expand(mulaw_compress(s)) for s in samples]


def test_gif_local_color_table_and_truncation_contract():
    """Review findings r9: a frame's LOCAL color table must be the
    effective palette (not silently the global one), and truncated
    payloads must raise ValueError — never IndexError."""
    import struct

    import pytest

    from connect_spark.text.media_codecs import (
        _gif_subblocks, _lzw_encode, decode_gif_frames, encode_gif)

    pal = [(10, 20, 30), (200, 100, 50), (1, 2, 3), (4, 5, 6)]
    grid = [[(x + y) % 4 for x in range(4)] for y in range(3)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 3, 0, 0, 0)      # no global table
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3)
    out.append(0x80 | 1)                             # LCT, 4 entries
    for r, g, b in pal:
        out += bytes((r, g, b))
    raw = bytes(v for row in grid for v in row)
    out.append(2)
    out += _gif_subblocks(_lzw_encode(raw, 2))
    out += b"\x3b"
    d = decode_gif_frames(bytes(out))
    assert d["frames"] == [grid]
    assert d["palettes"][0] == pal
    assert d["palette"] == []                        # global stays empty

    enc = encode_gif([grid], pal + [(0, 0, 0)] * 252)
    for cut in (20, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ValueError):
            decode_gif_frames(enc[:cut])
