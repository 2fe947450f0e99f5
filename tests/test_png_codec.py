"""Pure-stdlib PNG codec (text/media_codecs.py): chunk framing + CRC,
zlib DEFLATE, and all five scanline filters — pinned against
hand-built golden vectors with an INDEPENDENT filter implementation in
this file, so encoder and decoder can't share a bug."""

from __future__ import annotations

import struct
import zlib

import pytest

from connect_spark.text.media_codecs import (
    decode_png_pixels,
    decode_raster_pixels,
    encode_bmp,
    encode_png,
    resize_png,
    resize_raster,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_ref(ft, line, prev, bpp):
    """Independent reference filter (the test-side twin)."""
    out = bytearray()
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                4: _paeth_ref(a, b, c)}[ft]
        out.append((x - pred) & 0xFF)
    return bytes(out)


def _build_png(pixels, filters, color=2):
    """Hand-assemble a PNG with explicit per-row filter types using
    the reference filter above."""
    h = len(pixels)
    w = len(pixels[0])
    bpp = 3 if color == 2 else 4
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w * bpp)
    for row, ft in zip(pixels, filters):
        line = bytes(v for px in row for v in px)
        raw.append(ft)
        raw += _filter_ref(ft, line, prev, bpp)
        prev = line
    return (SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _grad(w, h):
    return [[((x * 37 + y * 11) % 256, (x * 5 + y * 91) % 256,
              (x * 13 + y * 29) % 256) for x in range(w)]
            for y in range(h)]


def test_golden_all_five_filters_decode():
    """5-row image, one row per filter type 0..4; the decoder must
    reconstruct the exact source raster through every defilter path."""
    px = _grad(6, 5)
    payload = _build_png(px, [0, 1, 2, 3, 4])
    d = decode_png_pixels(payload)
    assert (d["width"], d["height"], d["color_type"]) == (6, 5, 2)
    assert d["pixels"] == px


def test_golden_hand_pinned_2x2():
    """Tiny raster pinned value-by-value: Sub filter on row 2 means
    stored bytes differ from the raster; decode must undo it."""
    px = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (70, 80, 90)]]
    payload = _build_png(px, [0, 1])
    # row 2 stored under Sub: second pixel encodes as deltas (0,0,0)
    raw = zlib.decompress(
        payload[8 + 25 + 8:-16])  # IDAT body
    assert raw[7] == 1  # row-2 filter byte: Sub
    assert raw[8:] == bytes([70, 80, 90, 0, 0, 0])
    assert decode_png_pixels(payload)["pixels"] == px


def test_rgba_decodes_alpha_dropped():
    px_rgba = [[(1, 2, 3, 255), (4, 5, 6, 128)],
               [(7, 8, 9, 0), (10, 11, 12, 7)]]
    payload = _build_png(px_rgba, [0, 4], color=6)
    d = decode_png_pixels(payload)
    assert d["color_type"] == 6
    assert d["pixels"] == [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]


def test_roundtrip_uses_adaptive_filters():
    """encode → decode is identity, and the min-SAD heuristic picks a
    non-zero filter for at least one gradient row (so round-trips
    exercise the defilter paths, not just filter 0)."""
    px = _grad(16, 12)
    payload = encode_png(px)
    assert decode_png_pixels(payload)["pixels"] == px
    body = zlib.decompress(payload[8 + 25 + 8:-16])
    stride = 16 * 3 + 1
    filters = {body[i] for i in range(0, len(body), stride)}
    assert filters - {0}, "adaptive filtering never left filter 0"


def test_crc_and_envelope_validation():
    payload = bytearray(encode_png(_grad(4, 4)))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        decode_png_pixels(b"not a png")
    # 16-bit depth rejected
    bad = _build_png(_grad(2, 2), [0, 0])
    bad = bytearray(bad)
    bad[8 + 8 + 8] = 16  # IHDR depth byte
    bad[8 + 8 + 13:8 + 8 + 13 + 4] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(bad[8 + 8:8 + 8 + 13]))
        & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="8-bit"):
        decode_png_pixels(bytes(bad))


def test_idat_split_across_chunks():
    px = _grad(5, 3)
    one = encode_png(px)
    ihdr_chunk = one[8:8 + 12 + 13]
    idat_body = one[8 + 25 + 8:-16]
    split = (SIG + ihdr_chunk + _chunk(b"IDAT", idat_body[:7])
             + _chunk(b"IDAT", idat_body[7:]) + _chunk(b"IEND", b""))
    assert decode_png_pixels(split)["pixels"] == px


def test_resize_png_sampling_rule():
    px = _grad(8, 8)
    out = decode_png_pixels(resize_png(encode_png(px), 4, 4))
    assert out["pixels"] == [[px[2 * y][2 * x] for x in range(4)]
                             for y in range(4)]


def test_raster_dispatch_both_containers():
    px = _grad(4, 4)
    for payload in (encode_png(px), encode_bmp(px)):
        assert decode_raster_pixels(payload)["pixels"] == px
        small = resize_raster(payload, 2, 2)
        assert small[:2] == payload[:2]  # container preserved
        assert decode_raster_pixels(small)["width"] == 2
    with pytest.raises(ValueError, match="unknown container"):
        decode_raster_pixels(b"\x00\x01\x02")
