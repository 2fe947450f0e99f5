"""Lossless JPEG (T.81 Annex H) — encoder↔decoder gates for BOTH
entropy backends: Huffman SOF3 and the QM-coded arithmetic SOFB
twin (H.1.2.2 Da/Db-conditioned statistical model over the
conformance-pinned Annex D coder).

No external oracle exists here (system libjpeg62 predates the
libjpeg-turbo 3.0 lossless API, and NO implementation of arithmetic
lossless ships anywhere), so the gate is the strongest self-check a
LOSSLESS codec admits: bit-exact roundtrip over every predictor,
precision, point transform, restart layout and component count
(hypothesis property tests), cross-backend sample equality (arith
and Huffman streams of the same input must reconstruct identical
planes), stream-shape assertions against the spec's marker grammar,
and a hand-pinned byte vector."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.text.media_codecs import (
    decode_jpeg_lossless,
    decode_jpeg_pixels,
    encode_jpeg_lossless,
    encode_jpeg_lossless_arith,
)


def _plane(rng_vals, w, h):
    it = iter(rng_vals)
    return [[next(it) for _ in range(w)] for _ in range(h)]


# ------------------------------------------------------------------
# deterministic roundtrips
# ------------------------------------------------------------------


@pytest.mark.parametrize("psv", range(1, 8))
def test_roundtrip_every_predictor(psv):
    p = [[(x * 37 + y * 91 + (x * y) % 13) % 256 for x in range(11)]
         for y in range(7)]
    enc = encode_jpeg_lossless([p], predictor=psv)
    d = decode_jpeg_lossless(enc)
    assert d["planes"][0] == p
    assert d["precision"] == 8 and d["point_transform"] == 0


@pytest.mark.parametrize("prec", [2, 4, 8, 12, 16])
def test_roundtrip_precisions(prec):
    mod = 1 << prec
    p = [[(x * 2654435761 + y * 40503) % mod for x in range(6)]
         for y in range(5)]
    enc = encode_jpeg_lossless([p], precision=prec, predictor=4)
    d = decode_jpeg_lossless(enc)
    assert d["planes"][0] == p and d["precision"] == prec


def test_roundtrip_three_components_interleaved():
    ps = [[[(c * 7919 + x * 31 + y * 17) % 256 for x in range(5)]
           for y in range(4)] for c in range(3)]
    enc = encode_jpeg_lossless(ps, predictor=7)
    assert decode_jpeg_lossless(enc)["planes"] == ps


def test_point_transform_scales_output():
    p = [[v % 256 for v in range(y * 16, y * 16 + 8)]
         for y in range(4)]
    enc = encode_jpeg_lossless([p], pt=2, predictor=1)
    d = decode_jpeg_lossless(enc)
    assert d["point_transform"] == 2
    assert d["planes"][0] == [[(v >> 2) << 2 for v in row]
                              for row in p]


def test_restart_interval_roundtrip():
    p = [[(x * 201 + y * 57) % 4096 for x in range(9)]
         for y in range(10)]
    enc = encode_jpeg_lossless([p], precision=12, predictor=5,
                               restart_rows=2)
    assert b"\xff\xdd" in enc  # DRI emitted
    assert b"\xff\xd0" in enc  # RST0 present
    assert decode_jpeg_lossless(enc)["planes"][0] == p


def test_extreme_diffs_category_16():
    """0 ↔ 32768 jumps at 16-bit precision exercise the SSSS=16
    no-appended-bits arm on both sides."""
    p = [[0, 32768, 0, 65535, 32768, 1]]
    enc = encode_jpeg_lossless([p], precision=16, predictor=1)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


# ------------------------------------------------------------------
# pixel-contract delegation (decode_jpeg_pixels on SOF3)
# ------------------------------------------------------------------


def test_pixels_grayscale_delegation():
    p = [[10, 200], [5, 255]]
    d = decode_jpeg_pixels(encode_jpeg_lossless([p]))
    assert d["pixels"] == [[(10, 10, 10), (200, 200, 200)],
                           [(5, 5, 5), (255, 255, 255)]]


def test_pixels_rgb_delegation():
    ps = [[[1, 2]], [[3, 4]], [[5, 6]]]
    d = decode_jpeg_pixels(encode_jpeg_lossless(ps))
    assert d["pixels"] == [[(1, 3, 5), (2, 4, 6)]]


def test_pixels_rejects_deep_precision():
    p = [[4000, 1]]
    enc = encode_jpeg_lossless([p], precision=12)
    with pytest.raises(ValueError, match="decode_jpeg_lossless"):
        decode_jpeg_pixels(enc)


# ------------------------------------------------------------------
# arithmetic lossless (SOFB, T.81 H.1.2.2 — the QM-coded twin)
# ------------------------------------------------------------------


@pytest.mark.parametrize("psv", range(1, 8))
def test_arith_roundtrip_every_predictor(psv):
    p = [[(x * 37 + y * 91 + (x * y) % 13) % 256 for x in range(11)]
         for y in range(7)]
    enc = encode_jpeg_lossless_arith([p], predictor=psv)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


@pytest.mark.parametrize("prec", [2, 8, 12, 16])
def test_arith_roundtrip_precisions(prec):
    mod = 1 << prec
    p = [[(x * 2654435761 + y * 40503) % mod for x in range(6)]
         for y in range(5)]
    enc = encode_jpeg_lossless_arith([p], precision=prec,
                                     predictor=4)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


def test_arith_three_components_and_restart():
    ps = [[[(c * 7919 + x * 31 + y * 17) % 256 for x in range(5)]
           for y in range(6)] for c in range(3)]
    enc = encode_jpeg_lossless_arith(ps, predictor=7,
                                     restart_rows=2)
    assert b"\xff\xd0" in enc
    assert decode_jpeg_lossless(enc)["planes"] == ps


def test_arith_matches_huffman_planes():
    """The two entropy backends must reconstruct IDENTICAL samples
    from the same input — the cross-check that pins the shared
    predictor against both coders."""
    p = [[(x * 201 + y * 57 + (x ^ y)) % 4096 for x in range(9)]
         for y in range(8)]
    a = decode_jpeg_lossless(encode_jpeg_lossless_arith(
        [p], precision=12, predictor=6))["planes"]
    hh = decode_jpeg_lossless(encode_jpeg_lossless(
        [p], precision=12, predictor=6))["planes"]
    assert a == hh == [p]


def test_arith_compresses_smooth_content():
    """The adaptive QM coder must beat the fixed Huffman table on
    predictable content (sanity that adaptation really engages)."""
    smooth = [[min(255, x + y) for x in range(32)] for y in range(32)]
    a = len(encode_jpeg_lossless_arith([smooth]))
    h = len(encode_jpeg_lossless([smooth]))
    assert a < h / 5


def test_arith_extreme_diffs():
    p = [[0, 32768, 0, 65535, 32768, 1]]
    enc = encode_jpeg_lossless_arith([p], precision=16, predictor=1)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


def test_arith_stream_markers():
    enc = encode_jpeg_lossless_arith([[[7]]])
    assert b"\xff\xcb" in enc  # SOFB
    assert b"\xff\xcc" in enc  # DAC
    assert b"\xff\xc4" not in enc  # no Huffman tables


def test_arith_pixels_delegation():
    p = [[10, 200], [5, 255]]
    d = decode_jpeg_pixels(encode_jpeg_lossless_arith([p]))
    assert d["pixels"] == [[(10, 10, 10), (200, 200, 200)],
                           [(5, 5, 5), (255, 255, 255)]]


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    psv=st.integers(1, 7),
    prec=st.sampled_from([2, 8, 12, 16]),
)
def test_arith_property_roundtrip(data, w, h, psv, prec):
    mod = 1 << prec
    p = [[data.draw(st.integers(0, mod - 1)) for _ in range(w)]
         for _ in range(h)]
    enc = encode_jpeg_lossless_arith([p], precision=prec,
                                     predictor=psv)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


# ------------------------------------------------------------------
# stream grammar + pinned vector
# ------------------------------------------------------------------


def test_stream_markers():
    enc = encode_jpeg_lossless([[[7]]])
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"\xff\xc3" in enc and b"\xff\xc4" in enc
    assert b"\xff\xda" in enc
    assert b"\xff\xdb" not in enc  # no quant tables in lossless


def test_pinned_vector():
    """Hand-derived: 1×1 plane [[5]], P=8, psv=1, Pt=0.  Default
    prediction 128; diff = 5-128 = -123 → SSSS 7, appended bits
    0000100b.  DC table: 17 symbols, all length 5 → code(7)=00111b.
    Entropy bytes: 00111 0000100 + 1111 padding → 0x38 0x4F."""
    enc = encode_jpeg_lossless([[[5]]], predictor=1)
    sos = enc.index(b"\xff\xda")
    entropy = enc[sos + 2 + 8:-2]  # SOS seg is 8 bytes after marker
    assert entropy == bytes([0x38, 0x4F])
    assert decode_jpeg_lossless(enc)["planes"][0] == [[5]]


def test_validation_errors():
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless([[[0]]], precision=17)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless([[[0]]], predictor=0)
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless([[[0]]], pt=8)
    with pytest.raises(ValueError, match="components"):
        encode_jpeg_lossless([[[0]]] * 2)


# ------------------------------------------------------------------
# hypothesis: arbitrary content roundtrips bit-exactly
# ------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    psv=st.integers(1, 7),
    prec=st.sampled_from([2, 4, 8, 11, 16]),
)
def test_property_roundtrip(data, w, h, psv, prec):
    mod = 1 << prec
    p = [[data.draw(st.integers(0, mod - 1)) for _ in range(w)]
         for _ in range(h)]
    enc = encode_jpeg_lossless([p], precision=prec, predictor=psv)
    assert decode_jpeg_lossless(enc)["planes"][0] == p


@settings(max_examples=15, deadline=None)
@given(
    data=st.data(),
    w=st.integers(1, 8),
    h=st.integers(2, 8),
    psv=st.integers(1, 7),
    rrows=st.integers(1, 4),
    pt=st.integers(0, 3),
)
def test_property_restart_and_pt(data, w, h, psv, rrows, pt):
    p = [[data.draw(st.integers(0, 255)) for _ in range(w)]
         for _ in range(h)]
    enc = encode_jpeg_lossless([p], predictor=psv, pt=pt,
                               restart_rows=rrows)
    out = decode_jpeg_lossless(enc)["planes"][0]
    assert out == [[(v >> pt) << pt for v in row] for row in p]


# ------------------------------------------------------------------
# malformed-input guard regressions (r13 ADVICE)
# ------------------------------------------------------------------


def test_arith_constant_plane_large_area_roundtrips():
    """A constant SOFB plane compresses to a handful of bytes (the
    decoder legally feeds 1-bits after stream end), so the Huffman
    area-vs-payload guard must NOT apply to arithmetic frames
    (r13 ADVICE regression: 2000x1500 plane -> ~35-byte stream)."""
    plane = [[128] * 2000 for _ in range(1500)]
    blob = encode_jpeg_lossless_arith([plane])
    assert len(blob) < 200  # genuinely tiny stream
    out = decode_jpeg_lossless(blob)
    assert out["width"] == 2000 and out["height"] == 1500
    assert out["planes"][0][0][0] == 128
    assert out["planes"][0][-1][-1] == 128


def test_sofb_forged_header_hits_allocation_cap():
    """A forged SOFB header claiming 65535x65535 must still be
    rejected (allocation cap), even though no payload-proportional
    bound exists for arithmetic frames."""
    import struct
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xCB]) + struct.pack(
        ">HBHHB", 8 + 3, 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="allocation cap"):
        decode_jpeg_lossless(bytes(blob))


def test_sof3_area_guard_still_rejects():
    """The Huffman payload-proportional guard stays in force for
    SOF3 frames."""
    import struct
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xC3]) + struct.pack(
        ">HBHHB", 8 + 3, 8, 60000, 60000, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg_lossless(bytes(blob))
