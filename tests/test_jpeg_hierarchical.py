"""Hierarchical JPEG (T.81 Annexes J.8/K.5: DHP + EXP + differential
SOF7/SOFF frames over the lossless pyramid) — bit-exact encoder ↔
decoder roundtrips for both entropy arms, normative-expansion
properties, pinned vector, delegation through decode_jpeg_pixels /
decode_jpeg_lossless, and precise failure modes.  The reference
(redpanda-data/connect) ships no JPEG code; this closes the repo's
own last JPEG mode (r12 verdict task #6)."""

from __future__ import annotations

import hashlib
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connect_spark.text.media_codecs import (
    _jpeg_downsample,
    _jpeg_expand,
    decode_jpeg_hierarchical,
    decode_jpeg_lossless,
    decode_jpeg_pixels,
    encode_jpeg_hierarchical,
)


def _plane(seed: int, w: int, h: int, mod: int = 256):
    rng = random.Random(seed)
    return [[rng.randrange(mod) for _ in range(w)] for _ in range(h)]


# ------------------------------------------------------------------
# roundtrips
# ------------------------------------------------------------------


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("levels", [1, 2, 3, 4])
def test_roundtrip_levels(arith, levels):
    p = _plane(7, 19, 14)
    blob = encode_jpeg_hierarchical([p], levels=levels,
                                    arithmetic=arith)
    d = decode_jpeg_hierarchical(blob)
    assert d["width"] == 19 and d["height"] == 14
    assert d["planes"][0] == p


@pytest.mark.parametrize("psv", range(1, 8))
def test_roundtrip_every_initial_predictor(psv):
    p = _plane(psv, 11, 8)
    blob = encode_jpeg_hierarchical([p], levels=2, predictor=psv)
    assert decode_jpeg_hierarchical(blob)["planes"][0] == p


@pytest.mark.parametrize("prec", [2, 4, 8, 12, 16])
def test_roundtrip_precisions(prec):
    p = _plane(prec, 9, 7, 1 << prec)
    blob = encode_jpeg_hierarchical([p], levels=2, precision=prec)
    d = decode_jpeg_hierarchical(blob)
    assert d["precision"] == prec
    assert d["planes"][0] == p


@pytest.mark.parametrize("arith", [False, True])
def test_roundtrip_three_components(arith):
    planes = [_plane(i, 10, 6) for i in range(3)]
    blob = encode_jpeg_hierarchical(planes, levels=3,
                                    arithmetic=arith)
    d = decode_jpeg_hierarchical(blob)
    assert d["planes"] == planes


@pytest.mark.parametrize("w,h", [(1, 1), (2, 1), (1, 2), (5, 3),
                                 (16, 16), (17, 17)])
def test_roundtrip_odd_and_tiny_dims(w, h):
    p = _plane(w * 100 + h, w, h)
    levels = 2 if max(w, h) > 1 else 1
    blob = encode_jpeg_hierarchical([p], levels=levels)
    assert decode_jpeg_hierarchical(blob)["planes"][0] == p


def test_smooth_content_pyramid_compresses():
    """On smooth content the differential frames are near-zero, so
    the hierarchical stream undercuts the flat SOF3 encoding."""
    from connect_spark.text.media_codecs import encode_jpeg_lossless

    p = [[(x + y) // 2 for x in range(64)] for y in range(64)]
    flat = encode_jpeg_lossless([p])
    hier = encode_jpeg_hierarchical([p], levels=3)
    assert decode_jpeg_hierarchical(hier)["planes"][0] == p
    assert len(hier) < 2 * len(flat)  # same order of magnitude


# ------------------------------------------------------------------
# normative expansion + pyramid helpers
# ------------------------------------------------------------------


def test_expand_interpolation_is_normative():
    # J.8.1.2: out[2x] = in[x]; out[2x+1] = (in[x]+in[x+1]+1)>>1
    out = _jpeg_expand([[0, 10, 255]], 6, 1, eh=1, ev=0)
    assert out == [[0, 5, 10, 133, 255, 255]]
    out = _jpeg_expand([[4], [8]], 1, 4, eh=0, ev=1)
    assert out == [[4], [6], [8], [8]]


def test_expand_truncates_odd_target():
    # a 3-wide reference doubles to 6 but a 5-wide frame truncates
    out = _jpeg_expand([[1, 3, 5]], 5, 1, eh=1, ev=0)
    assert out == [[1, 2, 3, 4, 5]]


def test_expand_rejects_unreachable_dims():
    with pytest.raises(ValueError, match="EXP expansion"):
        _jpeg_expand([[1, 2]], 9, 1, eh=1, ev=0)


def test_downsample_rounded_mean():
    p = [[0, 2], [4, 6]]
    assert _jpeg_downsample(p) == [[3]]
    assert _jpeg_downsample([[1, 2, 3]]) == [[2, 3]]  # edge blocks


# ------------------------------------------------------------------
# stream structure + delegation
# ------------------------------------------------------------------


def test_stream_markers():
    blob = encode_jpeg_hierarchical([_plane(1, 8, 8)], levels=2)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"\xff\xde" in blob  # DHP
    assert b"\xff\xdf" in blob  # EXP
    assert b"\xff\xc3" in blob  # initial SOF3
    assert b"\xff\xc7" in blob  # differential SOF7
    blob_a = encode_jpeg_hierarchical([_plane(1, 8, 8)], levels=2,
                                      arithmetic=True)
    assert b"\xff\xcb" in blob_a and b"\xff\xcf" in blob_a


def test_pinned_vector():
    """Golden: the stream bytes AND the decode are pinned, so any
    drift in either direction of the codec is caught."""
    p = [[(7 * x + 13 * y) % 256 for x in range(12)]
         for y in range(10)]
    blob = encode_jpeg_hierarchical([p], levels=3)
    assert hashlib.sha256(blob).hexdigest() == (
        "8e22973f0e8cb4c53ef340bf334f6c11cc1e7648a74b9ef0d7857bf7"
        "826e63c8")
    assert decode_jpeg_hierarchical(blob)["planes"][0] == p


def test_decode_jpeg_lossless_delegates_dhp():
    p = _plane(5, 9, 9)
    blob = encode_jpeg_hierarchical([p], levels=2)
    d = decode_jpeg_lossless(blob)
    assert d["planes"][0] == p


def test_decode_jpeg_pixels_delegates_dhp():
    planes = [_plane(i + 20, 8, 6) for i in range(3)]
    blob = encode_jpeg_hierarchical(planes, levels=2,
                                    arithmetic=True)
    d = decode_jpeg_pixels(blob)
    assert d["width"] == 8 and d["height"] == 6
    assert d["pixels"][0][0] == (planes[0][0][0], planes[1][0][0],
                                 planes[2][0][0])


# ------------------------------------------------------------------
# failure modes
# ------------------------------------------------------------------


def test_validation_errors():
    p = [[1]]
    with pytest.raises(ValueError, match="levels"):
        encode_jpeg_hierarchical([p], levels=0)
    with pytest.raises(ValueError, match="too many levels"):
        encode_jpeg_hierarchical([p], levels=2)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_hierarchical([p], precision=17)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_hierarchical([p], predictor=0)
    with pytest.raises(ValueError, match="components"):
        encode_jpeg_hierarchical([p, p])


def test_differential_frame_without_dhp_raises():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xC7]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_jpeg_pixels(bytes(blob))


def test_differential_before_reference_raises():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    blob += bytes([0xFF, 0xC7]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="before any"):
        decode_jpeg_hierarchical(bytes(blob))


def test_dct_base_without_scan_raises():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    blob += bytes([0xFF, 0xC2]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="without a scan"):
        decode_jpeg_hierarchical(bytes(blob))


def test_progressive_dct_base_decodes_exact():
    """A multi-scan (progressive SOF2) grayscale base inside the
    hierarchy: the substream extraction walks EVERY scan of the
    frame, and the SOF7 residual still lands the source exactly."""
    import numpy as np

    from connect_spark.text import media_codecs as M

    p = [[(5 * x + 11 * y) % 256 for x in range(10)]
         for y in range(9)]
    h, w = 9, 10
    arr = np.pad(np.asarray(p, dtype=np.int64),
                 ((0, 16 - h), (0, 16 - w)), mode="edge")
    m = M._jpeg_dct_matrix()
    by = bx = 2
    blocks = (arr.astype(np.float64) - 128.0).reshape(
        by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", m, blocks, m)
    q = (np.floor(np.abs(coef) / M._JQ + 0.5).astype(np.int64)
         * np.sign(coef).astype(np.int64))
    dc_codes = M._canon_codes(M._DC_BITS, M._DC_VALS)
    ac_codes = M._canon_codes(M._AC_BITS, M._AC_VALS)
    zzs = [[[int(q[j, i][k // 8, k % 8]) for k in M._JPEG_ZIGZAG]
            for i in range(bx)] for j in range(by)]
    frame = bytearray()
    frame += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + \
        bytes([M._JQ] * 64)
    for tc, th, bits, vals in ((0, 0, M._DC_BITS, M._DC_VALS),
                               (1, 0, M._AC_BITS, M._AC_VALS)):
        frame += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)) + bytes([(tc << 4) | th]) + \
            bytes(bits) + bytes(vals)
    frame += b"\xff\xc2" + struct.pack(
        ">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    bw = M._JpegBitWriter()
    pred = 0
    for j in range(by):
        for i in range(bx):
            M._encode_dc(bw, dc_codes, zzs[j][i][0] - pred)
            pred = zzs[j][i][0]
    frame += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
        bytes([1, 0x00]) + bytes([0, 0, 0]) + bw.done()
    bw = M._JpegBitWriter()
    for j in range(by):
        for i in range(bx):
            M._encode_ac_band(bw, ac_codes, zzs[j][i], 1, 63)
    frame += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
        bytes([1, 0x00]) + bytes([1, 63, 0]) + bw.done()
    sub = b"\xff\xd8" + bytes(frame) + b"\xff\xd9"
    recon = [[px[0] for px in row]
             for row in M.decode_jpeg_pixels(sub)["pixels"]]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + struct.pack(
        ">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += frame
    out += b"\xff\xc4" + struct.pack(
        ">H", 19 + len(M._LL_VALS)) + bytes([0x01]) + \
        bytes(M._LL_BITS) + bytes(M._LL_VALS)
    out += b"\xff\xc7" + struct.pack(
        ">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
        bytes([1, 0x10]) + bytes([0, 0, 0])
    out += M._hier_scan_huff([p], [recon], True, 8, 1)
    out += b"\xff\xd9"
    d = decode_jpeg_hierarchical(bytes(out))
    assert d["planes"][0] == p


def test_color_dct_base_raises():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + struct.pack(
        ">HBHHB", 17, 8, 4, 4, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    blob += bytes([0xFF, 0xC0]) + struct.pack(
        ">HBHHB", 17, 8, 4, 4, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_hierarchical(bytes(blob))


def test_forged_dhp_hits_allocation_cap():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + struct.pack(
        ">HBHHB", 11, 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="allocation cap"):
        decode_jpeg_hierarchical(bytes(blob))


def test_missing_exp_mismatched_reference_raises():
    p = _plane(3, 8, 8)
    blob = encode_jpeg_hierarchical([p], levels=2)
    # excise the EXP segment (FF DF 00 03 11): reference stays 4x4
    # while the differential frame claims 8x8
    i = blob.index(b"\xff\xdf")
    broken = blob[:i] + blob[i + 5:]
    with pytest.raises(ValueError, match="missing EXP"):
        decode_jpeg_hierarchical(broken)


# ------------------------------------------------------------------
# property roundtrips (both arms)
# ------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    levels=st.integers(1, 3),
    arith=st.booleans(),
    prec=st.sampled_from([2, 8, 12, 16]),
)
def test_property_roundtrip(data, w, h, levels, arith, prec):
    if (max(w, h) >> (levels - 1)) < 1:
        levels = 1
    mod = 1 << prec
    p = [[data.draw(st.integers(0, mod - 1)) for _ in range(w)]
         for _ in range(h)]
    blob = encode_jpeg_hierarchical([p], levels=levels,
                                    precision=prec, arithmetic=arith)
    d = decode_jpeg_hierarchical(blob)
    assert d["planes"][0] == p


# ------------------------------------------------------------------
# DCT base + lossless residual (T.81 K.5 lossy-preview-plus-exact)
# ------------------------------------------------------------------


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (10, 9), (17, 23)])
def test_dct_base_roundtrip_exact(arith, w, h):
    """DHP + grayscale SOF0 base + SOF7/SOFF residual decodes to the
    SOURCE exactly — the lossy preview plus lossless refinement."""
    from connect_spark.text.media_codecs import (
        encode_jpeg_hierarchical_dct,
    )

    p = _plane(w * 31 + h, w, h)
    blob = encode_jpeg_hierarchical_dct(p, arithmetic_residual=arith)
    d = decode_jpeg_hierarchical(blob)
    assert d["planes"][0] == p
    # and the stream carries a REAL SOF0 base
    assert b"\xff\xc0" in blob
    assert (b"\xff\xcf" if arith else b"\xff\xc7") in blob


def test_dct_base_embedded_preview_is_decodable():
    """The base frame re-framed standalone (SOI + tables + frame +
    EOI) is a valid lossy JPEG close to the source — the decoder's
    own substream-extraction path exercised end-to-end through the
    public decode, plus a direct quality check on the preview."""
    from connect_spark.text.media_codecs import (
        _gray_dct_frame_bytes,
        encode_jpeg_hierarchical_dct,
    )

    p = [[(3 * x + 5 * y) % 256 for x in range(24)]
         for y in range(16)]
    sub = b"\xff\xd8" + _gray_dct_frame_bytes(p) + b"\xff\xd9"
    d = decode_jpeg_pixels(sub)
    err = max(abs(d["pixels"][y][x][0] - p[y][x])
              for y in range(16) for x in range(24))
    assert err <= 16  # flat-8 quantization keeps the preview close
    # the hierarchical stream is exact despite the lossy base
    blob = encode_jpeg_hierarchical_dct(p)
    assert decode_jpeg_hierarchical(blob)["planes"][0] == p


def test_dct_base_delegations():
    from connect_spark.text.media_codecs import (
        encode_jpeg_hierarchical_dct,
    )

    p = _plane(77, 9, 6)
    blob = encode_jpeg_hierarchical_dct(p, arithmetic_residual=True)
    assert decode_jpeg_lossless(blob)["planes"][0] == p
    px = decode_jpeg_pixels(blob)
    assert px["pixels"][2][3] == (p[2][3],) * 3


def test_dct_base_validation():
    from connect_spark.text.media_codecs import (
        encode_jpeg_hierarchical_dct,
    )

    with pytest.raises(ValueError, match="8-bit"):
        encode_jpeg_hierarchical_dct([[300]])
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg_hierarchical_dct([])


def test_qm_flush_all_mps_stream_terminates():
    """Regression (r13): an all-MPS QM stream keeps the code
    register at 0; flush's power-of-two alignment search must stop
    at candidate 0 instead of looping forever.  Surfaced by the
    1x1 DCT-base residual; also hit plain SOFB on tiny constant
    planes."""
    from connect_spark.text.media_codecs import (
        decode_jpeg_lossless,
        encode_jpeg_lossless_arith,
    )

    for p in ([[128]], [[128, 128]], [[128] * 4] * 3):
        blob = encode_jpeg_lossless_arith([p])
        assert decode_jpeg_lossless(blob)["planes"][0] == p


def test_sos_with_zero_components_raises():
    """Regression (r13, found by the DCT-base mutation hunt): an
    SOS declaring ns=0 must raise, not crash the non-interleaved
    scan path with IndexError."""
    import struct as _st

    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xC0]) + _st.pack(
        ">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob += b"\xff\xda" + _st.pack(">HB", 6, 0) + b"\x00\x3f\x00"
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_pixels(bytes(blob))


def test_truncated_dct_base_header_raises():
    import struct as _st

    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + _st.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    # SOF0 claiming nc=1 but with the component spec cut off
    blob += bytes([0xFF, 0xC0]) + _st.pack(">HBHHB", 8, 8, 4, 4, 1)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_hierarchical(bytes(blob))


# ------------------------------------------------------------------
# differential DCT frames (SOF5): multi-level lossy pyramid + exact
# final residual
# ------------------------------------------------------------------


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("levels", [1, 2, 3])
def test_dct_pyramid_roundtrip_exact(arith, levels):
    from connect_spark.text.media_codecs import (
        encode_jpeg_hierarchical_dct,
    )

    p = _plane(levels * 10 + arith, 33, 21)
    blob = encode_jpeg_hierarchical_dct(
        p, levels=levels, arithmetic_residual=arith)
    assert decode_jpeg_hierarchical(blob)["planes"][0] == p
    if levels > 1:
        assert b"\xff\xc5" in blob  # real SOF5 differential frames


def test_dct_diff_scan_pair_consistent():
    """Encoder and decoder share _dct_diff_reconstruct, so the
    reconstructed difference agrees bit-exactly."""
    import random as _r

    from connect_spark.text.media_codecs import (
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
        _dct_diff_scan_decode,
        _dct_diff_scan_encode,
        _JpegHuff,
    )

    rng = _r.Random(7)
    for (w, h) in [(8, 8), (10, 9), (1, 1), (17, 5)]:
        diff = [[rng.randrange(-200, 201) for _ in range(w)]
                for _ in range(h)]
        bits, recon_enc = _dct_diff_scan_encode(diff)
        recon_dec, _end = _dct_diff_scan_decode(
            bits + b"\xff\xd9", 0, w, h,
            _JpegHuff(_DC_BITS, _DC_VALS),
            _JpegHuff(_AC_BITS, _AC_VALS))
        assert recon_dec == recon_enc
        err = max(abs(recon_enc[y][x] - diff[y][x])
                  for y in range(h) for x in range(w))
        assert err <= 8  # flat-8 quantization bound


def test_sof5_without_reference_raises():
    blob = bytearray(b"\xff\xd8")
    blob += bytes([0xFF, 0xDE]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    blob += bytes([0xFF, 0xC5]) + struct.pack(
        ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="before any"):
        decode_jpeg_hierarchical(bytes(blob))


def test_arith_or_progressive_differential_dct_raise():
    for mk in (0xC6, 0xCD, 0xCE):
        blob = bytearray(b"\xff\xd8")
        blob += bytes([0xFF, 0xDE]) + struct.pack(
            ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
        blob += bytes([0xFF, mk]) + struct.pack(
            ">HBHHB", 11, 8, 4, 4, 1) + bytes([1, 0x11, 0])
        with pytest.raises(ValueError,
                           match="progressive/arithmetic"):
            decode_jpeg_hierarchical(bytes(blob))


def test_corrupt_dht_dc_category_raises():
    """Regression (r13, found by the SOF5 mutation hunt): a corrupt
    DHT can map a code to a DC category > 16, which would build an
    unbounded coefficient (199-bit ints crashed the numpy
    dequantize); the scan decoder must reject it."""
    import struct as _st

    blob = bytearray(b"\xff\xd8")
    blob += b"\xff\xdb" + _st.pack(">H", 67) + bytes([0]) + \
        bytes([8] * 64)
    # DHT mapping the single 1-bit code to category 199
    blob += b"\xff\xc4" + _st.pack(">H", 20) + bytes([0x00]) + \
        bytes([1] + [0] * 15) + bytes([199])
    blob += b"\xff\xc4" + _st.pack(">H", 20) + bytes([0x10]) + \
        bytes([1] + [0] * 15) + bytes([0x00])
    blob += b"\xff\xc0" + _st.pack(">HBHHB", 11, 8, 8, 8, 1) + \
        bytes([1, 0x11, 0])
    blob += b"\xff\xda" + _st.pack(">HB", 8, 1) + bytes([1, 0x00]) + \
        b"\x00\x3f\x00" + bytes([0x00] * 64)
    blob += b"\xff\xd9"
    with pytest.raises(ValueError, match="DC category"):
        decode_jpeg_pixels(bytes(blob))
