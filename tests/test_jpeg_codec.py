"""JPEG codec (text/media_codecs.py): golden-vector pins plus
hand-ASSEMBLED streams built with an independent bit-writer in this
file (4:2:0 sampling, DRI/RSTn restarts, grayscale scans, 16-bit DQT,
and PROGRESSIVE SOF2 scans — DC/AC successive approximation, EOB
runs, component-grid traversal — with every bit hand-computed from
T.81 G.1.2 and one stream asserted pixel-equal to a baseline twin
carrying identical coefficients) so encoder and decoder can't share a
bug — the decoder is exercised on streams the encoder cannot
produce."""

from __future__ import annotations

import struct

import pytest

from connect_spark.text.media_codecs import (
    decode_jpeg_pixels,
    decode_raster_pixels,
    encode_jpeg,
    jpeg_rgb_to_ycc,
    jpeg_ycc_to_rgb,
    resize_jpeg,
    resize_raster,
)

# ---- independent test-side helpers (no codec imports) ----------------

# canonical codes for the simple tables the repo's DHT carries:
# DC: 12 symbols, all length 4 -> symbol s has code s.
# AC: 162 symbols, all length 8 -> EOB=0, ZRL=1, (run,size)=2+run*10+size-1.
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)]
AC_BITS = [0] * 7 + [162] + [0] * 8


class BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, k):
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def dc(self, diff):
        size = 0 if diff == 0 else abs(diff).bit_length()
        self.put(size, 4)  # DC symbol s == code s, 4 bits
        if size:
            self.put(diff if diff >= 0 else diff + (1 << size) - 1, size)

    def eob(self):
        self.put(0, 8)  # AC symbol 0x00 -> canonical code 0, 8 bits

    def done(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.buf)


def seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def dqt(tq, val, precision16=False):
    if precision16:
        return seg(0xDB, bytes([0x10 | tq]) + struct.pack(">H", val) * 64)
    return seg(0xDB, bytes([tq]) + bytes([val]) * 64)


def dht_all():
    out = b""
    for tc, th, bits, vals in ((0, 0, DC_BITS, DC_VALS),
                               (0, 1, DC_BITS, DC_VALS),
                               (1, 0, AC_BITS, AC_VALS),
                               (1, 1, AC_BITS, AC_VALS)):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))
    return out


# ---- golden vector: pinned encoder bytes + pinned decode -------------

def test_encoder_golden_vector_pinned():
    rows = [[(10 * x, 20 * y, 30) for x in range(8)] for y in range(8)]
    enc = encode_jpeg(rows)
    # pinned byte-for-byte: any drift in FDCT, quantization, Huffman
    # assignment, marker layout, or color math changes this hex
    assert enc.hex() == GOLDEN_8x8_HEX
    d = decode_jpeg_pixels(bytes.fromhex(GOLDEN_8x8_HEX))
    assert (d["width"], d["height"]) == (8, 8)
    # corners pinned by hand through the published integer math
    assert d["pixels"][0][0] == GOLDEN_CORNERS[0]
    assert d["pixels"][0][7] == GOLDEN_CORNERS[1]
    assert d["pixels"][7][0] == GOLDEN_CORNERS[2]
    assert d["pixels"][7][7] == GOLDEN_CORNERS[3]


def test_constant_block_roundtrip_lossless_in_ycc():
    for rgb in ((0, 0, 0), (255, 255, 255), (10, 200, 30), (128, 128, 128)):
        rows = [[rgb] * 8 for _ in range(8)]
        d = decode_jpeg_pixels(encode_jpeg(rows))
        want = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(*rgb))
        assert all(p == want for r in d["pixels"] for p in r)


def test_gradient_within_quantization_error():
    rows = [[((x * 16 + y) % 256, (x * 7 + y * 11) % 256,
              (x * 3 + y * 29) % 256) for x in range(16)]
            for y in range(16)]
    d = decode_jpeg_pixels(encode_jpeg(rows))
    for ry, rd in zip(rows, d["pixels"]):
        for (pr, pg, pb), (qr, qg, qb) in zip(ry, rd):
            assert abs(pr - qr) <= 24
            assert abs(pg - qg) <= 24
            assert abs(pb - qb) <= 24


def test_grayscale_identity_roundtrip():
    # R=G=B=v -> Y=v, Cb=Cr=128 exactly, so grayscale constant blocks
    # roundtrip to the IDENTICAL RGB
    for v in (0, 1, 127, 128, 254, 255):
        rows = [[(v, v, v)] * 8 for _ in range(8)]
        d = decode_jpeg_pixels(encode_jpeg(rows))
        assert all(p == (v, v, v) for r in d["pixels"] for p in r)


# ---- hand-assembled streams the encoder cannot produce ---------------

def _sof(marker, h, w, comps):
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        body += bytes([cid, hv, tq])
    return seg(marker, body)


def _sos(comps):
    body = bytes([len(comps)])
    for cid, tdta in comps:
        body += bytes([cid, tdta])
    return body + b"\x00\x3f\x00"


def test_decode_420_subsampled_hand_built():
    """16x16 constant (200, 120, 40) as a 4:2:0 stream: one MCU of
    four Y blocks + one Cb + one Cr; decoded RGB pinned by hand."""
    # Y=135, Cb=75, Cr=175 through the published forward math
    assert jpeg_rgb_to_ycc(200, 120, 40) == (135, 75, 175)
    w = BitW()
    w.dc(135 - 128)   # Y block 1: DC=7 after /8 quant
    w.eob()
    for _ in range(3):  # Y blocks 2..4: diff 0
        w.dc(0)
        w.eob()
    w.dc(75 - 128)    # Cb: diff -53
    w.eob()
    w.dc(175 - 128)   # Cr: diff 47
    w.eob()
    buf = (b"\xff\xd8" + dqt(0, 8) + dqt(1, 8)
           + _sof(0xC0, 16, 16, [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)])
           + dht_all()
           + seg(0xDA, _sos([(1, 0x00), (2, 0x11), (3, 0x11)]))
           + w.done() + b"\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert (d["width"], d["height"]) == (16, 16)
    # hand-computed inverse: r=135+floor(16873+128 /256)=201,
    # g=135-floor((-4664+8601+128)/256)=120, b=135+floor(-23806/256)=41
    assert jpeg_ycc_to_rgb(135, 75, 175) == (201, 120, 41)
    assert all(p == (201, 120, 41) for r in d["pixels"] for p in r)


def test_decode_dri_restart_markers_grayscale():
    """8x16 single-component scan with DRI=1: an RST0 between the two
    MCUs, DC predictors reset across it."""
    w1 = BitW()
    w1.dc(100 - 128)
    w1.eob()
    w2 = BitW()
    w2.dc(50 - 128)   # full value again: predictor was reset
    w2.eob()
    buf = (b"\xff\xd8" + dqt(0, 8)
           + _sof(0xC0, 8, 16, [(1, 0x11, 0)])
           + dht_all()
           + seg(0xDD, struct.pack(">H", 1))  # DRI = 1
           + seg(0xDA, _sos([(1, 0x00)]))
           + w1.done() + b"\xff\xd0" + w2.done() + b"\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert (d["width"], d["height"]) == (16, 8)
    assert d["pixels"][0][0] == (100, 100, 100)
    assert d["pixels"][0][15] == (50, 50, 50)


def test_decode_16bit_dqt():
    w = BitW()
    w.dc(7)
    w.eob()
    buf = (b"\xff\xd8" + dqt(0, 8, precision16=True)
           + _sof(0xC0, 8, 8, [(1, 0x11, 0)])
           + dht_all()
           + seg(0xDA, _sos([(1, 0x00)]))
           + w.done() + b"\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert all(p == (135, 135, 135) for r in d["pixels"] for p in r)


def test_lossless_arithmetic_now_decodes():
    """SOF9/SOFA decode for real since round 11, SOF3/SOFB since
    round 12 (tests/test_jpeg_lossless.py); the honest gate is down
    to differential/hierarchical frames."""
    from connect_spark.text.media_codecs import (
        encode_jpeg_lossless_arith)

    d = decode_jpeg_pixels(encode_jpeg_lossless_arith([[[9, 200]]]))
    assert d["pixels"] == [[(9, 9, 9), (200, 200, 200)]]
    base = b"\xff\xd8" + dqt(0, 8)
    sofd = _sof(0xC5, 8, 8, [(1, 0x11, 0)])
    with pytest.raises(ValueError, match="differential"):
        decode_jpeg_pixels(base + sofd + b"\xff\xd9")
    # arithmetic frame headers no longer error — scanless frames
    # decode like their Huffman siblings (all-zero coefs → mid-gray)
    for marker in (0xC9, 0xCA):
        sofx = _sof(marker, 8, 8, [(1, 0x11, 0)])
        d = decode_jpeg_pixels(base + sofx + b"\xff\xd9")
        assert d["pixels"][0][0] == (128, 128, 128)


# ---- progressive (SOF2) streams, hand-assembled ----------------------

def _sos_prog(comps, ss, se, ah, al):
    body = bytes([len(comps)])
    for cid, tdta in comps:
        body += bytes([cid, tdta])
    return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def test_progressive_dc_successive_approximation():
    """8x16 grayscale, two constant blocks (100, 53): DC sent in a
    coarse Al=1 scan (diff-coded c>>1: -14, then -38-(-14)=-24) plus
    an Ah=1->Al=0 refinement scan carrying the low bits (0, 1); an
    AC first scan covers band 1-63 with an EOB run spanning both
    blocks.  Every bit hand-computed."""
    # scan 1: DC first, Al=1
    w1 = BitW()
    w1.dc(-14)            # block 1: c=-28 -> -28>>1 = -14
    w1.dc(-38 - (-14))    # block 2: c=-75 -> -75>>1 = -38; diff -24
    # scan 2: AC first, band 1..63, Al=0 — EOB1 with appended bit 0
    # covers both blocks (run = 2^1 + 0 = 2)
    # EOBn symbols are rs = (r<<4)|0; the simple table only carries
    # EOB0 (0x00) and ZRL (0xF0), so hand-build a DHT with 0x10 (EOB1)
    # appended as the 163rd canonical 8-bit code.
    w2 = BitW()
    w2.put(162, 8)        # EOB1
    w2.put(0, 1)          # appended bit: run = 2 + 0
    # scan 3: DC refinement Ah=1, Al=0: one raw bit per block
    w3 = BitW()
    w3.put(0, 1)          # block 1: -28 & 1 = 0
    w3.put(1, 1)          # block 2: -75 & 1 = 1
    ac_vals = AC_VALS + [0x10]
    ac_bits = [0] * 7 + [163] + [0] * 8
    dht = (seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)))
    buf = (b"\xff\xd8" + dqt(0, 8)
           + _sof(0xC2, 8, 16, [(1, 0x11, 0)])
           + dht
           + _sos_prog([(1, 0x00)], 0, 0, 0, 1) + w1.done()
           + _sos_prog([(1, 0x00)], 1, 63, 0, 0) + w2.done()
           + _sos_prog([(1, 0x00)], 0, 0, 1, 0) + w3.done()
           + b"\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert (d["width"], d["height"]) == (16, 8)
    assert d["pixels"][0][0] == (100, 100, 100)   # -28 + 128
    assert d["pixels"][0][15] == (53, 53, 53)     # -75 + 128
    assert all(p == (100, 100, 100) for row in d["pixels"]
               for p in row[:8])
    assert all(p == (53, 53, 53) for row in d["pixels"]
               for p in row[8:])


def test_progressive_ac_refinement_equals_baseline():
    """One 8x8 grayscale block with AC coefficients {k1: 5, k3: -1,
    k10: -9} (zigzag indices), DC 100-128=-28.  Progressive: DC first
    (Al=0), AC first with Al=1 (sends trunc(c/2): 2, 0, -4 — the -1
    vanishes), AC refinement Ah=1->Al=0 (correction bits 1 and 1 for
    k1/k10, the -1 appears as newly-nonzero).  Baseline twin carries
    the identical final coefficients; both streams must decode to the
    SAME pixels.  Every bit hand-computed from T.81 G.1.2."""
    # --- progressive stream ---
    p1 = BitW()
    p1.dc(-28)                     # DC first scan, Al=0
    p2 = BitW()                    # AC first, band 1..63, Al=1
    p2.put(2 + 0 * 10 + (2 - 1), 8)   # (r=0,s=2) -> code 2+0*10+1 = 3
    p2.put(0b10, 2)                # value 2
    p2.put(2 + 8 * 10 + (3 - 1), 8)   # (r=8,s=3) -> code 2+80+2 = 84
    p2.put(0b011, 3)               # value -4 -> -4+7 = 3
    p2.put(0, 8)                   # EOB0
    p3 = BitW()                    # AC refinement, Ah=1, Al=0
    p3.put(2 + 1 * 10 + (1 - 1), 8)   # (r=1,s=1): new coef after 1 zero
    p3.put(0, 1)                   # its sign: -1
    p3.put(1, 1)                   # correction for k=1 (5 = 4+1)
    # k=2 consumes the run, k=3 places the new -1
    p3.put(0, 8)                   # EOB0 -> correction sweep k=4..63
    p3.put(1, 1)                   # correction for k=10 (-9 = -8-1)
    buf_prog = (b"\xff\xd8" + dqt(0, 8)
                + _sof(0xC2, 8, 8, [(1, 0x11, 0)])
                + dht_all()
                + _sos_prog([(1, 0x00)], 0, 0, 0, 0) + p1.done()
                + _sos_prog([(1, 0x00)], 1, 63, 0, 1) + p2.done()
                + _sos_prog([(1, 0x00)], 1, 63, 1, 0) + p3.done()
                + b"\xff\xd9")
    # --- baseline twin with the same final coefficients ---
    b1 = BitW()
    b1.dc(-28)
    b1.put(2 + 0 * 10 + (3 - 1), 8)   # k=1: (r=0,s=3)
    b1.put(0b101, 3)               # 5
    b1.put(2 + 1 * 10 + (1 - 1), 8)   # k=3: (r=1,s=1)
    b1.put(0b0, 1)                 # -1
    b1.put(2 + 6 * 10 + (4 - 1), 8)   # k=10: (r=6,s=4)
    b1.put(0b0110, 4)              # -9 -> -9+15 = 6
    b1.put(0, 8)                   # EOB
    buf_base = (b"\xff\xd8" + dqt(0, 8)
                + _sof(0xC0, 8, 8, [(1, 0x11, 0)])
                + dht_all()
                + seg(0xDA, _sos([(1, 0x00)]))
                + b1.done() + b"\xff\xd9")
    dp = decode_jpeg_pixels(buf_prog)
    db = decode_jpeg_pixels(buf_base)
    assert dp["pixels"] == db["pixels"]
    # sanity: the AC structure is visible (block is not constant)
    flat = {p for row in db["pixels"] for p in row}
    assert len(flat) > 1


def test_resize_dispatch_and_png_output():
    rows = [[((x // 8 * 100) % 256, 50, (y // 8 * 100) % 256)
             for x in range(16)] for y in range(16)]
    enc = encode_jpeg(rows)
    out = resize_raster(enc, 2, 2)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"  # lossless thumbnail target
    d = decode_raster_pixels(out)
    assert (d["width"], d["height"]) == (2, 2)
    for by in range(2):
        for bx in range(2):
            want = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(
                (bx * 100) % 256, 50, (by * 100) % 256))
            assert d["pixels"][by][bx] == want
    assert resize_jpeg(enc, 4, 4)[:8] == b"\x89PNG\r\n\x1a\n"


def test_byte_stuffing_roundtrip():
    # hunt a block whose entropy stream contains a stuffed 0xFF
    for v in range(0, 256, 3):
        rows = [[(v, (v * 3) % 256, (v * 7) % 256)] * 8 for _ in range(8)]
        enc = encode_jpeg(rows)
        d = decode_jpeg_pixels(enc)
        want = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(v, (v * 3) % 256,
                                                (v * 7) % 256))
        assert all(p == want for r in d["pixels"] for p in r)


# encode_jpeg([[(10x, 20y, 30) for x in 0..7] for y in 0..7]) — 649
# bytes, pinned byte-for-byte (SOI/APP0/DQTx2/SOF0/DHTx4/SOS/EOI with
# the entropy-coded gradient block)
GOLDEN_8x8_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb004300080808080808080"
    "80808080808080808080808080808080808080808080808080808080808080808"
    "080808080808080808080808080808080808080808080808ffdb0043010808080"
    "80808080808080808080808080808080808080808080808080808080808080808"
    "08080808080808080808080808080808080808080808080808080808ffc000110"
    "80008000803011100021101031101ffc4001f000000000c000000000000000000"
    "000000000102030405060708090a0bffc4001f010000000c00000000000000000"
    "0000000000102030405060708090a0bffc400b51000000000000000a200000000"
    "0000000000f00102030405060708090a1112131415161718191a2122232425262"
    "728292a3132333435363738393a4142434445464748494a515253545556575859"
    "5a6162636465666768696a7172737475767778797a8182838485868788898a919"
    "2939495969798999aa1a2a3a4a5a6a7a8a9aab1b2b3b4b5b6b7b8b9bac1c2c3c4"
    "c5c6c7c8c9cad1d2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f"
    "7f8f9faffc400b51100000000000000a2000000000000000000f0010203040506"
    "0708090a1112131415161718191a2122232425262728292a31323334353637383"
    "93a4142434445464748494a5152535455565758595a6162636465666768696a71"
    "72737475767778797a8182838485868788898a9192939495969798999aa1a2a3a"
    "4a5a6a7a8a9aab1b2b3b4b5b6b7b8b9bac1c2c3c4c5c6c7c8c9cad1d2d3d4d5d6"
    "d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda000c030100021"
    "10311003f0076c0801884017198008209017cfe00410540699005e66807ffd9"
)
GOLDEN_CORNERS = [(1, 0, 29), (69, 0, 31), (2, 140, 29), (70, 142, 32)]


# ---- MJPEG-in-AVI container ------------------------------------------

def test_avi_mjpeg_roundtrip():
    from connect_spark.text.media_codecs import (
        decode_avi_frames, encode_avi_mjpeg)

    f0 = [[(10, 20, 30)] * 8 for _ in range(8)]
    f1 = [[(200, 100, 50)] * 8 for _ in range(8)]
    f2 = [[(0, 255, 128)] * 8 for _ in range(8)]
    avi = encode_avi_mjpeg([f0, f1, f2], fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    d = decode_avi_frames(avi)
    assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (8, 8, 5, 3)
    for frame, (r, g, b) in zip(d["frames"],
                                [(10, 20, 30), (200, 100, 50),
                                 (0, 255, 128)]):
        want = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(r, g, b))
        assert all(p == want for row in frame for p in row)


def test_avi_rejects_non_avi():
    from connect_spark.text.media_codecs import decode_avi_frames

    with pytest.raises(ValueError, match="avi"):
        decode_avi_frames(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="avi"):
        decode_avi_frames(b"not riff at all")


def test_sample_frames_real_mjpeg_avi(spark):
    from connect_spark.text.media_codecs import encode_avi_mjpeg
    from connect_spark.text.multimodal import MEDIA_SCHEMA, sample_frames

    frames = [[[(f * 40, 10, 20)] * 8 for _ in range(8)]
              for f in range(3)]
    avi = encode_avi_mjpeg(frames, fps=10)
    df = spark.createDataFrame(
        [(7, bytearray(avi), "video/x-msvideo", {})], MEDIA_SCHEMA)
    rows = sorted(sample_frames(df, n_frames=2).collect(),
                  key=lambda r: r["frame_idx"])
    # real path: 2 of the 3 actual JPEG chunks, fps-derived timestamps
    assert len(rows) == 2
    assert [r["ts_ms"] for r in rows] == [0, 100]
    for r in rows:
        assert bytes(r["frame"])[:2] == b"\xff\xd8"  # real JPEG bytes
        d = decode_jpeg_pixels(bytes(r["frame"]))
        want = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(
            r["frame_idx"] * 40, 10, 20))
        assert d["pixels"][0][0] == want


def test_progressive_420_component_grids():
    """16x16 constant (200, 120, 40) as PROGRESSIVE 4:2:0: an
    interleaved DC scan (4 Y blocks + Cb + Cr, Al=0), then three
    non-interleaved AC scans — the Y scan walks ITS OWN 2x2 block
    grid (4 EOB0s), the chroma scans one block each — exercising the
    T.81 A.2.2 component-grid traversal."""
    wdc = BitW()
    wdc.dc(135 - 128)
    for _ in range(3):
        wdc.dc(0)
    wdc.dc(75 - 128)
    wdc.dc(175 - 128)
    acy = BitW()
    for _ in range(4):   # Y: cw=ch=2 -> 4 blocks, each EOB0
        acy.put(0, 8)
    accb = BitW()
    accb.put(0, 8)       # Cb: 1 block
    accr = BitW()
    accr.put(0, 8)       # Cr: 1 block
    buf = (b"\xff\xd8" + dqt(0, 8) + dqt(1, 8)
           + _sof(0xC2, 16, 16, [(1, 0x22, 0), (2, 0x11, 1),
                                 (3, 0x11, 1)])
           + dht_all()
           + _sos_prog([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 0)
           + wdc.done()
           + _sos_prog([(1, 0x00)], 1, 63, 0, 0) + acy.done()
           + _sos_prog([(2, 0x11)], 1, 63, 0, 0) + accb.done()
           + _sos_prog([(3, 0x11)], 1, 63, 0, 0) + accr.done()
           + b"\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert (d["width"], d["height"]) == (16, 16)
    assert all(p == (201, 120, 41) for r in d["pixels"] for p in r)


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes."""
    w = BitW()
    w.dc(7)
    w.eob()
    buf = (b"\xff\xd8" + b"\xff" + dqt(0, 8)
           + b"\xff\xff" + _sof(0xC0, 8, 8, [(1, 0x11, 0)])
           + dht_all()
           + seg(0xDA, _sos([(1, 0x00)]))
           + w.done() + b"\xff\xff\xd9")
    d = decode_jpeg_pixels(buf)
    assert all(p == (135, 135, 135) for r in d["pixels"] for p in r)


def test_progressive_encoder_matches_baseline_pixels():
    """encode_jpeg_progressive reorders the same quantized
    coefficients into SOF2 multi-scan layout — decode must be
    pixel-identical to the baseline encoding, on gradient (AC-rich)
    and constant inputs."""
    from connect_spark.text.media_codecs import encode_jpeg_progressive

    for rows in (
        [[((x * 16 + y) % 256, (x * 7 + y * 11) % 256,
           (x * 3 + y * 29) % 256) for x in range(16)]
         for y in range(16)],
        [[(200, 120, 40)] * 8 for _ in range(8)],
    ):
        prog = encode_jpeg_progressive(rows)
        assert b"\xff\xc2" in prog  # SOF2
        dp = decode_jpeg_pixels(prog)
        db = decode_jpeg_pixels(encode_jpeg(rows))
        assert dp["pixels"] == db["pixels"]


def test_sample_frames_cycles_short_avi(spark):
    """The documented one-row-explodes-to-n_frames contract holds for
    AVIs with fewer chunks than n_frames: chunks cycle (round-10
    ADVICE #2)."""
    from connect_spark.text.media_codecs import encode_avi_mjpeg
    from connect_spark.text.multimodal import MEDIA_SCHEMA, sample_frames

    frames = [[[(f * 40, 10, 20)] * 8 for _ in range(8)]
              for f in range(3)]
    avi = encode_avi_mjpeg(frames, fps=10)
    df = spark.createDataFrame(
        [(7, bytearray(avi), "video/x-msvideo", {})], MEDIA_SCHEMA)
    rows = sorted(sample_frames(df, n_frames=5).collect(),
                  key=lambda r: r["frame_idx"])
    assert len(rows) == 5
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3, 4]
    # cycled frames repeat the chunk bytes modulo len(chunks)
    assert bytes(rows[3]["frame"]) == bytes(rows[0]["frame"])
    assert bytes(rows[4]["frame"]) == bytes(rows[1]["frame"])
    # repetition is visible: source_frame records the true chunk
    # index and ts_ms its true stream position (round-11 ADVICE #4)
    assert [r["source_frame"] for r in rows] == [0, 1, 2, 0, 1]
    assert [r["ts_ms"] for r in rows] == [0, 100, 200, 0, 100]


def test_resize_media_rewrites_jpeg_mime_to_png(spark):
    """resize of a JPEG payload re-encodes to PNG — the mime column
    must describe the NEW container (round-10 ADVICE #1)."""
    from connect_spark.text.media_codecs import _PNG_SIG, encode_jpeg
    from connect_spark.text.multimodal import MEDIA_SCHEMA, resize_media

    jpg = encode_jpeg([[(200, 120, 40)] * 8 for _ in range(8)])
    df = spark.createDataFrame(
        [(1, bytearray(jpg), "image/jpeg", {})], MEDIA_SCHEMA)
    row = resize_media(df, 4, 4).collect()[0]
    assert bytes(row.payload)[:8] == _PNG_SIG
    assert row.mime == "image/png"
    assert row.meta["resize_container"] == "png"


def test_jpeg_truncated_streams_raise_value_error():
    """Corrupt/truncated payloads surface the codec's structured
    'jpeg: ...' ValueError, never IndexError/struct.error (round-10
    ADVICE #3)."""
    full = encode_jpeg([[(99, 99, 99)] * 8 for _ in range(8)])
    for cut in (3, 6, 10, 25, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError, match="jpeg"):
            decode_jpeg_pixels(full[:cut])
    # mangled marker space: SOI then garbage
    with pytest.raises(ValueError, match="jpeg"):
        decode_jpeg_pixels(b"\xff\xd8\xff")
    with pytest.raises(ValueError, match="jpeg"):
        decode_jpeg_pixels(b"\xff\xd8\xff\xda\x00\x03\x01")
