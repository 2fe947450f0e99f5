"""REAL pure-Python media codecs for the uncompressed container
formats — no external libraries needed, so these paths are never
stubbed: RIFF/WAVE PCM audio and BMP (BITMAPINFOHEADER, 24-bit)
images, both from their public format specifications.

Compressed codecs (JPEG/PNG/MP3/H.264) stay behind the honest
`decode_stub` gates in text/multimodal.py — the container has no
codec libraries — but WAV/BMP cover the real plumbing end to end:
bytes → typed features with exact integer math both engines can
verify.
"""

from __future__ import annotations

import struct


# --- RIFF/WAVE PCM ---------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int = 8000,
               n_channels: int = 1, bits: int = 16) -> bytes:
    """Interleaved integer samples → a canonical RIFF/WAVE file
    (fmt + data chunks, PCM)."""
    if bits == 16:
        frames = b"".join(struct.pack("<h", s) for s in samples)
    elif bits == 8:
        frames = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError("wav: only 8/16-bit PCM")
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE bytes → dict(sample_rate, n_channels, bits,
    n_samples, duration_ms, samples).  Only PCM (format tag 1);
    unknown chunks are skipped per the RIFF contract."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    i = 12
    fmt = None
    data = None
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i:i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8:i + 8 + size]
        if len(body) != size:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    tag, n_channels, sample_rate, _br, _ba, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0)
    if tag != 1:
        raise ValueError(f"wav: non-PCM format tag {tag}")
    if bits == 16:
        count = len(data) // 2
        samples = list(struct.unpack(f"<{count}h", data[:count * 2]))
    elif bits == 8:
        samples = [b - 128 for b in data]
    else:
        raise ValueError("wav: only 8/16-bit PCM")
    n_frames = len(samples) // max(n_channels, 1)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_samples": len(samples),
        "duration_ms": n_frames * 1000 // max(sample_rate, 1),
        "samples": samples,
    }


# --- BMP (BITMAPINFOHEADER, 24-bit uncompressed) ---------------------


def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Rows of (r, g, b) top-to-bottom → a 24-bit BMP (bottom-up
    rows, 4-byte padded, BGR byte order — the on-disk convention)."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    raster = bytearray()
    for row in reversed(pixels):
        for r, g, b in row:
            raster += bytes((b, g, r))
        raster += b"\x00" * pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        len(raster), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(raster), 0, 0, offset)
    return header + info + bytes(raster)


def decode_bmp(payload: bytes) -> dict:
    """BMP bytes → dict(width, height, mean_r, mean_g, mean_b ×1000
    integer).  24-bit uncompressed BITMAPINFOHEADER only (the format
    every tool can emit); compression or other depths raise."""
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height, _planes, depth, compression) = \
        struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER not supported")
    if depth != 24 or compression != 0:
        raise ValueError(
            f"bmp: only 24-bit uncompressed (depth={depth}, "
            f"compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    need = offset + stride * height
    if len(payload) < need:
        raise ValueError("bmp: truncated raster")
    tot_r = tot_g = tot_b = 0
    for y in range(height):
        base = offset + y * stride
        row = payload[base:base + row_bytes]
        tot_b += sum(row[0::3])
        tot_g += sum(row[1::3])
        tot_r += sum(row[2::3])
    n = max(width * height, 1)
    return {
        "width": width,
        "height": height,
        "bottom_up": bottom_up,
        "mean_r_x1000": tot_r * 1000 // n,
        "mean_g_x1000": tot_g * 1000 // n,
        "mean_b_x1000": tot_b * 1000 // n,
    }


def decode_bmp_pixels(payload: bytes) -> dict:
    """BMP bytes → dict(width, height, pixels) with pixels as
    top-to-bottom rows of (r, g, b) tuples — the exact inverse of
    encode_bmp.  Same format envelope as decode_bmp (24-bit
    uncompressed BITMAPINFOHEADER)."""
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height, _planes, depth, compression) = \
        struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER not supported")
    if depth != 24 or compression != 0:
        raise ValueError(
            f"bmp: only 24-bit uncompressed (depth={depth}, "
            f"compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if len(payload) < offset + stride * height:
        raise ValueError("bmp: truncated raster")
    rows = []
    for y in range(height):
        base = offset + y * stride
        raw = payload[base:base + row_bytes]
        rows.append([(raw[i + 2], raw[i + 1], raw[i])
                     for i in range(0, row_bytes, 3)])
    if bottom_up:
        rows.reverse()
    return {"width": width, "height": height, "pixels": rows}


def resize_bmp(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor raster resize: output pixel (x, y) in
    top-down coordinates samples source pixel
    (x * w // new_w, y * h // new_h).  Decode → resample → re-encode,
    all through this module's own codecs."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("bmp: resize dims must be positive")
    d = decode_bmp_pixels(payload)
    w, h, px = d["width"], d["height"], d["pixels"]
    out = [[px[y * h // new_h][x * w // new_w] for x in range(new_w)]
           for y in range(new_h)]
    return encode_bmp(out)
