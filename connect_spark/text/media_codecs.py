"""REAL pure-Python media codecs for the container formats the
standard library can carry — no external libraries needed, so these
paths are never stubbed: RIFF/WAVE PCM audio, BMP (BITMAPINFOHEADER,
24-bit) images, and PNG (RGB/RGBA 8-bit, zlib DEFLATE via the stdlib,
all five scanline filters including Paeth), each from its public
format specification.

Codecs the stdlib genuinely cannot decode (JPEG/MP3/H.264 entropy
coding) stay behind the honest `decode_stub` gates in
text/multimodal.py — but WAV/BMP/PNG cover the real plumbing end to
end: bytes → typed features with exact integer math both engines can
verify.
"""

from __future__ import annotations

import struct
import zlib


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


# --- G.711 mu-law (RIFF format tag 7) --------------------------------
#
# The telephony companding codec, from the published G.711 algorithm:
# 8 exponent segments, 4 mantissa bits, bias 132, ones-complement code
# bytes.  Integer-exact both directions, so oracle SQL can reproduce
# expand(compress(x)) bit-for-bit.

_MULAW_BIAS = 0x84       # 132
_MULAW_CLIP = 32635


def mulaw_compress(x: int) -> int:
    """PCM16 sample → 8-bit mu-law code (G.711)."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    if x > _MULAW_CLIP:
        x = _MULAW_CLIP
    x += _MULAW_BIAS
    seg = 7
    for s in range(8):
        if x < (256 << s):
            seg = s
            break
    mant = (x >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant)) & 0xFF


def mulaw_expand(code: int) -> int:
    """8-bit mu-law code → PCM16 sample (exact inverse of the
    quantized compress: expand(compress(x)) is the canonical G.711
    reconstruction level for x)."""
    u = (~code) & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + _MULAW_BIAS) << seg) - _MULAW_BIAS
    return -x if sign else x


def encode_wav_mulaw(samples: list[int], sample_rate: int = 8000,
                     n_channels: int = 1) -> bytes:
    """PCM16 samples → RIFF/WAVE with G.711 mu-law companding
    (format tag 7, 8 bits per sample): the real compress runs here."""
    frames = bytes(mulaw_compress(s) for s in samples)
    block_align = n_channels
    fmt = struct.pack(
        "<HHIIHH", 7, n_channels, sample_rate,
        sample_rate * block_align, block_align, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE bytes → dict(sample_rate, n_channels, bits,
    n_samples, duration_ms, samples).  PCM (format tag 1) and G.711
    mu-law (tag 7, expanded to PCM16 on decode); unknown chunks are
    skipped per the RIFF contract."""
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
    if tag == 7:
        if bits != 8:
            raise ValueError("wav: mu-law must be 8-bit")
        samples = [mulaw_expand(b) for b in data]
    elif tag != 1:
        raise ValueError(f"wav: unsupported format tag {tag}")
    elif bits == 16:
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
        "encoding": "mulaw" if tag == 7 else "pcm",
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


# --- PNG (RGB/RGBA 8-bit, non-interlaced) ----------------------------
#
# Pure-stdlib implementation of the public PNG specification (RFC
# 2083 / W3C PNG): chunk framing with CRC-32, IHDR, IDAT zlib
# DEFLATE, IEND, and the five scanline filters (None/Sub/Up/Average/
# Paeth).  The encoder picks the filter per row with the standard
# minimum-sum-of-absolute-differences heuristic, so round-trips
# exercise every defilter path, not just filter 0.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec 6.6): nearest of left/up/up-left
    to the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    if ft == 0:
        return line
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _defilter_line(ft: int, line: bytearray, prev: bytes,
                   bpp: int) -> None:
    """In-place reconstruction of one scanline (PNG spec 6.2-6.6)."""
    if ft == 0:
        return
    if ft == 1:
        for i in range(bpp, len(line)):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif ft == 2:
        for i in range(len(line)):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ft == 3:
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ft == 4:
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"png: unknown filter type {ft}")


def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Rows of (r, g, b) top-to-bottom → an 8-bit truecolor PNG.
    Per-row adaptive filtering (min-sum-of-abs heuristic, the libpng
    default) so typical rasters emit Sub/Up/Paeth-filtered lines."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * 3)
    for row in pixels:
        line = bytes(v for px in row for v in px)
        best_ft, best_filt, best_score = 0, line, None
        for ft in range(5):
            filt = _filter_line(ft, line, prev, 3)
            score = sum(b if b < 128 else 256 - b for b in filt)
            if best_score is None or score < best_score:
                best_ft, best_filt, best_score = ft, filt, score
        raw.append(best_ft)
        raw += best_filt
        prev = line
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + _png_chunk(b"IEND", b""))


def decode_png_pixels(payload: bytes) -> dict:
    """PNG bytes → dict(width, height, pixels, color_type) with pixels
    as top-to-bottom rows of (r, g, b) tuples — alpha dropped for
    RGBA.  8-bit color types 2 (RGB) and 6 (RGBA), non-interlaced;
    chunk CRCs are verified; IDAT may span multiple chunks."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    i = 8
    n = len(payload)
    ihdr = None
    idat = bytearray()
    while i + 12 <= n:
        (size,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + size]
        if len(data) != size:
            raise ValueError("png: truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + size
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (2, 6):
        raise ValueError(
            f"png: only 8-bit RGB/RGBA (depth={depth}, color={color})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("png: unsupported compression/filter/interlace")
    bpp = 3 if color == 2 else 4
    stride = width * bpp
    recon = zlib.decompress(bytes(idat))
    if len(recon) != height * (stride + 1):
        raise ValueError("png: raster size mismatch")
    rows = []
    prev = bytes(stride)
    pos = 0
    for _y in range(height):
        ft = recon[pos]
        line = bytearray(recon[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        _defilter_line(ft, line, prev, bpp)
        rows.append([(line[x * bpp], line[x * bpp + 1],
                      line[x * bpp + 2]) for x in range(width)])
        prev = bytes(line)
    return {"width": width, "height": height, "pixels": rows,
            "color_type": color}


def resize_png(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor PNG resize, decode → resample →
    re-encode through this module's own codec (same sampling rule as
    resize_bmp)."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("png: resize dims must be positive")
    d = decode_png_pixels(payload)
    w, h, px = d["width"], d["height"], d["pixels"]
    out = [[px[y * h // new_h][x * w // new_w] for x in range(new_w)]
           for y in range(new_h)]
    return encode_png(out)


# --- container dispatch ----------------------------------------------


def decode_raster_pixels(payload: bytes) -> dict:
    """Magic-byte dispatch over the REAL raster codecs: BMP or PNG →
    dict(width, height, pixels) with top-down (r, g, b) rows."""
    if payload[:2] == b"BM":
        return decode_bmp_pixels(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png_pixels(payload)
    raise ValueError("raster: unknown container (not BMP or PNG)")


def resize_raster(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize preserving the input container."""
    if payload[:2] == b"BM":
        return resize_bmp(payload, new_w, new_h)
    if payload[:8] == _PNG_SIG:
        return resize_png(payload, new_w, new_h)
    raise ValueError("raster: unknown container (not BMP or PNG)")


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


# --- GIF (87a/89a, LZW, animated) -------------------------------------
#
# Pure-stdlib implementation of the public GIF89a specification:
# logical screen descriptor, global/local color tables, graphic
# control extensions, multiple image descriptors (animation frames),
# and REAL variable-code-width LZW in both directions (clear/EOI
# codes, table growth to 12 bits, reset on overflow, LSB-first bit
# packing, 255-byte sub-block framing).  Third real raster container
# after BMP and PNG, and the first with FRAMES — so video-style frame
# sampling runs against a genuinely decoded format.


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the just-assigned code needs one more bit once it can be
            # emitted, i.e. as soon as next_code exceeds the current
            # width's range
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([byte])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0          # bit cursor

    def read(size: int) -> int:
        nonlocal pos
        v = 0
        for i in range(size):
            byte = pos >> 3
            if byte >= len(data):
                raise ValueError("gif: truncated LZW stream")
            v |= ((data[byte] >> (pos & 7)) & 1) << i
            pos += 1
        return v

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None
    out = bytearray()
    while True:
        code = read(code_size)
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):           # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        # decoder grows the width one entry "early" relative to the
        # encoder: the NEXT incoming code may already use the wider
        # range once the table can address it
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: list[list[list[int]]],
               palette: list[tuple[int, int, int]],
               delay_cs: int = 50) -> bytes:
    """Frames of palette-index rows (top-down) + a 256-entry-max
    palette → an animated GIF89a (global color table, one graphic
    control extension + image descriptor per frame, real LZW)."""
    if not frames:
        raise ValueError("gif: need at least one frame")
    height = len(frames[0])
    width = len(frames[0][0]) if height else 0
    size_bits = 0
    while (2 << size_bits) < len(palette):
        size_bits += 1
    n_colors = 2 << size_bits
    if n_colors > 256:
        raise ValueError("gif: palette too large")
    gct = bytearray()
    for i in range(n_colors):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (7 << 4) | size_bits, 0, 0)
    out += gct
    min_code = max(2, size_bits + 1)
    for grid in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        raw = bytes(idx for row in grid for idx in row)
        out.append(min_code)
        out += _gif_subblocks(_lzw_encode(raw, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> dict:
    """GIF bytes → dict(width, height, palette, palettes, frames,
    delays_cs) with frames as top-down rows of palette indices.
    `palettes[f]` is frame f's EFFECTIVE color table (its local table
    when present, else the global one); `palette` stays the global
    table.  Walks the real block structure: global/local color
    tables, extension sub-blocks, per-frame LZW decode; interlaced
    images are rejected (honest gate — nothing in this repo emits
    them); truncation anywhere raises ValueError per the module's
    malformed-input contract."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    n_pay = len(payload)

    def _subblocks(j: int) -> tuple[bytearray, int]:
        out = bytearray()
        while True:
            if j >= n_pay:
                raise ValueError("gif: truncated sub-block stream")
            size = payload[j]
            if size == 0:
                return out, j + 1
            if j + 1 + size > n_pay:
                raise ValueError("gif: truncated sub-block")
            out += payload[j + 1:j + 1 + size]
            j += 1 + size

    gct: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > n_pay:
            raise ValueError("gif: truncated global color table")
        gct = [tuple(payload[i + 3 * j:i + 3 * j + 3]) for j in range(n)]
        i += 3 * n
    frames: list[list[list[int]]] = []
    palettes: list[list[tuple[int, int, int]]] = []
    delays: list[int] = []
    pending_delay = 0
    while i < n_pay:
        b0 = payload[i]
        if b0 == 0x3B:                      # trailer
            break
        if b0 == 0x21:                      # extension
            if i + 2 > n_pay:
                raise ValueError("gif: truncated extension header")
            label = payload[i + 1]
            blocks, i = _subblocks(i + 2)
            if label == 0xF9 and len(blocks) >= 4:
                (pending_delay,) = struct.unpack_from("<H", blocks, 1)
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b0:02x}")
        if i + 11 > n_pay:
            raise ValueError("gif: truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload,
                                                        i + 1)
        i += 10
        pal = gct
        if fpacked & 0x80:                  # local color table
            n = 2 << (fpacked & 0x07)
            if i + 3 * n > n_pay:
                raise ValueError("gif: truncated local color table")
            pal = [tuple(payload[i + 3 * j:i + 3 * j + 3])
                   for j in range(n)]
            i += 3 * n
        if fpacked & 0x40:
            raise ValueError("gif: interlaced images not supported")
        if (left, top, fw, fh) != (0, 0, width, height):
            raise ValueError("gif: partial-canvas frames not supported")
        if not pal:
            raise ValueError("gif: frame has neither local nor global "
                             "color table")
        min_code = payload[i]
        i += 1
        lzw, i = _subblocks(i)
        raw = _lzw_decode(bytes(lzw), min_code)
        if len(raw) < fw * fh:
            raise ValueError("gif: short frame raster")
        frames.append([list(raw[y * fw:(y + 1) * fw]) for y in range(fh)])
        palettes.append(pal)
        delays.append(pending_delay)
        pending_delay = 0
    if not frames:
        raise ValueError("gif: no image data")
    return {"width": width, "height": height, "palette": gct,
            "palettes": palettes, "frames": frames, "delays_cs": delays}
