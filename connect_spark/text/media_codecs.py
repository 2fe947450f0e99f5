"""REAL pure-Python media codecs built from the public format
specifications — no external image/audio libraries needed, so these
paths are never stubbed: RIFF/WAVE PCM audio (+ G.711 mu-law), BMP
(BITMAPINFOHEADER, 24-bit), PNG (RGB/RGBA 8-bit, zlib DEFLATE via the
stdlib, all five scanline filters including Paeth), GIF87a/89a
(variable-width LZW both directions, animation frames), and JPEG
(ITU-T T.81: canonical Huffman entropy coding, arbitrary DQT/DHT,
4:4:4/4:2:2/4:2:0 sampling, DRI/RSTn, numpy-vectorized FDCT/IDCT —
baseline AND progressive decode: spectral selection, successive
approximation, EOB runs — plus sequential ARITHMETIC decode: the
T.81 Annex D QM-coder, conformance-pinned coefficient-exact against
libjpeg-turbo).

Codecs genuinely out of pure-Python scope (MP3/H.264 inter-frame
video) stay behind the honest gates in text/multimodal.py —
everything here covers the real plumbing end to end: bytes → typed
features with exact integer math both engines can verify.
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


def _malformed_to_valueerror(fn):
    """Decode-boundary guard (r12 hardening): the module's contract
    is that ANY malformed input raises ValueError; translate the
    low-level struct/zlib failures a truncated or mutated stream can
    reach into that contract instead of guarding every unpack."""
    import functools

    @functools.wraps(fn)
    def wrap(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (struct.error, zlib.error,
                ZeroDivisionError) as exc:
            raise ValueError(
                f"{fn.__name__}: malformed stream ({exc})") from exc
    return wrap


@_malformed_to_valueerror
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


@_malformed_to_valueerror
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


@_malformed_to_valueerror
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


@_malformed_to_valueerror
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


@_malformed_to_valueerror
def decode_raster_pixels(payload: bytes) -> dict:
    """Magic-byte dispatch over the REAL raster codecs: BMP, PNG or
    baseline JPEG → dict(width, height, pixels) with top-down
    (r, g, b) rows."""
    if payload[:2] == b"BM":
        return decode_bmp_pixels(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(payload)
    raise ValueError("raster: unknown container (not BMP/PNG/JPEG)")


def resize_raster(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize preserving the input container (JPEG
    resizes to PNG — see resize_jpeg)."""
    if payload[:2] == b"BM":
        return resize_bmp(payload, new_w, new_h)
    if payload[:8] == _PNG_SIG:
        return resize_png(payload, new_w, new_h)
    if payload[:2] == b"\xff\xd8":
        return resize_jpeg(payload, new_w, new_h)
    raise ValueError("raster: unknown container (not BMP/PNG/JPEG)")


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
        # the decoder still ADDS an entry while processing this final
        # code (its table lags one entry) and may therefore widen
        # before reading EOI; mirror that bump here — without it, any
        # stream whose entry count lands exactly on a power of two at
        # the flush desyncs on the EOI width (found by fuzzing r12)
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
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


@_malformed_to_valueerror
def decode_gif_frames(payload: bytes) -> dict:
    """GIF bytes → dict(width, height, palette, palettes, frames,
    delays_cs, descriptors, bg_index) with frames as top-down rows of
    palette indices (each frame's OWN sub-raster — full-canvas
    reconstruction incl. disposal/transparency is
    compose_gif_frames).  `palettes[f]` is frame f's EFFECTIVE color
    table (its local table when present, else the global one);
    `palette` stays the global table.  `descriptors[f]` carries the
    89a animation state: left/top/width/height placement, disposal
    method (GCE packed bits 2-4), transparency index (GCE flag bit 0)
    or None, interlaced flag (rows are returned DE-interlaced).
    Walks the real block structure: global/local color tables,
    extension sub-blocks, per-frame LZW decode; truncation anywhere
    raises ValueError per the module's malformed-input contract."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
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
    descriptors: list[dict] = []
    pending_delay = 0
    pending_disposal = 0
    pending_transparent: int | None = None
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
                pending_disposal = (blocks[0] >> 2) & 0x07
                pending_transparent = (blocks[3] if blocks[0] & 0x01
                                       else None)
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
        if left + fw > width or top + fh > height:
            raise ValueError("gif: frame exceeds the logical screen")
        if not pal:
            raise ValueError("gif: frame has neither local nor global "
                             "color table")
        min_code = payload[i]
        i += 1
        lzw, i = _subblocks(i)
        raw = _lzw_decode(bytes(lzw), min_code)
        if len(raw) < fw * fh:
            raise ValueError("gif: short frame raster")
        rows = [list(raw[y * fw:(y + 1) * fw]) for y in range(fh)]
        if fpacked & 0x40:
            # de-interlace (GIF89a appendix E: 4 passes — rows 0,8,…
            # then 4,12,… then 2,6,… then odd rows)
            order = ([*range(0, fh, 8)] + [*range(4, fh, 8)]
                     + [*range(2, fh, 4)] + [*range(1, fh, 2)])
            deint = [None] * fh
            for src, dst in enumerate(order):
                deint[dst] = rows[src]
            rows = deint
        frames.append(rows)
        palettes.append(pal)
        delays.append(pending_delay)
        descriptors.append({
            "left": left, "top": top, "width": fw, "height": fh,
            "disposal": pending_disposal,
            "transparent": pending_transparent,
            "interlaced": bool(fpacked & 0x40),
        })
        pending_delay = 0
        pending_disposal = 0
        pending_transparent = None
    if not frames:
        raise ValueError("gif: no image data")
    return {"width": width, "height": height, "palette": gct,
            "palettes": palettes, "frames": frames,
            "delays_cs": delays, "descriptors": descriptors,
            "bg_index": _bg}


def compose_gif_frames(payload: bytes) -> dict:
    """Full inter-frame reconstruction of a GIF89a animation
    (Graphic Control Extension semantics): returns
    dict(width, height, frames) where frames[f] is the COMPOSITED
    full-canvas RGB raster displayed during frame f's delay —
    partial-canvas sub-frames painted at their left/top offsets,
    transparent pixels leaving the underlying canvas visible, and
    the disposal methods applied between frames (1 leave in place,
    2 restore the frame's region to the background color, 3 restore
    it to the pre-frame canvas).  The canvas starts as the logical
    screen's background color (black when the global table is
    absent) — the documented rendering of "background" for an RGB
    target."""
    d = decode_gif_frames(payload)
    w, h = d["width"], d["height"]
    gct = d["palette"]
    bg = (tuple(gct[d["bg_index"]])
          if gct and d["bg_index"] < len(gct) else (0, 0, 0))
    canvas = [[bg] * w for _ in range(h)]
    out = []
    for rows, pal, desc in zip(d["frames"], d["palettes"],
                               d["descriptors"]):
        left, top = desc["left"], desc["top"]
        fw, fh = desc["width"], desc["height"]
        saved = None
        if desc["disposal"] == 3:
            saved = [canvas[top + y][left:left + fw]
                     for y in range(fh)]
        tr = desc["transparent"]
        for y in range(fh):
            crow = canvas[top + y]
            frow = rows[y]
            for x in range(fw):
                idx = frow[x]
                if idx == tr:
                    continue
                if idx >= len(pal):
                    raise ValueError("gif: index outside color table")
                crow[left + x] = tuple(pal[idx])
        out.append([list(r) for r in canvas])
        if desc["disposal"] == 2:
            for y in range(fh):
                canvas[top + y][left:left + fw] = [bg] * fw
        elif desc["disposal"] == 3 and saved is not None:
            for y in range(fh):
                canvas[top + y][left:left + fw] = saved[y]
    return {"width": w, "height": h, "frames": out}


def encode_gif_animation(frame_specs: list[dict],
                         palette: list[tuple[int, int, int]],
                         width: int, height: int,
                         bg_index: int = 0) -> bytes:
    """Animated GIF89a with the FULL per-frame animation surface:
    each spec is {grid (rows of palette indices), left, top,
    disposal (0-3), transparent (index or None), delay_cs,
    interlace (bool)} — partial-canvas placement, transparency and
    interlaced row order all encoded for real (encode_gif stays the
    simple full-canvas fast path)."""
    if not frame_specs:
        raise ValueError("gif: need at least one frame")
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
                       0x80 | (7 << 4) | size_bits, bg_index, 0)
    out += gct
    min_code = max(2, size_bits + 1)
    for spec in frame_specs:
        grid = spec["grid"]
        fh = len(grid)
        fw = len(grid[0]) if fh else 0
        left = int(spec.get("left", 0))
        top = int(spec.get("top", 0))
        if left + fw > width or top + fh > height:
            raise ValueError("gif: frame exceeds the logical screen")
        disposal = int(spec.get("disposal", 0))
        if not 0 <= disposal <= 3:
            raise ValueError("gif: disposal must be 0-3")
        tr = spec.get("transparent")
        flags = (disposal << 2) | (1 if tr is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack(
            "<H", int(spec.get("delay_cs", 5))) + bytes(
            [tr or 0]) + b"\x00"
        interlace = bool(spec.get("interlace"))
        out += b"\x2c" + struct.pack(
            "<HHHH", left, top, fw, fh) + bytes(
            [0x40 if interlace else 0x00])
        rows = grid
        if interlace:
            order = ([*range(0, fh, 8)] + [*range(4, fh, 8)]
                     + [*range(2, fh, 4)] + [*range(1, fh, 2)])
            rows = [grid[r] for r in order]
        raw = bytes(idx for row in rows for idx in row)
        out.append(min_code)
        out += _gif_subblocks(_lzw_encode(raw, min_code))
    out += b"\x3b"
    return bytes(out)


# --- JPEG (baseline DCT, ITU T.81) ------------------------------------
#
# REAL baseline JPEG from the public spec (ITU-T T.81 / ISO 10918-1):
# the decoder handles the full sequential-baseline feature set — DQT
# (8/16-bit, multiple tables), DHT canonical Huffman tables of any
# shape, SOF0/SOF1 with arbitrary h×v sampling factors (4:4:4, 4:2:2,
# 4:2:0 — nearest-replication upsampling), interleaved MCU entropy
# decode with per-component DC prediction, DRI/RSTn restart markers,
# 0xFF00 byte-unstuffing, dequantize → dezigzag → 2-D IDCT (numpy
# separable basis, vectorized over all blocks of a component) →
# level-shift → integer YCbCr→RGB.  Progressive (SOF2) decodes in
# full; arithmetic-coded streams — sequential (SOF9) AND progressive
# (SOFA) — decode through the T.81 Annex D QM-coder below; only
# lossless JPEGs raise honestly.
#
# The encoder emits spec-valid baseline 4:4:4 streams with flat
# quantization tables (value _JQ everywhere) and simple canonical
# Huffman tables carried in DHT (12×4-bit DC codes, 162×8-bit AC
# codes) — any conformant decoder reads them from the stream, and
# flat-_JQ quantization makes constant 8×8 blocks roundtrip
# LOSSLESSLY (DC = 8c, quantized by 8 → c, IDCT → c), which is what
# lets the driver oracle recompute decoded pixels arithmetically
# (queries/textops.py::multimodal_jpeg_resize).
#
# Reference analogue: image payloads moved by the reference's AI/image
# pipelines (internal/impl/openai image processors) — here the decode
# itself is first-class instead of delegated to a SaaS endpoint.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_JQ = 8  # flat quantization value (both tables): 8c / 8 == c exactly


def _jpeg_dct_matrix():
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def jpeg_rgb_to_ycc(r: int, g: int, b: int) -> tuple[int, int, int]:
    """Integer fixed-point JFIF RGB→YCbCr — every operand kept
    non-negative so truncating and flooring division agree (the same
    formula is mirrored verbatim in the DuckDB oracle)."""
    y = min(255, (77 * r + 150 * g + 29 * b + 128) // 256)
    cb = min(255, (32768 - 43 * r - 85 * g + 128 * b + 128) // 256)
    cr = min(255, (32768 + 128 * r - 107 * g - 21 * b + 128) // 256)
    return y, cb, cr


def _fdiv256(x: int) -> int:
    """floor(x / 256) expressed with a non-negative numerator so the
    SQL mirror `(x + 65536) // 256 - 256` is division-semantics-proof."""
    return (x + 65536) // 256 - 256


def jpeg_ycc_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Integer fixed-point YCbCr→RGB inverse (BT.601: 1.402, 0.344,
    0.714, 1.772 scaled by 256), clamped to [0, 255]."""
    r = y + _fdiv256(359 * (cr - 128) + 128)
    g = y - _fdiv256(88 * (cb - 128) + 183 * (cr - 128) + 128)
    b = y + _fdiv256(454 * (cb - 128) + 128)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


# encoder-side canonical Huffman tables (carried in DHT): DC = sizes
# 0..11 as 4-bit codes; AC = EOB, ZRL and every (run 0..15, size 1..10)
# pair as 8-bit codes.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canon_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) canonical assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def done(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_coeff_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _jpeg_quantized(pixels):
    """Shared encoder pipeline: pixels → (h, w, by, bx, q) where q is
    the (3, by, bx, 8, 8) int64 array of quantized DCT coefficients
    (integer RGB→YCbCr, edge-replication padding, vectorized FDCT,
    flat-_JQ quantization)."""
    import numpy as np

    h = len(pixels)
    w = len(pixels[0])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    # vectorized forward color transform — the same integer math as
    # jpeg_rgb_to_ycc (non-negative numerators, floor division), then
    # edge-replication padding to 8-multiples
    rgb = np.asarray(pixels, dtype=np.int64)  # (h, w, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yp = np.minimum((77 * r + 150 * g + 29 * b + 128) // 256, 255)
    cb = np.minimum(
        (32768 - 43 * r - 85 * g + 128 * b + 128) // 256, 255)
    cr = np.minimum(
        (32768 + 128 * r - 107 * g - 21 * b + 128) // 256, 255)
    planes = np.stack([yp, cb, cr])  # (3, h, w)
    planes = np.pad(planes, ((0, 0), (0, ph - h), (0, pw - w)),
                    mode="edge")
    m = _jpeg_dct_matrix()
    by, bx = ph // 8, pw // 8
    # FDCT all blocks of all components at once
    shifted = planes.astype(np.float64) - 128.0
    blocks = (
        shifted.reshape(3, by, 8, bx, 8).transpose(0, 1, 3, 2, 4)
    )  # (3, by, bx, 8, 8)
    coef = np.einsum("ux,cijxy,vy->cijuv", m, blocks, m)
    q = np.floor(np.abs(coef) / _JQ + 0.5).astype(np.int64) * np.sign(
        coef
    ).astype(np.int64)
    return h, w, by, bx, q


def _encode_dc(bw, dc_codes, diff: int) -> None:
    s = _jpeg_category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(_encode_coeff_bits(diff, s), s)


def _encode_ac_band(bw, ac_codes, zz, ss: int, se: int) -> None:
    """Run-length AC coding of zigzag band [ss, se] (baseline body is
    the ss=1, se=63 case; progressive spectral-selection scans reuse
    it per band with EOB0 terminators)."""
    run = 0
    last_nz = max((k for k in range(ss, se + 1) if zz[k]), default=0)
    for k in range(ss, max(last_nz, ss - 1) + 1):
        if k > last_nz:
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _jpeg_category(zz[k])
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_encode_coeff_bits(zz[k], s), s)
        run = 0
    if last_nz < se:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)


def _jpeg_headers(h: int, w: int, sof_marker: int,
                  huffman: bool = True) -> bytearray:
    import struct as _st

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + _st.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        _st.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq in (0, 1):  # DQT ×2 (flat tables)
        out += b"\xff\xdb" + _st.pack(">H", 67) + bytes([tq]) + \
            bytes([_JQ] * 64)
    out += bytes([0xFF, sof_marker]) + _st.pack(
        ">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    if not huffman:  # arithmetic frames carry DAC, not DHT
        return out
    for tc, th, bits, vals in (
        (0, 0, _DC_BITS, _DC_VALS), (0, 1, _DC_BITS, _DC_VALS),
        (1, 0, _AC_BITS, _AC_VALS), (1, 1, _AC_BITS, _AC_VALS),
    ):
        out += b"\xff\xc4" + _st.pack(">H", 19 + len(vals)) + \
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return out


def encode_jpeg(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Top-down (r, g, b) rows → a spec-valid baseline JFIF JPEG:
    integer RGB→YCbCr, edge-replication padding to 8-multiples,
    vectorized FDCT (numpy separable basis), flat-_JQ quantization,
    zigzag, per-component DC diff prediction, canonical Huffman
    entropy coding with byte stuffing, 4:4:4 interleaved MCUs."""
    import struct as _st

    h, w, by, bx, q = _jpeg_quantized(pixels)
    dc_codes = _canon_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canon_codes(_AC_BITS, _AC_VALS)
    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    for j in range(by):
        for i in range(bx):
            for c in range(3):  # 4:4:4 → one block per component per MCU
                blk = q[c, j, i]
                zz = [int(blk[k // 8, k % 8]) for k in _JPEG_ZIGZAG]
                _encode_dc(bw, dc_codes, zz[0] - pred[c])
                pred[c] = zz[0]
                _encode_ac_band(bw, ac_codes, zz, 1, 63)
    out = _jpeg_headers(h, w, 0xC0)
    out += b"\xff\xda" + _st.pack(">HB", 12, 3)  # SOS
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tdta])
    out += b"\x00\x3f\x00"
    out += bw.done()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
        pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Top-down (r, g, b) rows → a spec-valid PROGRESSIVE (SOF2) JFIF
    JPEG using spectral selection: one interleaved DC scan
    (Ss=Se=0, Ah=Al=0) followed by one non-interleaved AC scan per
    component covering band 1..63 — the same quantized coefficients
    as encode_jpeg, reordered into the multi-scan layout, so the two
    encodings decode to IDENTICAL pixels (pinned in
    tests/test_jpeg_codec.py).  Successive approximation (Ah/Al > 0)
    is a decoder-side capability; the gate exercises it via
    hand-built streams."""
    import struct as _st

    h, w, by, bx, q = _jpeg_quantized(pixels)
    dc_codes = _canon_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canon_codes(_AC_BITS, _AC_VALS)
    zzs = [[[None] * bx for _ in range(by)] for _ in range(3)]
    for c in range(3):
        for j in range(by):
            for i in range(bx):
                blk = q[c, j, i]
                zzs[c][j][i] = [
                    int(blk[k // 8, k % 8]) for k in _JPEG_ZIGZAG]
    out = _jpeg_headers(h, w, 0xC2)

    def sos(comps, ss, se):
        import struct as _s
        seg = bytes([len(comps)])
        for cid, tdta in comps:
            seg += bytes([cid, tdta])
        seg += bytes([ss, se, 0])
        return b"\xff\xda" + _s.pack(">H", len(seg) + 2) + seg

    # scan 1: interleaved DC
    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    for j in range(by):
        for i in range(bx):
            for c in range(3):
                dc = zzs[c][j][i][0]
                _encode_dc(bw, dc_codes, dc - pred[c])
                pred[c] = dc
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0) + bw.done()
    # scans 2-4: per-component AC band 1..63 (non-interleaved)
    for c, cid in ((0, 1), (1, 2), (2, 3)):
        bw = _JpegBitWriter()
        for j in range(by):
            for i in range(bx):
                _encode_ac_band(bw, ac_codes, zzs[c][j][i], 1, 63)
        out += sos([(cid, 0x00 if c == 0 else 0x01)], 1, 63) + bw.done()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any real marker (RSTn handled via
    `restart()`)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("jpeg: truncated stream")
        b = self.buf[self.pos]
        if b == 0xFF:
            # a 0xFF as the very last byte reads as past-segment-end
            # (same 1-padding as EOI) rather than an IndexError
            nxt = (self.buf[self.pos + 1]
                   if self.pos + 1 < len(self.buf) else 0xD9)
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("jpeg: hit restart marker mid-symbol")
            else:
                # past the segment end (EOI): spec says pad with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        while self.pos < len(self.buf) and self.buf[self.pos] != 0xFF:
            self.pos += 1
        if self.pos + 1 >= len(self.buf):
            raise ValueError("jpeg: truncated stream")
        if not (0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("jpeg: expected RSTn marker")
        self.pos += 2


# --- JPEG arithmetic entropy coding (ITU T.81 Annex D QM-coder) -------
#
# Pure-Python implementation of the PUBLIC T.81 arithmetic decoding
# procedures: the QM-coder probability state machine (Table D.3), the
# decoder register conventions of Annex D.2 (MPS sub-interval at the
# bottom, LPS on top, conditional MPS/LPS exchange, renormalization
# with byte-stuffed data feeding), and the sequential-DCT statistical
# models of F.1.4.4 / F.2.4 (DC difference conditioning with the
# L/U classification of Table F.4 — S0/SS/SP/SN contexts at offsets
# 0/4/8/12/16, magnitude-category X states at 20, magnitude bits at
# +14 — and the AC model's 3-states-per-k layout with the Kx
# low/high-spectrum split at 189/217 and the fixed ~0.5 state 113 for
# AC signs).  Conformance is pinned coefficient-exactly against
# libjpeg-turbo (tests/test_jpeg_arith.py: 250-case battery over
# sizes, content, quality 1-100, 4:4:4/4:2:0, restart intervals, all
# byte-exact), closing the arithmetic-JPEG gate the reference has no
# counterpart for (it ships no media codec at all).

# T.81 Table D.3: (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS).
# Index 113 is the non-adapting ~0.5 state used for AC sign decisions.
_JPEG_ARITH_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _JpegArithFeeder:
    """Entropy-segment byte feeder with B.1.1.5 stuffing: 0xFF 0x00
    yields the data byte 0xFF; fill 0xFFs collapse; a real marker ends
    the segment — the decoder is then fed ZERO bytes (the T.81
    convention for decoding past the segment end)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.done = False

    def next(self) -> int:
        if self.done or self.pos >= len(self.buf):
            self.done = True
            return 0
        b = self.buf[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        j = self.pos + 1
        while j < len(self.buf) and self.buf[j] == 0xFF:
            j += 1
        if j < len(self.buf) and self.buf[j] == 0x00:
            self.pos = j + 1
            return 0xFF
        self.done = True  # marker: zero-fed from here on
        return 0


class _QMDecoder:
    """T.81 Annex D arithmetic decoder.  The interval register `a`
    renormalizes into [0x8000, 0x10000); the code window `c >> shift`
    is the 16-bit comparand against `a`; the MPS sub-interval sits at
    the bottom [0, a-qe) and the LPS on top, with the conditional
    MPS/LPS exchange of Figures D.17/D.18 when the MPS interval
    shrinks below Qe.  Statistics bins are one byte each:
    (MPS << 7) | state_index."""

    def __init__(self, feeder: _JpegArithFeeder) -> None:
        self.f = feeder
        b0 = feeder.next()
        b1 = feeder.next()
        self.c = (b0 << 8) | b1
        self.shift = 0
        self.a = 0x10000

    def decode(self, stats: bytearray, k: int) -> int:
        sv = stats[k]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = _JPEG_ARITH_QE[idx]
        self.a -= qe
        if (self.c >> self.shift) < self.a:
            if self.a & 0x8000:
                return mps  # MPS without renormalization
            if self.a < qe:  # conditional MPS exchange (Fig D.18)
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                idx = nlps
            else:
                d = mps
                idx = nmps
        else:
            self.c -= self.a << self.shift
            if self.a < qe:  # conditional LPS exchange (Fig D.17)
                d = mps
                idx = nmps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                idx = nlps
            self.a = qe
        stats[k] = (mps << 7) | idx
        a = self.a
        while a < 0x8000:  # RENORMD with BYTEIN (Figs D.19/D.20)
            if self.shift == 0:
                self.c = (self.c << 8) | self.f.next()
                self.shift = 8
            a <<= 1
            self.shift -= 1
        self.a = a
        return d


class _QMEncoder:
    """T.81 Annex D arithmetic ENCODER — the exact mirror of
    _QMDecoder's interval conventions (MPS bottom, LPS top,
    conditional exchange).  The code register is an arbitrary-size
    Python int accumulating sub-interval offsets, so carry
    propagation is absorbed by big-int arithmetic instead of the
    spec's BYTEOUT stacking; flush picks the value in [C, C+A) with
    the most trailing zeros and emits it MSB-first with B.1.1.5
    0xFF-stuffing.  Suited to the repo's per-row gate fixtures
    (streams of a few hundred bits); production decode never needs
    an encoder."""

    def __init__(self) -> None:
        self.c = 0
        self.a = 0x10000
        self.nbits = 16

    def encode(self, stats: bytearray, k: int, d: int) -> None:
        sv = stats[k]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = _JPEG_ARITH_QE[idx]
        a1 = self.a - qe
        if d == mps:
            if a1 & 0x8000:
                self.a = a1
                return  # MPS without renormalization: no state change
            if a1 < qe:  # conditional exchange: MPS takes the top
                self.c += a1
                self.a = qe
            else:
                self.a = a1
            idx = nmps
        else:
            if a1 < qe:  # conditional exchange: LPS takes the bottom
                self.a = a1
            else:
                self.c += a1
                self.a = qe
            if sw:
                mps = 1 - mps
            idx = nlps
        stats[k] = (mps << 7) | idx
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.nbits += 1

    def flush(self) -> bytes:
        lo, hi = self.c, self.c + self.a - 1
        v = hi
        bit = 1
        while True:  # largest power-of-two alignment inside [lo, hi]
            cand = hi & ~(bit - 1)
            if cand < lo:
                break
            v = cand
            if cand == 0:
                break  # 0 ∈ [lo, hi] is maximally aligned (an
                # all-MPS stream keeps C at 0 — without this stop
                # the mask search never ends)
            bit <<= 1
        nbits = self.nbits
        pad = (-nbits) % 8
        v <<= pad
        nbits += pad
        raw = v.to_bytes(nbits // 8, "big")
        while raw and raw[-1] == 0:
            raw = raw[:-1]  # the decoder zero-feeds past the marker
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _arith_encode_dc(enc: _QMEncoder, st: bytearray, dc_ctx: dict,
                     cid: int, diff: int, cond: int) -> None:
    """Mirror of the DC decoding model (F.1.4.4.1)."""
    low, up = cond & 0x0F, cond >> 4
    base = dc_ctx[cid]
    if diff == 0:
        enc.encode(st, base, 0)
        dc_ctx[cid] = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    sz = abs(diff) - 1
    k = base + 2 + sign
    if sz == 0:
        enc.encode(st, k, 0)
        m = 0
    else:
        enc.encode(st, k, 1)
        m = 1
        k = 20
        while sz >= (m << 1):
            enc.encode(st, k, 1)
            m <<= 1
            k += 1
        enc.encode(st, k, 0)
    if m < ((1 << low) >> 1):
        dc_ctx[cid] = 0
    elif m > ((1 << up) >> 1):
        dc_ctx[cid] = 12 + sign * 4
    else:
        dc_ctx[cid] = 4 + sign * 4
    k += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st, k, 1 if (sz & mm) else 0)


def _arith_encode_ac(enc: _QMEncoder, st: bytearray,
                     fixed: bytearray, zz: list, kx: int) -> None:
    """Mirror of the AC decoding model (F.1.4.4.2)."""
    last = 63
    while last >= 1 and zz[last] == 0:
        last -= 1
    k = 1
    while k <= last:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = zz[k]
        enc.encode(fixed, 0, 1 if v < 0 else 0)
        sz = abs(v) - 1
        kk = base + 2
        if sz == 0:
            enc.encode(st, kk, 0)
            m = 0
        else:
            enc.encode(st, kk, 1)
            if sz < 2:
                enc.encode(st, kk, 0)
                m = 1
            else:
                enc.encode(st, kk, 1)
                m = 2
                kk = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, kk, 1)
                    m <<= 1
                    kk += 1
                enc.encode(st, kk, 0)
        kk += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(st, kk, 1 if (sz & mm) else 0)
        k += 1
    if last < 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def encode_jpeg_arith(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Top-down (r, g, b) rows → a spec-valid SOF9 (sequential
    ARITHMETIC-coded) JFIF JPEG: the same integer color transform /
    FDCT / flat-_JQ quantization pipeline as encode_jpeg, entropy
    coded through the T.81 QM-coder with explicit default DAC
    conditioning (L=0, U=1, Kx=5).  Decodes identically to the
    Huffman twin — pinned in tests both by this repo's decoder
    (coefficient-exact) and by libjpeg (pixel-exact vs the Huffman
    encoding of the same input)."""
    import struct as _st

    h, w, by, bx, q = _jpeg_quantized(pixels)
    enc = _QMEncoder()
    dc_stats = {0: bytearray(64), 1: bytearray(64)}
    ac_stats = {0: bytearray(256), 1: bytearray(256)}
    fixed = bytearray([113])
    dc_ctx = {1: 0, 2: 0, 3: 0}
    last_dc = {1: 0, 2: 0, 3: 0}
    for j in range(by):
        for i in range(bx):
            for c, (cid, td, ta) in enumerate(
                    ((1, 0, 0), (2, 1, 1), (3, 1, 1))):
                blk = q[c, j, i]
                zz = [int(blk[k // 8, k % 8]) for k in _JPEG_ZIGZAG]
                _arith_encode_dc(enc, dc_stats[td], dc_ctx, cid,
                                 zz[0] - last_dc[cid], 0x10)
                last_dc[cid] = zz[0]
                _arith_encode_ac(enc, ac_stats[ta], fixed, zz, 5)
    out = _jpeg_headers(h, w, 0xC9, huffman=False)
    # DAC: explicit default conditioning for both DC and AC tables
    out += b"\xff\xcc" + _st.pack(">H", 10) + bytes(
        [0x00, 0x10, 0x01, 0x10, 0x10, 5, 0x11, 5])
    out += b"\xff\xda" + _st.pack(">HB", 12, 3)  # SOS
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tdta])
    out += b"\x00\x3f\x00"
    out += enc.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegHuff:
    """Canonical Huffman decoder built from DHT bits/vals (T.81 F.2)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _JpegBitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if code <= self.maxcode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("jpeg: invalid Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _jpeg_ac_first(zz, br, atab, ss: int, se: int, al: int,
                   eobrun: int) -> int:
    """AC coefficients, first scan of a band (T.81 G.1.2.2; baseline
    AC decode is the Al=0 / single-band special case — EOB0 is an
    EOB-run of one).  `zz` is the block's zigzag-ordered coefficient
    list; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = atab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run of 2^r + bits blocks
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past band end")
        zz[k] = _jpeg_extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _jpeg_ac_refine(zz, br, atab, ss: int, se: int, al: int,
                    eobrun: int) -> int:
    """AC successive-approximation refinement scan (T.81 G.1.2.3):
    one new-coefficient bit per newly-nonzero position, interleaved
    with correction bits for every already-nonzero coefficient
    traversed (including inside ZRL runs and EOB runs)."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(kk: int) -> None:
        if br.bit() and (zz[kk] & p1) == 0:
            zz[kk] += p1 if zz[kk] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = atab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError(
                        "jpeg: refinement scan with size > 1")
                val = p1 if br.bit() else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_arith_scan(payload: bytes, pos: int, frame: dict,
                     scan: list, coefs: dict,
                     dac: dict, restart_interval: int,
                     hmax: int, vmax: int,
                     ss: int = 0, se: int = 63,
                     ah: int = 0, al: int = 0) -> int:
    """Decode one arithmetic-coded scan into the coefficient planes:
    sequential (SOF9, T.81 F.2.4 with the F.1.4.4 statistical models)
    AND progressive (SOFA, the G.2 successive-approximation variants
    — DC first/refine, AC first/refine over spectral bands).  Td/Ta
    in the scan header select the DC/AC conditioning tables; absent
    DAC segments default to L=0, U=1, Kx=5 (F.1.4.4.1.4 /
    F.1.4.4.2.1).  Returns the payload offset of the next marker.
    Restart intervals re-initialize the decoder, all statistics areas
    and the DC predictions (F.2.4.1)."""
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    ns = len(scan)
    sequential = not frame["progressive"]

    state: dict = {}

    def fresh(p: int) -> None:
        state["dc"] = {td: bytearray(64) for _, td, _ in scan}
        state["ac"] = {ta: bytearray(256) for _, _, ta in scan}
        # index 113 = the table's fixed non-adapting ~0.5 state
        state["fixed"] = bytearray([113])
        state["last_dc"] = {c["id"]: 0 for c in frame["comps"]}
        state["dc_ctx"] = {c["id"]: 0 for c in frame["comps"]}
        state["feeder"] = _JpegArithFeeder(payload, p)
        state["qm"] = _QMDecoder(state["feeder"])

    fresh(pos)

    def decode_dc_first(zz, comp, td) -> None:
        # ---- DC (F.2.4.1 / G.2; contexts of Table F.4) ----
        qm = state["qm"]
        cid = comp["id"]
        cond = dac.get((0, td), 0x10)  # default L=0, U=1
        low, up = cond & 0x0F, cond >> 4
        st = state["dc"][td]
        base = state["dc_ctx"][cid]
        if qm.decode(st, base) == 0:
            state["dc_ctx"][cid] = 0
        else:
            sign = qm.decode(st, base + 1)
            k = base + 2 + sign
            m = 0
            if qm.decode(st, k):
                m = 1
                k = 20  # X1 (Table F.4)
                while qm.decode(st, k):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg: bad arithmetic code")
                    k += 1
            # conditioning category of the NEXT diff (F.1.4.4.1.2)
            if m < ((1 << low) >> 1):
                state["dc_ctx"][cid] = 0
            elif m > ((1 << up) >> 1):
                state["dc_ctx"][cid] = 12 + sign * 4
            else:
                state["dc_ctx"][cid] = 4 + sign * 4
            v = m
            k += 14  # magnitude bits (Figure F.24)
            mm = m
            while mm > 1:
                mm >>= 1
                if qm.decode(st, k):
                    v |= mm
            v += 1
            state["last_dc"][cid] += -v if sign else v
        zz[0] = state["last_dc"][cid] << al

    def decode_ac_first(zz, ta) -> None:
        # ---- AC (F.2.4.2 / G.2; 3 states per k, Kx split) ----
        qm = state["qm"]
        kx = dac.get((1, ta), 5)
        st = state["ac"][ta]
        k = ss if ss else 1
        while k <= se:
            base = 3 * (k - 1)
            if qm.decode(st, base):
                break  # EOB
            while qm.decode(st, base + 1) == 0:
                k += 1
                if k > se:
                    raise ValueError("jpeg: bad arithmetic code")
                base = 3 * (k - 1)
            sign = qm.decode(state["fixed"], 0)
            kk = base + 2
            m = 0
            if qm.decode(st, kk):
                m = 1
                if qm.decode(st, kk):
                    m = 2
                    kk = 189 if k <= kx else 217  # X2 low/high bank
                    while qm.decode(st, kk):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError("jpeg: bad arithmetic code")
                        kk += 1
            v = m
            kk += 14
            mm = m
            while mm > 1:
                mm >>= 1
                if qm.decode(st, kk):
                    v |= mm
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1

    def decode_dc_refine(zz) -> None:
        # G.2: one fixed-probability correction bit per block
        if state["qm"].decode(state["fixed"], 0):
            zz[0] |= 1 << al

    def decode_ac_refine(zz, ta) -> None:
        # G.2 successive approximation of the ss..se band: previously
        # nonzero coefficients take a correction bit (st+2); newly
        # nonzero ones a significance decision (st+1) + fixed sign;
        # the EOB decision only applies beyond the previous scan's
        # last nonzero index (kex)
        qm = state["qm"]
        st = state["ac"][ta]
        p1 = 1 << al
        m1 = -1 << al
        kex = se
        while kex > 0 and zz[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if k > kex and qm.decode(st, base):
                break  # EOB
            while True:
                if zz[k]:
                    if qm.decode(st, base + 2):
                        zz[k] += m1 if zz[k] < 0 else p1
                    break
                if qm.decode(st, base + 1):
                    zz[k] = m1 if qm.decode(state["fixed"], 0) else p1
                    break
                k += 1
                if k > se:
                    raise ValueError("jpeg: bad arithmetic code")
                base = 3 * (k - 1)
            k += 1

    def decode_block(zz, comp, td, ta) -> None:
        if sequential:
            decode_dc_first(zz, comp, td)
            decode_ac_first(zz, ta)
        elif ss == 0:
            if ah == 0:
                decode_dc_first(zz, comp, td)
            else:
                decode_dc_refine(zz)
        elif ah == 0:
            decode_ac_first(zz, ta)
        else:
            decode_ac_refine(zz, ta)

    def maybe_restart(n: int) -> None:
        if restart_interval and n and n % restart_interval == 0:
            p = state["feeder"].pos
            while p + 1 < len(payload) and not (
                    payload[p] == 0xFF
                    and 0xD0 <= payload[p + 1] <= 0xD7):
                p += 1
            if p + 1 >= len(payload):
                raise ValueError("jpeg: truncated stream")
            fresh(p + 2)

    if ns > 1:
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n)
                n += 1
                for comp, td, ta in scan:
                    for vv in range(comp["v"]):
                        for hh in range(comp["h"]):
                            decode_block(
                                coefs[comp["id"]][my * comp["v"] + vv][
                                    mx * comp["h"] + hh],
                                comp, td, ta)
    else:
        comp, td, ta = scan[0]
        cw = (-(-frame["w"] * comp["h"] // hmax) + 7) // 8
        ch = (-(-frame["h"] * comp["v"] // vmax) + 7) // 8
        n = 0
        for by in range(ch):
            for bx in range(cw):
                maybe_restart(n)
                n += 1
                decode_block(coefs[comp["id"]][by][bx], comp, td, ta)

    j = state["feeder"].pos
    while j + 1 < len(payload):
        if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                and not (0xD0 <= payload[j + 1] <= 0xD7):
            break
        j += 1
    return j


def decode_jpeg_pixels(payload: bytes, _return_coefs: bool = False) -> dict:
    """Full JPEG decode from the public spec → dict(width, height,
    pixels) with top-down (r, g, b) rows.  Handles baseline
    (SOF0/SOF1) AND progressive (SOF2: spectral selection +
    successive approximation, DC and AC scans, EOB runs) streams,
    arbitrary DQT/DHT tables, h×v sampling (replication upsampling),
    DRI/RSTn, 1- or 3-component scans, AND arithmetic-coded
    streams — sequential (SOF9) and progressive (SOFA) — via the
    T.81 Annex D QM-coder (DAC conditioning tables, spec defaults
    L=0/U=1/Kx=5, libjpeg-conformance-pinned), AND lossless frames —
    Huffman SOF3 and arithmetic SOFB (Annex H predictive decode,
    delegated below; 8-bit frames map onto the pixel contract), AND
    hierarchical lossless pyramids (DHP + EXP + differential
    SOF7/SOFF, Annexes J.8/K.5 — delegated to
    decode_jpeg_hierarchical); only DCT-based differential frames
    (SOF5/6/CD/CE) raise.

    `_return_coefs` (tests only) returns (frame, coefs) — the raw
    quantized zigzag coefficient planes — so the conformance suite
    compares entropy decoding coefficient-exactly against
    libjpeg-turbo, with zero IDCT rounding in the comparison."""
    import struct as _st

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _JpegHuff] = {}
    dac: dict[tuple[int, int], int] = {}
    frame = None
    restart_interval = 0
    coefs = None
    hmax = vmax = 1
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("jpeg: expected marker")
        # optional 0xFF fill bytes before any marker (T.81 B.1.1.2)
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= len(payload):
            raise ValueError("jpeg: truncated stream")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if i + 2 > len(payload):
            raise ValueError("jpeg: truncated stream")
        ln = _st.unpack(">H", payload[i:i + 2])[0]
        if ln < 2 or i + ln > len(payload):
            raise ValueError("jpeg: truncated stream")
        seg = payload[i + 2:i + ln]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if len(seg) < j + (128 if pq else 64):
                    raise ValueError("jpeg: truncated stream")
                if pq:
                    tbl = [_st.unpack(">H", seg[j + 2 * k:j + 2 * k + 2])[0]
                           for k in range(64)]
                    j += 128
                else:
                    tbl = list(seg[j:j + 64])
                    j += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                if len(bits) < 16:
                    raise ValueError("jpeg: truncated stream")
                n = sum(bits)
                if len(seg) < j + 17 + n:
                    raise ValueError("jpeg: truncated stream")
                vals = list(seg[j + 17:j + 17 + n])
                huff[(tc, th)] = _JpegHuff(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive, SOF9/SOFA
            # arithmetic sequential/progressive
            if len(seg) < 6:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated stream")
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 0x0F) <= 4):
                    raise ValueError(
                        "jpeg: sampling factors must be 1-4")
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": fw, "h": fh, "comps": comps,
                     "progressive": marker in (0xC2, 0xCA),
                     "arith": marker in (0xC9, 0xCA)}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            frame["mcux"], frame["mcuy"] = mcux, mcuy
            # coefficient planes persist ACROSS scans (zigzag order);
            # a sequential stream fills them in its one scan
            coefs = {
                c["id"]: [
                    [[0] * 64 for _ in range(mcux * c["h"])]
                    for _ in range(mcuy * c["v"])
                ]
                for c in comps
            }
        elif marker in (0xC3, 0xCB):
            # Huffman (SOF3) / arithmetic (SOFB) lossless (T.81
            # Annex H): dedicated decoder —
            # the sample-predictive pipeline shares nothing with the
            # DCT path below.  8-bit frames map onto the pixel
            # contract (1 comp → grey, 3 comps → direct RGB: the
            # spec defines no color transform for lossless); deeper
            # precisions keep full range via decode_jpeg_lossless.
            d = decode_jpeg_lossless(payload)
            if _return_coefs:
                raise ValueError(
                    "jpeg: lossless frames carry samples, not DCT "
                    "coefficients")
            if d["precision"] > 8:
                raise ValueError(
                    "jpeg: lossless precision > 8 has no 8-bit pixel "
                    "form — use decode_jpeg_lossless for full range")
            pls = d["planes"]
            if len(pls) == 1:
                px = [[(v, v, v) for v in row] for row in pls[0]]
            elif len(pls) == 3:
                px = [
                    [(pls[0][y][x], pls[1][y][x], pls[2][y][x])
                     for x in range(d["width"])]
                    for y in range(d["height"])
                ]
            else:
                raise ValueError(
                    "jpeg: lossless pixel form needs 1 or 3 "
                    "components")
            return {"width": d["width"], "height": d["height"],
                    "pixels": px}
        elif marker == 0xDE:
            # hierarchical stream (DHP): delegated — lossless
            # pyramids (SOF3/SOFB + SOF7/SOFF) decode; DCT-based
            # hierarchies raise inside the delegate.  The coefs
            # contract check comes FIRST so a caller asking for DCT
            # coefficients fails fast instead of paying for the full
            # (up to 2^26-sample) pyramid decode (r13 ADVICE low).
            if _return_coefs:
                raise ValueError(
                    "jpeg: hierarchical frames carry samples, not "
                    "DCT coefficients")
            d = decode_jpeg_hierarchical(payload)
            if d["precision"] > 8:
                raise ValueError(
                    "jpeg: lossless precision > 8 has no 8-bit pixel "
                    "form — use decode_jpeg_hierarchical for full "
                    "range")
            pls = d["planes"]
            if len(pls) == 1:
                px = [[(v, v, v) for v in row] for row in pls[0]]
            elif len(pls) == 3:
                px = [
                    [(pls[0][y][x], pls[1][y][x], pls[2][y][x])
                     for x in range(d["width"])]
                    for y in range(d["height"])
                ]
            else:
                raise ValueError(
                    "jpeg: lossless pixel form needs 1 or 3 "
                    "components")
            return {"width": d["width"], "height": d["height"],
                    "pixels": px}
        elif marker in (0xC5, 0xC6, 0xCD, 0xCE):
            raise ValueError(
                "jpeg: DCT-based differential frames not supported "
                "(lossless hierarchy — DHP + SOF3/SOFB + SOF7/SOFF "
                "— decodes via decode_jpeg_hierarchical)")
        elif marker in (0xC7, 0xCF):
            raise ValueError(
                "jpeg: differential frame outside a hierarchical "
                "stream (no DHP segment seen)")
        elif marker == 0xCC:  # DAC — arithmetic conditioning tables
            j = 0
            while j + 1 < len(seg):
                tc_tb, val = seg[j], seg[j + 1]
                j += 2
                tc, tb = tc_tb >> 4, tc_tb & 0x0F
                if tc == 0:  # DC: value packs (U << 4) | L, L <= U
                    if (val & 0x0F) > (val >> 4):
                        raise ValueError("jpeg: DAC requires L <= U")
                elif tc == 1:  # AC: Kx in 1..63
                    if not 1 <= val <= 63:
                        raise ValueError("jpeg: DAC Kx out of range")
                else:
                    raise ValueError("jpeg: bad DAC class")
                dac[(tc, tb)] = val
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("jpeg: truncated stream")
            restart_interval = _st.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded segment follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if not seg:
                raise ValueError("jpeg: truncated stream")
            ns = seg[0]
            if ns == 0 or len(seg) < 4 + 2 * ns:
                raise ValueError("jpeg: truncated stream")
            scan = []
            for c in range(ns):
                cid, t = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cid), None)
                if comp is None:
                    raise ValueError(
                        f"jpeg: scan references unknown component {cid}")
                scan.append((comp, t >> 4, t & 0x0F))
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            if not frame.get("arith"):
                # malformed-input contract: a scan referencing an
                # undeclared Huffman table fails loudly
                for comp_, td_, ta_ in scan:
                    needs_dc = ss == 0 and ah == 0
                    needs_ac = (not frame["progressive"]) or ss > 0
                    if needs_dc and (0, td_) not in huff:
                        raise ValueError(
                            f"jpeg: missing DC huffman table {td_}")
                    if needs_ac and (1, ta_) not in huff:
                        raise ValueError(
                            f"jpeg: missing AC huffman table {ta_}")
            if ss > 0 and ns != 1:
                raise ValueError("jpeg: AC scans must be single-component")
            if frame.get("arith"):
                i = _jpeg_arith_scan(payload, i + ln, frame, scan,
                                     coefs, dac, restart_interval,
                                     hmax, vmax, ss, se, ah, al)
                continue
            br = _JpegBitReader(payload, i + ln)
            pred = {c["id"]: 0 for c in frame["comps"]}
            eobrun = 0
            mcux, mcuy = frame["mcux"], frame["mcuy"]

            def decode_block(zz, comp, td, ta):
                nonlocal eobrun
                if ss == 0:
                    if ah == 0:  # DC first (baseline: the whole block)
                        s = huff[(0, td)].decode(br)
                        if s > 16:  # T.81 F.1.2.1.1: SSSS <= 16 —
                            # a corrupt DHT value here would build
                            # an unbounded coefficient
                            raise ValueError(
                                "jpeg: bad DC category")
                        diff = _jpeg_extend(br.bits(s), s) if s else 0
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]] << al
                    else:  # DC refinement: one bit
                        if br.bit():
                            zz[0] |= 1 << al
                    if not frame["progressive"]:
                        eobrun = _jpeg_ac_first(
                            zz, br, huff[(1, ta)], 1, 63, 0, eobrun)
                elif ah == 0:
                    eobrun = _jpeg_ac_first(
                        zz, br, huff[(1, ta)], ss, se, al, eobrun)
                else:
                    eobrun = _jpeg_ac_refine(
                        zz, br, huff[(1, ta)], ss, se, al, eobrun)

            def maybe_restart(n: int) -> None:
                nonlocal pred, eobrun
                if restart_interval and n and n % restart_interval == 0:
                    br.restart()
                    pred = {c["id"]: 0 for c in frame["comps"]}
                    eobrun = 0

            if ns > 1:
                # interleaved MCU traversal (DC/sequential scans)
                nmcu = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart(nmcu)
                        nmcu += 1
                        for comp, td, ta in scan:
                            for v in range(comp["v"]):
                                for hh in range(comp["h"]):
                                    decode_block(
                                        coefs[comp["id"]][
                                            my * comp["v"] + v][
                                            mx * comp["h"] + hh],
                                        comp, td, ta)
            else:
                # non-interleaved: traverse the component's OWN block
                # grid (T.81 A.2.2 — MCU is one block)
                comp, td, ta = scan[0]
                cw = (-(-frame["w"] * comp["h"] // hmax) + 7) // 8
                ch = (-(-frame["h"] * comp["v"] // vmax) + 7) // 8
                nblk = 0
                for by in range(ch):
                    for bx in range(cw):
                        maybe_restart(nblk)
                        nblk += 1
                        decode_block(coefs[comp["id"]][by][bx],
                                     comp, td, ta)
            # advance past the entropy-coded data to the next marker
            j = br.pos
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                        and not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            i = j
            continue
        i += ln
    if frame is None or coefs is None:
        raise ValueError("jpeg: no scan data")
    if _return_coefs:
        return frame, coefs
    # dequantize, dezigzag, IDCT (vectorized per component)
    m = _jpeg_dct_matrix()
    planes = {}
    for comp in frame["comps"]:
        if comp["tq"] not in qt:
            raise ValueError(
                f"jpeg: missing quantization table {comp['tq']}")
        tbl = np.array(qt[comp["tq"]], dtype=np.int64)
        zzblocks = np.asarray(
            coefs[comp["id"]], dtype=np.int64) * tbl  # (by, bx, 64)
        by, bx = zzblocks.shape[:2]
        deq = np.zeros((by, bx, 8, 8))
        for k, pos in enumerate(_JPEG_ZIGZAG):
            deq[:, :, pos // 8, pos % 8] = zzblocks[:, :, k]
        spat = np.einsum("xu,ijuv,yv->ijxy", m.T, deq, m.T)
        plane = np.floor(spat + 0.5).astype(np.int64) + 128
        plane = np.clip(plane, 0, 255)
        plane = (
            plane.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        # replication upsample to full-res grid
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes[comp["id"]] = plane[:frame["h"], :frame["w"]]
    ids = [c["id"] for c in frame["comps"]]
    if len(ids) == 1:
        yv = planes[ids[0]]
        out = np.stack([yv, yv, yv], axis=-1)
    else:
        # vectorized inverse color transform — same integer math as
        # jpeg_ycc_to_rgb (+65536 bias keeps the numerators positive
        # so floor == truncation)
        yv = planes[ids[0]].astype(np.int64)
        cbv = planes[ids[1]].astype(np.int64) - 128
        crv = planes[ids[2]].astype(np.int64) - 128
        rv = yv + ((359 * crv + 128 + 65536) // 256 - 256)
        gv = yv - ((88 * cbv + 183 * crv + 128 + 65536)
                   // 256 - 256)
        bv = yv + ((454 * cbv + 128 + 65536) // 256 - 256)
        out = np.clip(np.stack([rv, gv, bv], axis=-1), 0, 255)
    px = [[tuple(int(v) for v in out[y, x])
           for x in range(frame["w"])]
          for y in range(frame["h"])]
    return {"width": frame["w"], "height": frame["h"],
            "pixels": px}


def resize_jpeg(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor JPEG resize.  The output container is PNG:
    re-encoding a thumbnail through a LOSSY codec compounds
    generational loss, so the lossless sibling is the honest (and
    industry-standard) thumbnail target — decode is the real work
    here, and it runs the full baseline path above."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("jpeg: resize dims must be positive")
    d = decode_jpeg_pixels(payload)
    w, h, px = d["width"], d["height"], d["pixels"]
    out = [[px[y * h // new_h][x * w // new_w] for x in range(new_w)]
           for y in range(new_h)]
    return encode_png(out)


# --- AVI (RIFF) with MJPEG video streams -------------------------------
#
# Pure-Python implementation of the public RIFF/AVI container layout
# (the same RIFF chunk grammar the WAV codec above walks) carrying a
# Motion-JPEG video stream: every '00dc' chunk in the 'movi' list is a
# standalone baseline JPEG decoded by decode_jpeg_pixels.  This turns
# the video frame-sampling gate real for MJPEG-in-AVI — the format a
# capture pipeline actually emits — while inter-frame codecs (H.264
# etc.) stay behind the honest ffmpeg gate in text/multimodal.py.


def encode_avi_mjpeg(frames: list[list[list[tuple[int, int, int]]]],
                     fps: int = 10) -> bytes:
    """Pixel-grid frames → RIFF/AVI: hdrl (avih + one 'vids'/'MJPG'
    strl), movi with one word-aligned 00dc JPEG chunk per frame, and
    an idx1 keyframe index."""
    if not frames:
        raise ValueError("avi: need at least one frame")
    h = len(frames[0])
    w = len(frames[0][0])
    payloads = [encode_jpeg(f) for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<10I", 0, 0, 0, 1, fps, 0, len(frames),
        max(len(p) for p in payloads), 0, 0)
        + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24,
                       int.from_bytes(b"MJPG", "little"),
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_chunks)
    idx, off = b"", 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_malformed_to_valueerror
def decode_avi_frames(payload: bytes) -> dict:
    """RIFF/AVI walk → dict(width, height, fps, n_frames, frames):
    every video-data chunk (##dc/##db) in the movi list decoded as a
    baseline JPEG pixel grid."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI payload")
    width = height = None
    fps = None
    frames: list[list[list[tuple[int, int, int]]]] = []

    def walk(buf: bytes, i: int, end: int) -> None:
        nonlocal width, height, fps
        while i + 8 <= end:
            fcc = buf[i:i + 4]
            size = struct.unpack("<I", buf[i + 4:i + 8])[0]
            body_start = i + 8
            if fcc == b"LIST":
                ltype = buf[body_start:body_start + 4]
                if ltype in (b"hdrl", b"movi", b"strl"):
                    walk(buf, body_start + 4, body_start + size)
            elif fcc == b"avih":
                vals = struct.unpack(
                    "<14I", buf[body_start:body_start + 56])
                width, height = vals[8], vals[9]
            elif fcc == b"strh":
                if buf[body_start:body_start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<2I", buf[body_start + 20:body_start + 28])
                    fps = rate // max(scale, 1)
            elif fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
                frames.append(decode_jpeg_pixels(
                    buf[body_start:body_start + size])["pixels"])
            i = body_start + size + (size % 2)

    walk(payload, 12, 8 + struct.unpack("<I", payload[4:8])[0])
    if width is None or not frames:
        raise ValueError("avi: no video stream found")
    return {"width": width, "height": height, "fps": fps,
            "n_frames": len(frames), "frames": frames}


# --------------------------------------------------------------------
# Lossless JPEG (T.81 Annex H: SOF3, Huffman-coded predictive)
# --------------------------------------------------------------------
#
# Reference scope note: redpanda-data/connect carries no JPEG code at
# all (only MIME lists); this closes the repo's own r11 media gate
# "lossless SOF3".  No external oracle exists in this environment
# (the system libjpeg62 predates libjpeg-turbo 3.0's lossless API),
# so the gate is the strongest available self-check for a LOSSLESS
# codec: encoder↔decoder bit-exact roundtrip over all 7 predictors,
# point transforms, precisions 2..16, restart intervals, and 1- and
# 3-component interleaved scans (hypothesis property tests), plus
# hand-pinned byte vectors derived from the spec.
#
# Restart semantics (T.81 H.2.2): prediction resets at scan start and
# after each RSTn — the first sample of each component after a reset
# uses the default 2^(P-Pt-1); within the scan, the remainder of the
# first LINE predicts with Ra, the first column of later lines with
# Rb, and everything else with the selected predictor.  The encoder
# only ever emits restarts at MCU-row boundaries.

# one DC table covering SSSS 0..16: all 17 symbols at code length 5
# (canonical, Kraft-valid, max code 10000b != all-ones)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _ll_predict(plane, x: int, y: int, psv: int, default: int,
                fresh: bool) -> int:
    """T.81 H.1.2.1 prediction for sample (x, y).  `fresh` marks the
    first sample after a scan start / restart."""
    if fresh:
        return default
    if y == 0:
        return plane[0][x - 1]  # rest of first line: Ra
    if x == 0:
        return plane[y - 1][0]  # first column: Rb
    a = plane[y][x - 1]
    b = plane[y - 1][x]
    c = plane[y - 1][x - 1]
    if psv == 1:
        return a
    if psv == 2:
        return b
    if psv == 3:
        return c
    if psv == 4:
        return a + b - c
    if psv == 5:
        return a + ((b - c) >> 1)
    if psv == 6:
        return b + ((a - c) >> 1)
    if psv == 7:
        return (a + b) >> 1
    raise ValueError(f"jpeg: bad lossless predictor {psv}")


def encode_jpeg_lossless(planes, precision: int = 8,
                         predictor: int = 1, pt: int = 0,
                         restart_rows: int = 0) -> bytes:
    """Encode component planes (equal-size 2D integer lists, 1 or 3
    of them, values in [0, 2^precision)) as a spec-valid SOF3 stream.
    The point transform stores sample >> pt (decode re-scales by
    << pt); interleaved scan when 3 components (h=v=1 MCUs)."""
    import struct as _st

    if not 2 <= precision <= 16:
        raise ValueError("jpeg: lossless precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("jpeg: predictor must be 1..7")
    if not 0 <= pt < precision:
        raise ValueError("jpeg: point transform out of range")
    nc = len(planes)
    if nc not in (1, 3):
        raise ValueError("jpeg: 1 or 3 components")
    h, w = len(planes[0]), len(planes[0][0])
    shifted = [[[s >> pt for s in row] for row in p] for p in planes]
    default = 1 << (precision - pt - 1)
    out = bytearray(b"\xff\xd8")  # SOI
    out += bytes([0xFF, 0xC3]) + _st.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x11, 0])  # h=v=1, tq unused
    out += b"\xff\xc4" + _st.pack(">H", 19 + len(_LL_VALS)) + \
        bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS)
    ri = restart_rows * w if restart_rows else 0
    if ri:
        if ri > 0xFFFF:
            raise ValueError("jpeg: restart interval exceeds 65535")
        out += b"\xff\xdd" + _st.pack(">HH", 4, ri)
    out += b"\xff\xda" + _st.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x00])
    out += bytes([predictor, 0, pt])  # Ss=psv, Se=0, Ah=0, Al=Pt
    codes = _canon_codes(_LL_BITS, _LL_VALS)
    bw = _JpegBitWriter()
    rst = 0
    fresh = [True] * nc
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            data = bw.done()
            out += data
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            bw = _JpegBitWriter()
            fresh = [True] * nc
        for x in range(w):
            for c in range(nc):  # interleaved MCU = 1 sample/comp
                plane = shifted[c]
                pred = _ll_predict(plane, x, y, predictor, default,
                                   fresh[c])
                fresh[c] = False
                d = (plane[y][x] - pred) & 0xFFFF
                if d == 32768:
                    code, ln = codes[16]
                    bw.write(code, ln)
                    continue
                signed = d - 65536 if d > 32768 else d
                ssss = _jpeg_category(signed)
                code, ln = codes[ssss]
                bw.write(code, ln)
                if ssss:
                    bw.write(_encode_coeff_bits(signed, ssss), ssss)
    out += bw.done()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_lossless(payload: bytes) -> dict:
    """Decode a SOF3 stream to full-precision component planes:
    {width, height, precision, point_transform, planes} where planes
    are output-scaled (sample << Pt, T.81 H.2.4).  Supports 1..4
    non-subsampled components (h=v=1), interleaved or per-component
    scans, restart intervals, all 7 predictors."""
    import struct as _st

    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    i = 2
    huff: dict = {}
    dac: dict = {}
    frame = None
    samples: dict = {}
    restart_interval = 0
    pt_used = 0
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        if i + 1 >= len(payload):
            raise ValueError("jpeg: truncated stream")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        if i + 4 > len(payload):
            raise ValueError("jpeg: truncated stream")
        ln = _st.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + ln]
        i += 2
        if marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                if len(bits) < 16:
                    raise ValueError("jpeg: truncated stream")
                n = sum(bits)
                if len(seg) < j + 17 + n:
                    raise ValueError("jpeg: truncated stream")
                huff[(tc, th)] = _JpegHuff(
                    bits, list(seg[j + 17:j + 17 + n]))
                j += 17 + n
        elif marker in (0xC3, 0xCB):
            if len(seg) < 6:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError("jpeg: bad lossless precision")
            if fw == 0 or fh == 0 or nc == 0:
                raise ValueError("jpeg: empty frame")
            # malformed-input guards.  SOF3 (Huffman): every sample
            # consumes at least one scan bit, so an area orders of
            # magnitude beyond the payload is corrupt.  SOFB (QM
            # arithmetic): NO payload-proportional bound exists —
            # after the data runs out the decoder legally feeds
            # 1-bits forever, so a constant plane of any size can
            # decode from a handful of bytes (its own encoder emits
            # exactly such streams).  There we only cap the
            # allocation so a forged 65535x65535 header cannot OOM
            # the worker.
            if marker == 0xC3:
                if fw * fh > 64 * len(payload) + (1 << 20):
                    raise ValueError(
                        "jpeg: frame area implausible for stream "
                        "size")
            elif fw * fh > (1 << 26):
                raise ValueError(
                    "jpeg: lossless frame area exceeds decoder "
                    "allocation cap (2^26 samples)")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated stream")
            comps = []
            for c in range(nc):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "jpeg: subsampled lossless not supported")
                comps.append(cid)
            frame = {"w": fw, "h": fh, "prec": prec, "comps": comps,
                     "arith": marker == 0xCB}
            samples = {cid: [[0] * fw for _ in range(fh)]
                       for cid in comps}
        elif marker == 0xCC:  # DAC conditioning (arith lossless)
            j = 0
            while j + 1 < len(seg):
                tc_tb, val = seg[j], seg[j + 1]
                j += 2
                if tc_tb >> 4 == 0:
                    dac[tc_tb & 0x0F] = val
        elif marker == 0xDE:  # DHP → hierarchical pyramid
            return decode_jpeg_hierarchical(payload)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            raise ValueError(
                "jpeg: decode_jpeg_lossless expects a SOF3/SOFB "
                "frame")
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError("jpeg: truncated stream")
            restart_interval = _st.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if not seg:
                raise ValueError("jpeg: truncated stream")
            ns = seg[0]
            if ns == 0 or len(seg) < 4 + 2 * ns:
                raise ValueError("jpeg: truncated stream")
            scan = []
            for c in range(ns):
                cid, t = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in samples:
                    raise ValueError(
                        f"jpeg: scan references unknown component {cid}")
                if not frame.get("arith") and (0, t >> 4) not in huff:
                    raise ValueError(
                        f"jpeg: scan references missing DC table "
                        f"{t >> 4}")
                scan.append((cid, t >> 4))
            psv, _se, a = seg[1 + 2 * ns:4 + 2 * ns]
            if not 1 <= psv <= 7:
                raise ValueError(
                    f"jpeg: bad lossless predictor {psv}")
            pt = a & 0x0F
            if pt >= frame["prec"]:
                raise ValueError("jpeg: point transform out of range")
            pt_used = pt
            default = 1 << (frame["prec"] - pt - 1)
            fresh = {cid: True for cid, _ in scan}
            w, h = frame["w"], frame["h"]
            nmcu = 0
            if frame.get("arith"):
                # SOFB: QM-coded diffs under the H.1.2.2 Da/Db model
                cond = {td: dac.get(td, 0x10) for _, td in scan}
                feeder = _JpegArithFeeder(payload, i + ln)
                qm = _QMDecoder(feeder)
                st = {td: bytearray(_LL_ARITH_STATS)
                      for _, td in scan}
                diffs = {cid: [[0] * w for _ in range(h)]
                         for cid, _ in scan}
                for y in range(h):
                    for x in range(w):
                        if restart_interval and nmcu and \
                                nmcu % restart_interval == 0:
                            p = feeder.pos
                            while p + 1 < len(payload) and not (
                                    payload[p] == 0xFF and
                                    0xD0 <= payload[p + 1] <= 0xD7):
                                p += 1
                            if p + 1 >= len(payload):
                                raise ValueError(
                                    "jpeg: truncated stream")
                            feeder = _JpegArithFeeder(payload, p + 2)
                            qm = _QMDecoder(feeder)
                            st = {td: bytearray(_LL_ARITH_STATS)
                                  for _, td in scan}
                            diffs = {cid: [[0] * w for _ in range(h)]
                                     for cid, _ in scan}
                            for cid, _ in scan:
                                fresh[cid] = True
                        nmcu += 1
                        for cid, td in scan:
                            plane = samples[cid]
                            da = diffs[cid][y][x - 1] if x > 0 else 0
                            db = diffs[cid][y - 1][x] if y > 0 else 0
                            v = _ll_arith_decode_diff(
                                qm, st[td], da, db,
                                cond[td] & 0x0F, cond[td] >> 4)
                            diffs[cid][y][x] = v
                            pred = _ll_predict(plane, x, y, psv,
                                               default, fresh[cid])
                            fresh[cid] = False
                            plane[y][x] = (pred + v) & 0xFFFF
                j = feeder.pos
            else:
                br = _JpegBitReader(payload, i + ln)
                for y in range(h):
                    for x in range(w):
                        if restart_interval and nmcu and \
                                nmcu % restart_interval == 0:
                            br.restart()
                            for cid, _ in scan:
                                fresh[cid] = True
                        nmcu += 1
                        for cid, td in scan:
                            plane = samples[cid]
                            s = huff[(0, td)].decode(br)
                            if s == 16:
                                diff = 32768
                            elif s:
                                diff = _jpeg_extend(br.bits(s), s)
                            else:
                                diff = 0
                            pred = _ll_predict(plane, x, y, psv,
                                               default, fresh[cid])
                            fresh[cid] = False
                            plane[y][x] = (pred + diff) & 0xFFFF
                j = br.pos
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                        and not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            i = j
            continue
        i += ln
    if frame is None:
        raise ValueError("jpeg: no scan data")
    planes = [
        [[s << pt_used for s in row] for row in samples[cid]]
        for cid in frame["comps"]
    ]
    return {"width": frame["w"], "height": frame["h"],
            "precision": frame["prec"], "point_transform": pt_used,
            "planes": planes}


# --------------------------------------------------------------------
# Arithmetic-coded lossless JPEG (T.81 Annex H.1.2.2, SOFB)
# --------------------------------------------------------------------
#
# The statistical model couples the Annex-H predictor (shared with
# the Huffman path above: _ll_predict) to the conformance-pinned QM
# coder: the prediction difference is coded with the DC decision
# sequence (F.1.4.4.1 — zero / sign / sz>0 / magnitude-category tree
# / magnitude bits) conditioned on the 5×5 classification of the
# differences previously coded at the left (Da) and above (Db)
# sample positions (H.1.2.2: zero, ±small, ±large under the DAC
# L/U thresholds — the same classification the DC model applies to
# its previous diff).  State allocation per conditioning table (a
# documented layout — no second arithmetic-lossless implementation
# exists anywhere to interop against; the QM substrate itself is
# libjpeg-conformance-pinned and the gate is bit-exact
# encoder↔decoder roundtrip):
#   4 decision states × 25 contexts ......... 0..99
#   magnitude bank A (Db not large) ......... 100..128 (X at 100,
#                                             bits at X-stop + 14)
#   magnitude bank B (Db large) ............. 129..157
# Restart intervals re-initialize the coder, the statistics and the
# stored neighbor diffs (the scan-start condition), mirroring
# F.2.4.1's restart semantics.

_LL_ARITH_STATS = 158


def _ll_classify(v: int, low: int, up: int) -> int:
    """5-way H.1.2.2 conditioning category of a previously coded
    diff: 0 zero/small, 1 +medium, 2 −medium, 3 +large, 4 −large
    (the F.1.4.4.1.2 classification of the diff's magnitude
    category under L/U)."""
    if v == 0:
        return 0
    sz = abs(v) - 1
    m = 0 if sz == 0 else 1 << (sz.bit_length() - 1)
    if m < ((1 << low) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 3 if v > 0 else 4
    return 1 if v > 0 else 2


def _ll_arith_encode_diff(enc: "_QMEncoder", st: bytearray,
                          da: int, db: int, v: int,
                          low: int, up: int) -> None:
    dbc = _ll_classify(db, low, up)
    base = 4 * (5 * _ll_classify(da, low, up) + dbc)
    if v == 0:
        enc.encode(st, base, 0)
        return
    enc.encode(st, base, 1)
    sign = 1 if v < 0 else 0
    enc.encode(st, base + 1, sign)
    sz = abs(v) - 1
    k = base + 2 + sign
    if sz == 0:
        enc.encode(st, k, 0)
        return
    enc.encode(st, k, 1)
    m = 1
    k = 129 if dbc >= 3 else 100
    while sz >= (m << 1):
        enc.encode(st, k, 1)
        m <<= 1
        k += 1
    enc.encode(st, k, 0)
    k += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st, k, 1 if (sz & mm) else 0)


def _ll_arith_decode_diff(qm: "_QMDecoder", st: bytearray,
                          da: int, db: int,
                          low: int, up: int) -> int:
    dbc = _ll_classify(db, low, up)
    base = 4 * (5 * _ll_classify(da, low, up) + dbc)
    if qm.decode(st, base) == 0:
        return 0
    sign = qm.decode(st, base + 1)
    k = base + 2 + sign
    m = 0
    if qm.decode(st, k):
        m = 1
        k = 129 if dbc >= 3 else 100
        while qm.decode(st, k):
            m <<= 1
            if m == 0x10000:
                raise ValueError("jpeg: bad arithmetic code")
            k += 1
    v = m
    k += 14
    mm = m
    while mm > 1:
        mm >>= 1
        if qm.decode(st, k):
            v |= mm
    v += 1
    return -v if sign else v


def encode_jpeg_lossless_arith(planes, precision: int = 8,
                               predictor: int = 1, pt: int = 0,
                               restart_rows: int = 0) -> bytes:
    """Arithmetic twin of encode_jpeg_lossless: SOFB frame, DAC
    conditioning (default L=0/U=1), QM-coded prediction differences
    under the H.1.2.2 Da/Db model.  Same predictor/precision/point-
    transform/restart surface as the Huffman encoder."""
    import struct as _st

    if not 2 <= precision <= 16:
        raise ValueError("jpeg: lossless precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("jpeg: predictor must be 1..7")
    if not 0 <= pt < precision:
        raise ValueError("jpeg: point transform out of range")
    nc = len(planes)
    if nc not in (1, 3):
        raise ValueError("jpeg: 1 or 3 components")
    h, w = len(planes[0]), len(planes[0][0])
    shifted = [[[s >> pt for s in row] for row in p] for p in planes]
    default = 1 << (precision - pt - 1)
    low, up = 0, 1
    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xCB]) + _st.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x11, 0])
    # DAC: DC-class conditioning for table 0 (L=0, U=1)
    out += b"\xff\xcc" + _st.pack(">H", 4) + bytes(
        [0x00, (up << 4) | low])
    ri = restart_rows * w if restart_rows else 0
    if ri:
        if ri > 0xFFFF:
            raise ValueError("jpeg: restart interval exceeds 65535")
        out += b"\xff\xdd" + _st.pack(">HH", 4, ri)
    out += b"\xff\xda" + _st.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x00])
    out += bytes([predictor, 0, pt])
    enc = _QMEncoder()
    st = bytearray(_LL_ARITH_STATS)
    diffs = [[[0] * w for _ in range(h)] for _ in range(nc)]
    rst = 0
    fresh = [True] * nc
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            enc = _QMEncoder()
            st = bytearray(_LL_ARITH_STATS)
            diffs = [[[0] * w for _ in range(h)] for _ in range(nc)]
            fresh = [True] * nc
        for x in range(w):
            for c in range(nc):
                plane = shifted[c]
                pred = _ll_predict(plane, x, y, predictor, default,
                                   fresh[c])
                fresh[c] = False
                d = (plane[y][x] - pred) & 0xFFFF
                v = d - 65536 if d > 32768 else d
                da = diffs[c][y][x - 1] if x > 0 else 0
                db = diffs[c][y - 1][x] if y > 0 else 0
                _ll_arith_encode_diff(enc, st, da, db, v, low, up)
                diffs[c][y][x] = v
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------
# Hierarchical JPEG (ITU T.81 Annexes J.8/K.5: DHP, EXP, differential
# frames SOF7/SOFF) — lossless pyramid
# --------------------------------------------------------------------
#
# The reference (redpanda-data/connect) ships no JPEG code at all;
# this closes the repo's own last JPEG-mode gap from the public spec.
# A hierarchical stream is DHP (full-size frame header), then a
# non-differential first frame (SOF3 Huffman or SOFB arithmetic)
# coding the smallest pyramid level, then per level: EXP (expand the
# reference 2x) + a DIFFERENTIAL frame (SOF7/SOFF) coding
# (sample - expanded_reference) mod 2^16 with NO spatial prediction
# (T.81 H.2.4: prediction is zero in differential frames; the SOS
# predictor field is 0).  Expansion interpolation is normative
# (J.8.1.2): out[2x] = in[x], out[2x+1] = (in[x] + in[x+1] + 1) >> 1
# with edge replication, horizontal pass then vertical, truncated to
# the next frame's size (the doubled dimension may exceed it by one
# when that dimension is odd).  Downsampling (encoder-side pyramid
# construction) is NOT normative; this encoder uses the rounded
# 2x2 block mean.  DCT-based hierarchical frames (SOF5/6/CD/CE)
# remain unsupported and raise precisely.


def _jpeg_downsample(plane):
    h, w = len(plane), len(plane[0])
    out = []
    for y in range((h + 1) // 2):
        row = []
        for x in range((w + 1) // 2):
            acc = n = 0
            for dy in (0, 1):
                yy = 2 * y + dy
                if yy >= h:
                    continue
                for dx in (0, 1):
                    xx = 2 * x + dx
                    if xx < w:
                        acc += plane[yy][xx]
                        n += 1
            row.append((acc + n // 2) // n)
        out.append(row)
    return out


def _jpeg_expand(plane, target_w: int, target_h: int,
                 eh: int = 1, ev: int = 1):
    """T.81 J.8.1.2 reference-component expansion (horizontal pass,
    then vertical), truncated to the next frame's dimensions."""
    rows = plane
    if eh:
        wide = []
        for row in rows:
            w = len(row)
            orow = []
            for x in range(w):
                orow.append(row[x])
                nxt = row[x + 1] if x + 1 < w else row[x]
                orow.append((row[x] + nxt + 1) >> 1)
            wide.append(orow[:target_w])
        rows = wide
    if ev:
        h = len(rows)
        tall = []
        for y in range(h):
            tall.append(rows[y])
            nxt = rows[y + 1] if y + 1 < h else rows[y]
            tall.append([(a + b + 1) >> 1
                         for a, b in zip(rows[y], nxt)])
        rows = tall[:target_h]
    if any(len(r) != target_w for r in rows) or \
            len(rows) != target_h:
        raise ValueError(
            "jpeg: EXP expansion does not reach the next frame's "
            "dimensions")
    return rows


def _hier_scan_huff(lev, ref, differential: bool, precision: int,
                    predictor: int) -> bytes:
    codes = _canon_codes(_LL_BITS, _LL_VALS)
    bw = _JpegBitWriter()
    nc = len(lev)
    h, w = len(lev[0]), len(lev[0][0])
    default = 1 << (precision - 1)
    fresh = [True] * nc
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                if differential:
                    d = (lev[c][y][x] - ref[c][y][x]) & 0xFFFF
                else:
                    pred = _ll_predict(lev[c], x, y, predictor,
                                       default, fresh[c])
                    fresh[c] = False
                    d = (lev[c][y][x] - pred) & 0xFFFF
                if d == 32768:
                    code, ln = codes[16]
                    bw.write(code, ln)
                    continue
                signed = d - 65536 if d > 32768 else d
                ssss = _jpeg_category(signed)
                code, ln = codes[ssss]
                bw.write(code, ln)
                if ssss:
                    bw.write(_encode_coeff_bits(signed, ssss), ssss)
    return bw.done()


def _hier_scan_arith(lev, ref, differential: bool, precision: int,
                     predictor: int) -> bytes:
    enc = _QMEncoder()
    st = bytearray(_LL_ARITH_STATS)
    nc = len(lev)
    h, w = len(lev[0]), len(lev[0][0])
    default = 1 << (precision - 1)
    diffs = [[[0] * w for _ in range(h)] for _ in range(nc)]
    fresh = [True] * nc
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                if differential:
                    d = (lev[c][y][x] - ref[c][y][x]) & 0xFFFF
                else:
                    pred = _ll_predict(lev[c], x, y, predictor,
                                       default, fresh[c])
                    fresh[c] = False
                    d = (lev[c][y][x] - pred) & 0xFFFF
                v = d - 65536 if d > 32768 else d
                da = diffs[c][y][x - 1] if x > 0 else 0
                db = diffs[c][y - 1][x] if y > 0 else 0
                _ll_arith_encode_diff(enc, st, da, db, v, 0, 1)
                diffs[c][y][x] = v
    return enc.flush()


def encode_jpeg_hierarchical(planes, levels: int = 2,
                             precision: int = 8, predictor: int = 1,
                             arithmetic: bool = False) -> bytes:
    """Encode component planes (1 or 3 equal-size 2D integer lists,
    values in [0, 2^precision)) as a spec-valid hierarchical lossless
    stream: DHP + SOF3/SOFB initial frame (smallest pyramid level) +
    (EXP + SOF7/SOFF differential frame) per remaining level.
    Bit-exact roundtrip with decode_jpeg_hierarchical."""
    import struct as _st

    if not 2 <= precision <= 16:
        raise ValueError("jpeg: lossless precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("jpeg: predictor must be 1..7")
    nc = len(planes)
    if nc not in (1, 3):
        raise ValueError("jpeg: 1 or 3 components")
    h, w = len(planes[0]), len(planes[0][0])
    if not 1 <= levels <= 8:
        raise ValueError("jpeg: hierarchy levels must be 1..8")
    if (max(h, w) >> (levels - 1)) < 1:
        raise ValueError("jpeg: too many levels for frame size")
    pyr = [planes]
    for _ in range(levels - 1):
        pyr.append([_jpeg_downsample(p) for p in pyr[-1]])
    pyr.reverse()  # smallest level first

    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xDE]) + _st.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x11, 0])
    if arithmetic:
        # DC-class conditioning for table 0 (L=0, U=1)
        out += b"\xff\xcc" + _st.pack(">H", 4) + bytes([0x00, 0x10])
    else:
        out += b"\xff\xc4" + _st.pack(">H", 19 + len(_LL_VALS)) + \
            bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS)
    ref = None
    for li, lev in enumerate(pyr):
        lh, lw = len(lev[0]), len(lev[0][0])
        differential = li > 0
        if differential:
            out += bytes([0xFF, 0xDF]) + _st.pack(">H", 3) + \
                bytes([0x11])  # Eh=1, Ev=1
            ref = [_jpeg_expand(p, lw, lh) for p in ref]
            sof = 0xCF if arithmetic else 0xC7
        else:
            sof = 0xCB if arithmetic else 0xC3
        out += bytes([0xFF, sof]) + _st.pack(
            ">HBHHB", 8 + 3 * nc, precision, lh, lw, nc)
        for cid in range(1, nc + 1):
            out += bytes([cid, 0x11, 0])
        out += b"\xff\xda" + _st.pack(">HB", 6 + 2 * nc, nc)
        for cid in range(1, nc + 1):
            out += bytes([cid, 0x00])
        # differential frames: prediction is zero, Ss shall be 0
        out += bytes([0 if differential else predictor, 0, 0])
        scan = _hier_scan_arith if arithmetic else _hier_scan_huff
        out += scan(lev, ref, differential, precision, predictor)
        ref = lev
    out += b"\xff\xd9"
    return bytes(out)


def _gray_dct_frame_bytes(plane) -> bytes:
    """One grayscale sequential-DCT frame as raw segments (DQT +
    DHT + SOF0 + SOS + entropy, no SOI/EOI): the non-differential
    DCT base of a hierarchical stream.  Same flat-_JQ pipeline as
    encode_jpeg, single component."""
    import struct as _st

    import numpy as np

    h, w = len(plane), len(plane[0])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    arr = np.asarray(plane, dtype=np.int64)
    arr = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    m = _jpeg_dct_matrix()
    by, bx = ph // 8, pw // 8
    shifted = arr.astype(np.float64) - 128.0
    blocks = shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", m, blocks, m)
    q = (np.floor(np.abs(coef) / _JQ + 0.5).astype(np.int64)
         * np.sign(coef).astype(np.int64))
    dc_codes = _canon_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canon_codes(_AC_BITS, _AC_VALS)
    bw = _JpegBitWriter()
    pred = 0
    for j in range(by):
        for i in range(bx):
            blk = q[j, i]
            zz = [int(blk[k // 8, k % 8]) for k in _JPEG_ZIGZAG]
            _encode_dc(bw, dc_codes, zz[0] - pred)
            pred = zz[0]
            _encode_ac_band(bw, ac_codes, zz, 1, 63)
    seg = bytearray()
    seg += b"\xff\xdb" + _st.pack(">H", 67) + bytes([0]) + \
        bytes([_JQ] * 64)
    for tc, th, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                               (1, 0, _AC_BITS, _AC_VALS)):
        seg += b"\xff\xc4" + _st.pack(">H", 19 + len(vals)) + \
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    seg += b"\xff\xc0" + _st.pack(">HBHHB", 11, 8, h, w, 1) + \
        bytes([1, 0x11, 0])
    seg += b"\xff\xda" + _st.pack(">HB", 8, 1) + bytes([1, 0x00]) + \
        b"\x00\x3f\x00"
    seg += bw.done()
    return bytes(seg)


def _dct_diff_blocks(diff):
    """FDCT (NO level shift — T.81 J.4: differential DCT frames code
    the difference image directly) + flat-_JQ quantization of a
    signed difference plane → (by, bx, q[by][bx][8][8])."""
    import numpy as np

    h, w = len(diff), len(diff[0])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    arr = np.asarray(diff, dtype=np.float64)
    arr = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    m = _jpeg_dct_matrix()
    by, bx = ph // 8, pw // 8
    blocks = arr.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", m, blocks, m)
    q = (np.floor(np.abs(coef) / _JQ + 0.5).astype(np.int64)
         * np.sign(coef).astype(np.int64))
    return by, bx, q


def _dct_diff_reconstruct(q, w: int, h: int):
    """Dequantize + IDCT (no level shift) + crop: the ONE
    reconstruction both encoder and decoder use for differential
    DCT frames, so they agree bit-exactly by construction."""
    import numpy as np

    m = _jpeg_dct_matrix()
    coef = q.astype(np.float64) * _JQ
    # inverse of the forward C = M·B·Mᵀ above: B = Mᵀ·C·M
    spatial = np.einsum("ux,ijuv,vy->ijxy", m, coef, m)
    by, bx = q.shape[0], q.shape[1]
    full = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    out = np.rint(full).astype(np.int64)
    return [[int(out[y, x]) for x in range(w)] for y in range(h)]


def _dct_diff_scan_encode(diff) -> tuple[bytes, list]:
    """Huffman-code a differential-DCT plane (DC with NO prediction
    — T.81 F.2's differential arm) and return (entropy bytes,
    reconstructed difference)."""
    by, bx, q = _dct_diff_blocks(diff)
    dc_codes = _canon_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canon_codes(_AC_BITS, _AC_VALS)
    bw = _JpegBitWriter()
    for j in range(by):
        for i in range(bx):
            blk = q[j, i]
            zz = [int(blk[k // 8, k % 8]) for k in _JPEG_ZIGZAG]
            _encode_dc(bw, dc_codes, zz[0])  # pred = 0
            _encode_ac_band(bw, ac_codes, zz, 1, 63)
    recon = _dct_diff_reconstruct(q, len(diff[0]), len(diff))
    return bw.done(), recon


def _dct_diff_scan_decode(payload: bytes, pos: int, w: int, h: int,
                          dc_huff, ac_huff):
    """Decode one differential-DCT Huffman scan (1 component,
    h=v=1): returns (reconstructed difference plane, end position).
    DC carries no prediction; AC is the standard baseline
    run-length code."""
    import numpy as np

    by, bx = (h + 7) // 8, (w + 7) // 8
    q = np.zeros((by, bx, 8, 8), dtype=np.int64)
    br = _JpegBitReader(payload, pos)
    for j in range(by):
        for i in range(bx):
            s = dc_huff.decode(br)
            if s > 15:
                raise ValueError("jpeg: bad DC category")
            dc = _jpeg_extend(br.bits(s), s) if s else 0
            zz = [0] * 64
            zz[0] = dc
            k = 1
            while k < 64:
                rs = ac_huff.decode(br)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("jpeg: AC run overflows block")
                zz[k] = _jpeg_extend(br.bits(s), s)
                k += 1
            blk = q[j, i]
            for idx, zz_pos in enumerate(_JPEG_ZIGZAG):
                blk[zz_pos // 8, zz_pos % 8] = zz[idx]
    return _dct_diff_reconstruct(q, w, h), br.pos


def encode_jpeg_hierarchical_dct(plane,
                                 arithmetic_residual: bool = False,
                                 levels: int = 1,
                                 ) -> bytes:
    """The textbook hierarchical configuration (T.81 K.5: lossy
    multi-resolution preview + lossless refinement): DHP + a
    grayscale sequential DCT base (SOF0, smallest pyramid level) +
    per remaining level an EXP + DIFFERENTIAL DCT frame (SOF5 —
    the DCT of the difference image, no level shift, DC coded with
    zero prediction) + one final differential LOSSLESS frame (SOF7,
    or SOFF with arithmetic_residual) coding
    (source - reconstruction) mod 2^16 — so the stream decodes to
    the source EXACTLY while any DCT decoder can render the
    progressively-sized previews.  The encoder builds every
    reference through the SAME reconstruction code the decoder runs
    (standalone base decode; _dct_diff_reconstruct for SOF5), so
    the two agree bit-exactly by construction.  8-bit grayscale
    (a color DCT base would put the residual in the YCbCr domain
    while the decoded reference is RGB — rejected on decode)."""
    import struct as _st

    h = len(plane)
    w = len(plane[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty frame")
    if any(not 0 <= v <= 255 for row in plane for v in row):
        raise ValueError("jpeg: DCT base requires 8-bit samples")
    if not 1 <= levels <= 8:
        raise ValueError("jpeg: hierarchy levels must be 1..8")
    if (max(h, w) >> (levels - 1)) < 1:
        raise ValueError("jpeg: too many levels for frame size")
    pyr = [plane]
    for _ in range(levels - 1):
        pyr.append(_jpeg_downsample(pyr[-1]))
    pyr.reverse()  # smallest level first

    frame_seg = _gray_dct_frame_bytes(pyr[0])
    base = b"\xff\xd8" + frame_seg + b"\xff\xd9"
    recon_px = decode_jpeg_pixels(base)["pixels"]
    recon = [[p[0] for p in row] for row in recon_px]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + _st.pack(">HBHHB", 11, 8, h, w, 1) + \
        bytes([1, 0x11, 0])  # DHP
    out += frame_seg
    for lev in pyr[1:]:
        lh, lw = len(lev), len(lev[0])
        out += bytes([0xFF, 0xDF]) + _st.pack(">H", 3) + \
            bytes([0x11])  # EXP: double both
        ref_exp = _jpeg_expand(recon, lw, lh)
        diff = [[lev[y][x] - ref_exp[y][x] for x in range(lw)]
                for y in range(lh)]
        entropy, recon_diff = _dct_diff_scan_encode(diff)
        out += b"\xff\xc5" + _st.pack(
            ">HBHHB", 11, 8, lh, lw, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xda" + _st.pack(">HB", 8, 1) + \
            bytes([1, 0x00]) + bytes([0, 63, 0])
        out += entropy
        recon = [[ref_exp[y][x] + recon_diff[y][x]
                  for x in range(lw)] for y in range(lh)]
    if arithmetic_residual:
        out += b"\xff\xcc" + _st.pack(">H", 4) + bytes([0x01, 0x10])
        out += b"\xff\xcf" + _st.pack(">HBHHB", 11, 8, h, w, 1) + \
            bytes([1, 0x11, 0])
        out += b"\xff\xda" + _st.pack(">HB", 8, 1) + \
            bytes([1, 0x10]) + bytes([0, 0, 0])
        out += _hier_scan_arith([plane], [recon], True, 8, 1)
    else:
        # lossless code table at (0,1) so it never shadows the DCT
        # frame's DC table (0,0)
        out += b"\xff\xc4" + _st.pack(">H", 19 + len(_LL_VALS)) + \
            bytes([0x01]) + bytes(_LL_BITS) + bytes(_LL_VALS)
        out += b"\xff\xc7" + _st.pack(">HBHHB", 11, 8, h, w, 1) + \
            bytes([1, 0x11, 0])
        out += b"\xff\xda" + _st.pack(">HB", 8, 1) + \
            bytes([1, 0x10]) + bytes([0, 0, 0])
        out += _hier_scan_huff([plane], [recon], True, 8, 1)
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_hierarchical(payload: bytes) -> dict:
    """Decode a hierarchical stream → {width, height, precision,
    point_transform, planes}.  Frames refine a persistent reference:
    non-differential frames replace it (lossless SOF3/SOFB decoded
    here; a grayscale sequential-DCT base SOF0/SOF1/SOF9 is
    re-framed as a standalone stream — accumulated tables + the
    frame — and decoded through decode_jpeg_pixels), differential
    LOSSLESS frames (SOF7/SOFF) add their mod-2^16 coded differences
    to the (EXP-expanded) reference.  Progressive or differential
    DCT frames raise precisely."""
    import struct as _st

    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    i = 2
    huff: dict = {}
    dac: dict = {}
    dhp = None
    frame = None
    ref: dict = {}
    pending_exp = None
    table_acc = bytearray()  # raw DQT/DHT/DAC/DRI segments so far
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        if i + 1 >= len(payload):
            raise ValueError("jpeg: truncated stream")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        if i + 4 > len(payload):
            raise ValueError("jpeg: truncated stream")
        ln = _st.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + ln]
        i += 2
        if marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                if len(bits) < 16:
                    raise ValueError("jpeg: truncated stream")
                n = sum(bits)
                if len(seg) < j + 17 + n:
                    raise ValueError("jpeg: truncated stream")
                huff[(tc, th)] = _JpegHuff(
                    bits, list(seg[j + 17:j + 17 + n]))
                j += 17 + n
            table_acc += payload[i - 2:i + ln]
        elif marker == 0xCC:  # DAC
            table_acc += payload[i - 2:i + ln]
            j = 0
            while j + 1 < len(seg):
                tc_tb, val = seg[j], seg[j + 1]
                j += 2
                if tc_tb >> 4 == 0:
                    dac[tc_tb & 0x0F] = val
        elif marker in (0xDB, 0xDD):  # DQT / DRI: raw, for the
            table_acc += payload[i - 2:i + ln]  # DCT-base substream
        elif marker == 0xDE:  # DHP
            if len(seg) < 6:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError("jpeg: bad lossless precision")
            if fw == 0 or fh == 0 or nc == 0:
                raise ValueError("jpeg: empty frame")
            if fw * fh > (1 << 26):
                raise ValueError(
                    "jpeg: hierarchical frame area exceeds decoder "
                    "allocation cap (2^26 samples)")
            comps = []
            for c in range(nc):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "jpeg: subsampled hierarchical lossless not "
                        "supported")
                comps.append(cid)
            dhp = {"w": fw, "h": fh, "prec": prec, "comps": comps}
        elif marker == 0xDF:  # EXP
            if not seg:
                raise ValueError("jpeg: truncated stream")
            pending_exp = (seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC3, 0xCB, 0xC7, 0xCF):
            if dhp is None:
                raise ValueError(
                    "jpeg: decode_jpeg_hierarchical expects a DHP "
                    "segment before the first frame")
            if len(seg) < 6:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if prec != dhp["prec"]:
                raise ValueError(
                    "jpeg: frame precision differs from DHP")
            if fw == 0 or fh == 0 or nc == 0:
                raise ValueError("jpeg: empty frame")
            if fw > dhp["w"] or fh > dhp["h"]:
                raise ValueError(
                    "jpeg: frame exceeds DHP dimensions")
            differential = marker in (0xC7, 0xCF)
            comps = []
            for c in range(nc):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "jpeg: subsampled hierarchical lossless not "
                        "supported")
                comps.append(cid)
            if differential:
                if not ref:
                    raise ValueError(
                        "jpeg: differential frame before any "
                        "reference frame")
                if pending_exp is not None:
                    eh, ev = pending_exp
                    pending_exp = None
                    ref = {cid: _jpeg_expand(p, fw, fh, eh, ev)
                           for cid, p in ref.items()}
                for cid in comps:
                    if cid not in ref:
                        raise ValueError(
                            f"jpeg: differential frame references "
                            f"unknown component {cid}")
                    if len(ref[cid]) != fh or \
                            len(ref[cid][0]) != fw:
                        raise ValueError(
                            "jpeg: reference size does not match "
                            "differential frame (missing EXP?)")
            frame = {"w": fw, "h": fh, "comps": comps,
                     "arith": marker in (0xCB, 0xCF),
                     "diff": differential}
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # non-differential DCT base (K.5's lossy preview):
            # re-frame as a standalone stream from the accumulated
            # tables + this frame (ALL its scans — progressive
            # bases are multi-scan), decode through the full DCT
            # decoder, and take the samples as the new reference.
            # Grayscale only — a color frame's residual would live
            # in YCbCr while the decoded reference is RGB.
            if dhp is None:
                raise ValueError(
                    "jpeg: decode_jpeg_hierarchical expects a DHP "
                    "segment before the first frame")
            if len(seg) < 6:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if prec != 8 or nc != 1:
                raise ValueError(
                    "jpeg: hierarchical DCT base must be 8-bit "
                    "grayscale (color residuals live in the YCbCr "
                    "domain)")
            if fw > dhp["w"] or fh > dhp["h"]:
                raise ValueError(
                    "jpeg: frame exceeds DHP dimensions")
            if len(seg) < 9:
                raise ValueError("jpeg: truncated stream")
            cid = seg[6]
            frame_start = i - 2
            # walk this frame's segments through EVERY scan; stop
            # at the next frame-level marker (SOF/DHP/EXP/EOI)
            p = i + ln
            last_end = None
            while p + 1 < len(payload):
                if payload[p] != 0xFF:
                    raise ValueError("jpeg: truncated stream")
                mk = payload[p + 1]
                if mk == 0xDA:
                    if p + 4 > len(payload):
                        raise ValueError("jpeg: truncated stream")
                    sl = _st.unpack(">H", payload[p + 2:p + 4])[0]
                    j = p + 2 + sl
                    while j + 1 < len(payload):
                        if payload[j] == 0xFF and \
                                payload[j + 1] != 0x00 and not (
                                0xD0 <= payload[j + 1] <= 0xD7):
                            break
                        j += 1
                    last_end = j
                    p = j
                    continue
                if mk in (0xC4, 0xCC, 0xDB, 0xDD):
                    if p + 4 > len(payload):
                        raise ValueError("jpeg: truncated stream")
                    p += 2 + _st.unpack(
                        ">H", payload[p + 2:p + 4])[0]
                    continue
                break  # next frame-level marker ends this frame
            if last_end is None:
                raise ValueError(
                    "jpeg: hierarchical DCT base ended without a "
                    "scan")
            sub = b"\xff\xd8" + bytes(table_acc) + \
                payload[frame_start:last_end] + b"\xff\xd9"
            d = decode_jpeg_pixels(sub)
            ref[cid] = [[px[0] for px in row] for row in d["pixels"]]
            pending_exp = None
            frame = None
            i = last_end
            continue
        elif marker == 0xC5:
            # differential sequential-DCT frame (Huffman): the DCT
            # of the difference image, no level shift, DC with zero
            # prediction — reconstruction adds to the EXP-expanded
            # reference (T.81 J.4)
            if dhp is None:
                raise ValueError(
                    "jpeg: decode_jpeg_hierarchical expects a DHP "
                    "segment before the first frame")
            if len(seg) < 9:
                raise ValueError("jpeg: truncated stream")
            prec, fh, fw, nc = _st.unpack(">BHHB", seg[:6])
            if prec != 8 or nc != 1:
                raise ValueError(
                    "jpeg: differential DCT frames must be 8-bit "
                    "grayscale")
            if fw > dhp["w"] or fh > dhp["h"]:
                raise ValueError(
                    "jpeg: frame exceeds DHP dimensions")
            cid, hv, _tq = seg[6:9]
            if hv != 0x11:
                raise ValueError(
                    "jpeg: subsampled differential DCT not "
                    "supported")
            if not ref:
                raise ValueError(
                    "jpeg: differential frame before any reference "
                    "frame")
            if pending_exp is not None:
                eh, ev = pending_exp
                pending_exp = None
                ref = {c: _jpeg_expand(p, fw, fh, eh, ev)
                       for c, p in ref.items()}
            if cid not in ref or len(ref[cid]) != fh or \
                    len(ref[cid][0]) != fw:
                raise ValueError(
                    "jpeg: reference size does not match "
                    "differential frame (missing EXP?)")
            frame = {"w": fw, "h": fh, "comps": [cid],
                     "arith": False, "diff": True, "dctdiff": True}
        elif marker in (0xC6, 0xCD, 0xCE):
            raise ValueError(
                "jpeg: progressive/arithmetic differential DCT "
                "frames are not supported (Huffman SOF5 and the "
                "lossless SOF7/SOFF arms decode)")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if not seg:
                raise ValueError("jpeg: truncated stream")
            ns = seg[0]
            if ns == 0 or len(seg) < 4 + 2 * ns:
                raise ValueError("jpeg: truncated stream")
            if frame.get("dctdiff"):
                if ns != 1:
                    raise ValueError(
                        "jpeg: differential DCT scan must carry one "
                        "component")
                cid, t = seg[1], seg[2]
                if cid not in frame["comps"]:
                    raise ValueError(
                        f"jpeg: scan references unknown component "
                        f"{cid}")
                td, ta = t >> 4, t & 0x0F
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError(
                        "jpeg: scan references missing Huffman "
                        "table")
                w, h = frame["w"], frame["h"]
                # Allocation cap mirrors the arithmetic lossless arm
                # (2^26 samples); the plausibility bound counts 8x8
                # BLOCKS, not samples — a minimal coded block is
                # ~2 bits (1-bit DC cat-0 + 1-bit EOB), so 4 blocks/
                # byte is the legal floor.  (The old 4-samples/byte
                # bound rejected this repo's own well-compressed
                # encoder output — r13 ADVICE high.)
                if w * h > (1 << 26):
                    raise ValueError(
                        "jpeg: differential frame area exceeds "
                        "decoder allocation cap (2^26 samples)")
                blocks = ((h + 7) // 8) * ((w + 7) // 8)
                if blocks > 4 * len(payload) + (1 << 16):
                    raise ValueError(
                        "jpeg: frame area implausible for stream "
                        "size")
                recon_diff, j = _dct_diff_scan_decode(
                    payload, i + ln, w, h, huff[(0, td)],
                    huff[(1, ta)])
                base = ref[cid]
                ref[cid] = [[base[y][x] + recon_diff[y][x]
                             for x in range(w)] for y in range(h)]
                while j + 1 < len(payload):
                    if payload[j] == 0xFF and \
                            payload[j + 1] != 0x00 and not (
                            0xD0 <= payload[j + 1] <= 0xD7):
                        break
                    j += 1
                i = j
                frame = None
                continue
            scan = []
            for c in range(ns):
                cid, t = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in frame["comps"]:
                    raise ValueError(
                        f"jpeg: scan references unknown component "
                        f"{cid}")
                if not frame["arith"] and (0, t >> 4) not in huff:
                    raise ValueError(
                        f"jpeg: scan references missing DC table "
                        f"{t >> 4}")
                scan.append((cid, t >> 4))
            psv, _se, a = seg[1 + 2 * ns:4 + 2 * ns]
            if frame["diff"]:
                if psv != 0:
                    raise ValueError(
                        "jpeg: differential scan must carry "
                        "predictor 0")
            elif not 1 <= psv <= 7:
                raise ValueError(
                    f"jpeg: bad lossless predictor {psv}")
            if a & 0x0F:
                raise ValueError(
                    "jpeg: point transform unsupported in this "
                    "hierarchical decoder")
            w, h = frame["w"], frame["h"]
            prec = dhp["prec"]
            if not frame["arith"] and not frame["diff"] and \
                    w * h > 64 * len(payload) + (1 << 20):
                raise ValueError(
                    "jpeg: frame area implausible for stream size")
            default = 1 << (prec - 1)
            new = {cid: [[0] * w for _ in range(h)]
                   for cid, _ in scan}
            fresh = {cid: True for cid, _ in scan}
            if frame["arith"]:
                cond = {td: dac.get(td, 0x10) for _, td in scan}
                feeder = _JpegArithFeeder(payload, i + ln)
                qm = _QMDecoder(feeder)
                st = {td: bytearray(_LL_ARITH_STATS)
                      for _, td in scan}
                diffs = {cid: [[0] * w for _ in range(h)]
                         for cid, _ in scan}
                for y in range(h):
                    for x in range(w):
                        for cid, td in scan:
                            da = diffs[cid][y][x - 1] if x > 0 else 0
                            db = diffs[cid][y - 1][x] if y > 0 else 0
                            v = _ll_arith_decode_diff(
                                qm, st[td], da, db,
                                cond[td] & 0x0F, cond[td] >> 4)
                            diffs[cid][y][x] = v
                            if frame["diff"]:
                                new[cid][y][x] = (
                                    ref[cid][y][x] + v) & 0xFFFF
                            else:
                                pred = _ll_predict(
                                    new[cid], x, y, psv, default,
                                    fresh[cid])
                                fresh[cid] = False
                                new[cid][y][x] = (pred + v) & 0xFFFF
                j = feeder.pos
            else:
                br = _JpegBitReader(payload, i + ln)
                for y in range(h):
                    for x in range(w):
                        for cid, td in scan:
                            s = huff[(0, td)].decode(br)
                            if s == 16:
                                diff = 32768
                            elif s:
                                diff = _jpeg_extend(br.bits(s), s)
                            else:
                                diff = 0
                            if frame["diff"]:
                                new[cid][y][x] = (
                                    ref[cid][y][x] + diff) & 0xFFFF
                            else:
                                pred = _ll_predict(
                                    new[cid], x, y, psv, default,
                                    fresh[cid])
                                fresh[cid] = False
                                new[cid][y][x] = (
                                    pred + diff) & 0xFFFF
                j = br.pos
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                        and not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            i = j
            for cid, _ in scan:
                ref[cid] = new[cid]
            continue
        i += ln
    if dhp is None or not ref:
        raise ValueError("jpeg: no scan data")
    for cid in dhp["comps"]:
        if cid not in ref or len(ref[cid]) != dhp["h"] or \
                len(ref[cid][0]) != dhp["w"]:
            raise ValueError(
                "jpeg: hierarchy did not reach the DHP dimensions")
    return {"width": dhp["w"], "height": dhp["h"],
            "precision": dhp["prec"], "point_transform": 0,
            "planes": [ref[cid] for cid in dhp["comps"]]}
