"""Pure-Python LZ4 codec: block format + frame format + XXH32.

Completes the reference `compress`/`decompress` algorithm list
(docs/.../processors/compress.adoc:26 — [flate gzip lz4 pgzip snappy
zlib]). Implemented from the public specifications
(lz4_Block_format.md, lz4_Frame_format.md, xxHash spec):

- Block: token byte (hi nibble literal length, lo nibble match
  length - 4, 15 ⇒ 255-run extension bytes), little-endian 16-bit
  match offsets, overlapping copies; encoder honors the end-of-block
  rules (last 5 bytes are literals, no match starts within the last
  12 bytes).
- Frame: magic 0x184D2204, FLG/BD descriptor with header checksum,
  independent blocks, EndMark, content checksum (XXH32) — what the Go
  lz4 writer the reference uses emits, so frames interoperate.
- XXH32 implemented from the public xxHash specification (needed for
  the frame's header/content checksums).
"""

from __future__ import annotations

# --- XXH32 (public xxHash spec) -------------------------------------

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393
)
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 16 <= n:
            for idx, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * idx : i + 4 * idx + 4],
                                      "little")
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 13) * _P1) & _M
                if idx == 0:
                    v1 = v
                elif idx == 1:
                    v2 = v
                elif idx == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M
        h = (_rotl(h, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


# --- block format ---------------------------------------------------


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def compress_block(data: bytes) -> bytes:
    data = bytes(data)
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # no match may start within the last 12 bytes; last 5 are literals
    match_limit = max(0, n - 12)
    while i < match_limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and data[
            cand : cand + 4
        ] == key:
            length = 4
            # matches must end >= 5 bytes before the block end
            max_len = n - 5 - i
            while length < max_len and data[cand + length] == data[i + length]:
                length += 1
            lit = data[lit_start:i]
            token_lit = min(len(lit), 15)
            token_match = min(length - 4, 15)
            out.append((token_lit << 4) | token_match)
            if token_lit == 15:
                _write_len(out, len(lit) - 15)
            out += lit
            out += (i - cand).to_bytes(2, "little")
            if token_match == 15:
                _write_len(out, length - 4 - 15)
            i += length
            lit_start = i
        else:
            i += 1
    # final literal-only sequence
    lit = data[lit_start:]
    token_lit = min(len(lit), 15)
    out.append(token_lit << 4)
    if token_lit == 15:
        _write_len(out, len(lit) - 15)
    out += lit
    return bytes(out)


def decompress_block(data: bytes, expected: int | None = None) -> bytes:
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence has no match part
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: invalid match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        for _ in range(match_len):  # overlap-safe byte copy
            out.append(out[-offset])
    if expected is not None and len(out) != expected:
        raise ValueError(f"lz4: length mismatch ({len(out)} != {expected})")
    return bytes(out)


# --- frame format ---------------------------------------------------

_MAGIC = 0x184D2204
_BLOCK_MAX = 4 * 1024 * 1024  # BD code 7


def compress(data: bytes) -> bytes:
    """LZ4 frame: independent 4 MiB blocks + content checksum."""
    data = bytes(data)
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    flg = 0x40 | 0x20 | 0x04  # version 01, block independence, C.Checksum
    bd = 0x70  # block max size code 7 (4 MiB)
    out += bytes([flg, bd])
    out.append((xxh32(bytes([flg, bd])) >> 8) & 0xFF)
    # empty input: go straight to EndMark — reference encoders never
    # emit a zero-length data block (0x80000000 header), and strict
    # decoders reject it
    for off in range(0, len(data), _BLOCK_MAX):
        chunk = data[off : off + _BLOCK_MAX]
        packed = compress_block(chunk)
        if len(packed) < len(chunk):
            out += len(packed).to_bytes(4, "little")
            out += packed
        else:  # incompressible: store raw (high bit set)
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            out += chunk
    out += (0).to_bytes(4, "little")  # EndMark
    out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    if int.from_bytes(data[:4], "little") != _MAGIC:
        raise ValueError("lz4: bad magic")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    has_csize = bool(flg & 0x08)
    has_ccheck = bool(flg & 0x04)
    has_dictid = bool(flg & 0x01)
    # the header checksum comes AFTER the optional content-size and
    # dict-id fields and covers the whole descriptor (FLG..dictID)
    pos = 6
    if has_csize:
        pos += 8
    if has_dictid:
        pos += 4
    if ((xxh32(data[4:pos]) >> 8) & 0xFF) != data[pos]:
        raise ValueError("lz4: header checksum mismatch")
    pos += 1
    has_bcheck = bool(flg & 0x10)
    out = bytearray()
    while True:
        size = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if size == 0:
            break
        raw = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        chunk = data[pos : pos + size]
        pos += size
        if has_bcheck:
            pos += 4
        out += chunk if raw else decompress_block(chunk)
    if has_ccheck:
        check = int.from_bytes(data[pos : pos + 4], "little")
        if xxh32(bytes(out)) != check:
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
