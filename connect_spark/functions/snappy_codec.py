"""Pure-Python snappy BLOCK format codec.

Reference `compress`/`decompress` processors list snappy among their
algorithms (docs/.../processors/compress.adoc:26). No snappy library
ships in this container, so both directions are implemented from the
public format description (google/snappy format_description.txt):
varint uncompressed-length preamble, then literal / copy elements
(tag low 2 bits: 00 literal, 01 one-byte-offset copy, 10 two-byte-
offset copy; 11 four-byte copies are legal input but never emitted,
same as the reference encoder).

The encoder is a greedy 4-byte hash matcher — the same strategy the
canonical C++ implementation uses — so ratios are comparable on
repetitive data, and any compliant decoder can read our output.
"""

from __future__ import annotations


def _varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # longer matches split into <=64-byte copies (format limit)
    while length >= 68:
        out.append(0x02 | ((64 - 1) << 2))
        out += offset.to_bytes(2, "little")
        length -= 64
    if length > 64:
        out.append(0x02 | ((60 - 1) << 2))
        out += offset.to_bytes(2, "little")
        length -= 60
    if 4 <= length <= 11 and offset < (1 << 11):
        out.append(
            0x01 | ((length - 4) << 2) | ((offset >> 8) << 5)
        )
        out.append(offset & 0xFF)
    else:
        out.append(0x02 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray(_varint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand < (1 << 16) and data[
            cand : cand + 4
        ] == key:
            # extend the match
            length = 4
            while (
                i + length < n
                and data[cand + length] == data[i + length]
                and length < 1 << 16
            ):
                length += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, length)
            i += length
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    expect, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(
                    data[pos : pos + extra], "little"
                ) + 1
                pos += extra
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: invalid copy offset")
        for _ in range(length):  # may overlap (RLE-style copies)
            out.append(out[-offset])
    if len(out) != expect:
        raise ValueError(
            f"snappy: length mismatch ({len(out)} != {expect})"
        )
    return bytes(out)
