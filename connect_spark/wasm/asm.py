"""Minimal WASM binary assembler: builds spec-conformant module
binaries from section primitives (W3C Core 1.0 binary format). Used
by tests and by the gate's built-in demo modules (wasm/testmod.py);
users normally bring modules compiled by their own toolchains.
"""

from __future__ import annotations

import struct

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C


def leb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not b & 0x40) or (n == -1 and b & 0x40):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def section(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + leb(len(payload)) + payload


def vec(items: list[bytes]) -> bytes:
    return leb(len(items)) + b"".join(items)


def functype(params: list[int], results: list[int]) -> bytes:
    return (
        b"\x60"
        + vec([bytes([p]) for p in params])
        + vec([bytes([r]) for r in results])
    )


def name(s: str) -> bytes:
    b = s.encode()
    return leb(len(b)) + b


def import_func(mod: str, nm: str, type_idx: int) -> bytes:
    return name(mod) + name(nm) + b"\x00" + leb(type_idx)


def export(nm: str, kind: int, idx: int) -> bytes:
    return name(nm) + bytes([kind]) + leb(idx)


def func_body(locals_: list[tuple[int, int]], code: bytes) -> bytes:
    body = vec([leb(c) + bytes([t]) for c, t in locals_]) + code
    return leb(len(body)) + body


def module(
    types: list[bytes],
    imports: list[bytes] | None = None,
    func_type_idxs: list[int] | None = None,
    memory_pages: int | None = None,
    globals_: list[bytes] | None = None,
    exports: list[bytes] | None = None,
    codes: list[bytes] | None = None,
    data: list[tuple[int, bytes]] | None = None,
    tables: list[int] | None = None,
    elements: list[tuple[int, list[int]]] | None = None,
) -> bytes:
    out = b"\x00asm\x01\x00\x00\x00"
    out += section(1, vec(types))
    if imports:
        out += section(2, vec(imports))
    if func_type_idxs:
        out += section(3, vec([leb(i) for i in func_type_idxs]))
    if tables:
        out += section(
            4, vec([b"\x70\x00" + leb(n) for n in tables])
        )
    if memory_pages is not None:
        out += section(5, vec([b"\x00" + leb(memory_pages)]))
    if globals_:
        out += section(6, vec(globals_))
    if exports:
        out += section(7, vec(exports))
    if elements:
        out += section(
            9,
            vec(
                [
                    leb(0) + i32c(off) + END + vec([leb(f) for f in fs])
                    for off, fs in elements
                ]
            ),
        )
    if codes:
        out += section(10, vec(codes))
    if data:
        out += section(
            11,
            vec(
                [
                    leb(0) + i32c(off) + END + leb(len(d)) + d
                    for off, d in data
                ]
            ),
        )
    return out


# --- instruction helpers --------------------------------------------

END = b"\x0b"
ELSE = b"\x05"
RETURN = b"\x0f"
DROP = b"\x1a"
UNREACHABLE = b"\x00"


def i32c(n: int) -> bytes:
    return b"\x41" + sleb(n)


def i64c(n: int) -> bytes:
    return b"\x42" + sleb(n)


def f64c(x: float) -> bytes:
    return b"\x44" + struct.pack("<d", x)


def local_get(i: int) -> bytes:
    return b"\x20" + leb(i)


def local_set(i: int) -> bytes:
    return b"\x21" + leb(i)


def local_tee(i: int) -> bytes:
    return b"\x22" + leb(i)


def global_get(i: int) -> bytes:
    return b"\x23" + leb(i)


def global_set(i: int) -> bytes:
    return b"\x24" + leb(i)


def call(i: int) -> bytes:
    return b"\x10" + leb(i)


def br(d: int) -> bytes:
    return b"\x0c" + leb(d)


def br_if(d: int) -> bytes:
    return b"\x0d" + leb(d)


def block(bt: int = 0x40) -> bytes:
    return b"\x02" + bytes([bt])


def loop(bt: int = 0x40) -> bytes:
    return b"\x03" + bytes([bt])


def if_(bt: int = 0x40) -> bytes:
    return b"\x04" + bytes([bt])


def load8_u(offset: int = 0) -> bytes:
    return b"\x2d" + leb(0) + leb(offset)


def store8(offset: int = 0) -> bytes:
    return b"\x3a" + leb(0) + leb(offset)


def i32_load(offset: int = 0) -> bytes:
    return b"\x28" + leb(2) + leb(offset)


def i32_store(offset: int = 0) -> bytes:
    return b"\x36" + leb(2) + leb(offset)


I32_ADD = b"\x6a"
I32_SUB = b"\x6b"
I32_MUL = b"\x6c"
I32_DIV_S = b"\x6d"
I32_LT_S = b"\x48"
I32_LT_U = b"\x49"
I32_GE_S = b"\x4e"
I32_GE_U = b"\x4f"
I32_EQ = b"\x46"
I32_EQZ = b"\x45"
I64_SHR_U = b"\x88"
I32_WRAP_I64 = b"\xa7"
I64_ADD = b"\x7c"
I64_MUL = b"\x7e"
F64_ADD = b"\xa0"
F64_SQRT = b"\x9f"
