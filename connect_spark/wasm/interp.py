"""WebAssembly MVP (W3C Core 1.0) decoder + interpreter.

Supports the full MVP surface a compiled-to-wasm processor module
needs: all value types (i32/i64/f32/f64), structured control flow
(block/loop/if with br/br_if/br_table), direct and indirect calls,
locals/globals, linear memory with load/store variants and grow,
the complete numeric instruction set, and host-function imports.

Design: one pre-pass per function body resolves structured-control
jump targets (end/else offsets) so execution is a flat bytecode loop —
the standard technique reference interpreters use; no recursion on
block depth.

Out of scope (post-MVP): SIMD, reference types, threads, multi-value
block results beyond a single value, bulk-memory ops. A module using
them fails at decode with a clear message.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

__all__ = ["Module", "Instance", "WasmTrap"]


class WasmTrap(RuntimeError):
    pass


_MASK32 = 0xFFFFFFFF
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _s32(v: int) -> int:
    v &= _MASK32
    return v - (1 << 32) if v >= 1 << 31 else v


def _s64(v: int) -> int:
    v &= _MASK64
    return v - (1 << 64) if v >= 1 << 63 else v


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def byte(self) -> int:
        b = self.d[self.p]
        self.p += 1
        return b

    def bytes(self, n: int) -> bytes:
        b = self.d[self.p : self.p + n]
        if len(b) != n:
            raise WasmTrap("unexpected end of section")
        self.p += n
        return b

    def u32(self) -> int:
        # unsigned LEB128
        result = 0
        shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def s32(self) -> int:
        return self._sleb(32)

    def s64(self) -> int:
        return self._sleb(64)

    def _sleb(self, bits: int) -> int:
        result = 0
        shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                # sign-extend whenever the final byte's sign bit is
                # set — including max-length encodings where shift
                # already reached/passed `bits` (e.g. i32.const
                # INT32_MIN is 5 bytes with shift 35)
                if b & 0x40:
                    result |= -(1 << shift)
                return result

    def f32(self) -> float:
        return struct.unpack("<f", self.bytes(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.bytes(8))[0]

    def name(self) -> str:
        return self.bytes(self.u32()).decode("utf-8")


@dataclass
class _FuncType:
    params: tuple
    results: tuple


@dataclass
class _Func:
    type_idx: int
    locals: list  # list of (count, valtype)
    body: bytes  # code between header and final end (inclusive of end)
    jumps: dict = field(default_factory=dict)  # pc -> (else_pc, end_pc)


@dataclass
class _Global:
    valtype: int
    mutable: bool
    value: object


class Module:
    """Decoded module (sections only — instantiate for execution)."""

    def __init__(self, binary: bytes):
        r = _Reader(binary)
        if r.bytes(4) != b"\x00asm" or r.bytes(4) != b"\x01\x00\x00\x00":
            raise WasmTrap("bad wasm magic/version")
        self.types: list[_FuncType] = []
        self.imports: list[tuple[str, str, int, object]] = []  # kind 0=func
        self.func_type_idxs: list[int] = []
        self.tables: list[int] = []  # initial sizes
        self.mem_initial = 0
        self.mem_max = None
        self.globals: list[_Global] = []
        self.exports: dict[str, tuple[int, int]] = {}  # name -> (kind, idx)
        self.start = None
        self.elements: list[tuple[int, list[int]]] = []
        self.codes: list[_Func] = []
        self.datas: list[tuple[int, bytes]] = []

        while r.p < len(binary):
            sid = r.byte()
            size = r.u32()
            end = r.p + size
            if sid == 1:  # types
                for _ in range(r.u32()):
                    if r.byte() != 0x60:
                        raise WasmTrap("expected functype")
                    params = tuple(r.byte() for _ in range(r.u32()))
                    results = tuple(r.byte() for _ in range(r.u32()))
                    self.types.append(_FuncType(params, results))
            elif sid == 2:  # imports
                for _ in range(r.u32()):
                    mod, nm = r.name(), r.name()
                    kind = r.byte()
                    if kind == 0:
                        self.imports.append((mod, nm, 0, r.u32()))
                    elif kind == 2:  # memory import
                        flags = r.byte()
                        mn = r.u32()
                        mx = r.u32() if flags & 1 else None
                        self.imports.append((mod, nm, 2, (mn, mx)))
                    else:
                        raise WasmTrap(
                            f"unsupported import kind {kind} (MVP subset)"
                        )
            elif sid == 3:  # functions
                self.func_type_idxs = [r.u32() for _ in range(r.u32())]
            elif sid == 4:  # tables
                for _ in range(r.u32()):
                    if r.byte() != 0x70:
                        raise WasmTrap("only funcref tables")
                    flags = r.byte()
                    mn = r.u32()
                    if flags & 1:
                        r.u32()
                    self.tables.append(mn)
            elif sid == 5:  # memories
                for _ in range(r.u32()):
                    flags = r.byte()
                    self.mem_initial = r.u32()
                    self.mem_max = r.u32() if flags & 1 else None
            elif sid == 6:  # globals
                for _ in range(r.u32()):
                    vt = r.byte()
                    mut = r.byte() == 1
                    val = _const_expr(r)
                    self.globals.append(_Global(vt, mut, val))
            elif sid == 7:  # exports
                for _ in range(r.u32()):
                    nm = r.name()
                    kind = r.byte()
                    idx = r.u32()
                    self.exports[nm] = (kind, idx)
            elif sid == 8:  # start
                self.start = r.u32()
            elif sid == 9:  # elements
                for _ in range(r.u32()):
                    if r.u32() != 0:
                        raise WasmTrap("only active element segs on table 0")
                    off = _const_expr(r)
                    self.elements.append(
                        (off, [r.u32() for _ in range(r.u32())])
                    )
            elif sid == 10:  # code
                for _ in range(r.u32()):
                    body_size = r.u32()
                    body_end = r.p + body_size
                    locals_: list[tuple[int, int]] = []
                    for _ in range(r.u32()):
                        cnt = r.u32()
                        vt = r.byte()
                        locals_.append((cnt, vt))
                    code = r.bytes(body_end - r.p)
                    self.codes.append(_Func(0, locals_, code))
            elif sid == 11:  # data
                for _ in range(r.u32()):
                    if r.u32() != 0:
                        raise WasmTrap("only active data segs on memory 0")
                    off = _const_expr(r)
                    self.datas.append((off, r.bytes(r.u32())))
            else:  # custom/unknown: skip
                r.p = end
            if r.p != end:
                raise WasmTrap(f"section {sid} size mismatch")
        for i, f in enumerate(self.codes):
            f.type_idx = self.func_type_idxs[i]
            f.jumps = _scan_jumps(f.body)


def _const_expr(r: _Reader):
    op = r.byte()
    if op == 0x41:
        v = r.s32() & _MASK32
    elif op == 0x42:
        v = r.s64() & _MASK64
    elif op == 0x43:
        v = r.f32()
    elif op == 0x44:
        v = r.f64()
    else:
        raise WasmTrap(f"unsupported const opcode {op:#x}")
    if r.byte() != 0x0B:
        raise WasmTrap("const expr must end")
    return v


def _skip_imm(r: _Reader, op: int) -> None:
    """Advance past an instruction's immediates (for the jump scan)."""
    if op in (0x02, 0x03, 0x04):  # block/loop/if: blocktype
        r.byte()
    elif op in (0x0C, 0x0D, 0x10):  # br, br_if, call
        r.u32()
    elif op == 0x0E:  # br_table
        for _ in range(r.u32() + 1):
            r.u32()
    elif op == 0x11:  # call_indirect
        r.u32()
        r.byte()
    elif op in (0x20, 0x21, 0x22, 0x23, 0x24):  # local/global
        r.u32()
    elif 0x28 <= op <= 0x3E:  # loads/stores: align+offset
        r.u32()
        r.u32()
    elif op in (0x3F, 0x40):  # memory.size/grow
        r.byte()
    elif op == 0x41:
        r.s32()
    elif op == 0x42:
        r.s64()
    elif op == 0x43:
        r.bytes(4)
    elif op == 0x44:
        r.bytes(8)


def _scan_jumps(body: bytes) -> dict:
    """Map each block/loop/if pc to (else_pc, end_pc); end_pc points
    AFTER the matching end opcode."""
    jumps: dict[int, tuple[int | None, int]] = {}
    stack: list[tuple[int, int | None]] = []  # (start_pc, else_pc)
    r = _Reader(body)
    while r.p < len(body):
        pc = r.p
        op = r.byte()
        if op in (0x02, 0x03, 0x04):
            r.byte()  # blocktype
            stack.append((pc, None))
        elif op == 0x05:  # else
            start, _ = stack.pop()
            stack.append((start, r.p))
        elif op == 0x0B:  # end
            if stack:
                start, else_pc = stack.pop()
                jumps[start] = (else_pc, r.p)
        else:
            _skip_imm(r, op)
    return jumps


_PAGE = 65536


class _HostFunc:
    def __init__(self, fn, ftype: _FuncType):
        self.fn = fn
        self.ftype = ftype


class Instance:
    """Instantiated module: memory, globals, exported function calls.

    `imports` maps "module.name" -> python callable; host callables
    receive (instance, *args) and return an int/float or None.
    """

    def __init__(self, module: Module, imports: dict | None = None):
        self.m = module
        imports = imports or {}
        self.funcs: list = []  # _HostFunc | int (local func index)
        n_imported = 0
        for mod, nm, kind, extra in module.imports:
            if kind == 0:
                key = f"{mod}.{nm}"
                if key not in imports:
                    raise WasmTrap(f"missing import {key}")
                self.funcs.append(
                    _HostFunc(imports[key], module.types[extra])
                )
                n_imported += 1
            elif kind == 2:
                mn, _ = extra
                module.mem_initial = max(module.mem_initial, mn)
        self.n_imported = n_imported
        for i in range(len(module.codes)):
            self.funcs.append(i)
        self.memory = bytearray(module.mem_initial * _PAGE)
        self.globals = [g.value for g in module.globals]
        self.table: list[int | None] = [None] * (
            module.tables[0] if module.tables else 0
        )
        for off, idxs in module.elements:
            for i, fidx in enumerate(idxs):
                self.table[off + i] = fidx
        for off, data in module.datas:
            self.memory[off : off + len(data)] = data
        if module.start is not None:
            self._call_index(module.start, [])

    # ---- public API -------------------------------------------------

    def invoke(self, name: str, *args):
        if name not in self.m.exports:
            raise WasmTrap(f"no export {name!r}")
        kind, idx = self.m.exports[name]
        if kind != 0:
            raise WasmTrap(f"export {name!r} is not a function")
        res = self._call_index(idx, list(args))
        if not res:
            return None
        return res[0] if len(res) == 1 else tuple(res)

    def has_export(self, name: str) -> bool:
        return name in self.m.exports and self.m.exports[name][0] == 0

    def read_mem(self, ptr: int, size: int) -> bytes:
        if ptr + size > len(self.memory):
            raise WasmTrap("out of bounds memory read")
        return bytes(self.memory[ptr : ptr + size])

    def write_mem(self, ptr: int, data: bytes) -> None:
        if ptr + len(data) > len(self.memory):
            raise WasmTrap("out of bounds memory write")
        self.memory[ptr : ptr + len(data)] = data

    # ---- execution --------------------------------------------------

    def _call_index(self, idx: int, args: list):
        f = self.funcs[idx]
        if isinstance(f, _HostFunc):
            out = f.fn(self, *args)
            if out is None:
                return []
            return [out]
        func = self.m.codes[f]
        ftype = self.m.types[func.type_idx]
        locals_ = list(args)
        for cnt, vt in func.locals:
            locals_ += [0.0 if vt in (0x7D, 0x7C) else 0] * cnt
        return self._exec(func, ftype, locals_)

    def _mem_addr(self, r: _Reader, stack: list) -> int:
        r.u32()  # align hint
        offset = r.u32()
        base = stack.pop() & _MASK32
        return base + offset

    def _exec(self, func: _Func, ftype: _FuncType, locals_: list):
        body = func.body
        jumps = func.jumps
        r = _Reader(body)
        stack: list = []
        # control stack entries: (label_pc_target, arity, stack_height,
        # is_loop)
        ctrl: list[tuple[int, int, int]] = []

        def branch(depth: int):
            # pop `depth` labels; jump to the target of the label
            target, height, keep = ctrl[-1 - depth]
            vals = stack[len(stack) - keep :] if keep else []
            del stack[height:]
            stack.extend(vals)
            del ctrl[len(ctrl) - 1 - depth :]
            r.p = target

        while r.p < len(body):
            pc = r.p
            op = r.byte()
            if op == 0x00:
                raise WasmTrap("unreachable")
            elif op == 0x01:  # nop
                pass
            elif op in (0x02, 0x03):  # block / loop
                bt = r.byte()
                arity = 0 if bt == 0x40 else 1
                else_pc, end_pc = jumps[pc]
                if op == 0x03:  # loop: branch target is the loop start
                    ctrl.append((pc, len(stack), 0))
                else:
                    ctrl.append((end_pc, len(stack), arity))
            elif op == 0x04:  # if
                bt = r.byte()
                arity = 0 if bt == 0x40 else 1
                else_pc, end_pc = jumps[pc]
                cond = stack.pop()
                ctrl.append((end_pc, len(stack), arity))
                if not cond:
                    if else_pc is not None:
                        r.p = else_pc
                    else:
                        ctrl.pop()
                        r.p = end_pc
            elif op == 0x05:  # else: taken only after the then-branch
                target, _h, _k = ctrl.pop()
                r.p = target
            elif op == 0x0B:  # end
                if ctrl:
                    top = ctrl[-1]
                    # end closes the innermost frame whose target is
                    # this end (blocks) or any loop frame
                    ctrl.pop()
            elif op == 0x0C:  # br
                branch(r.u32())
            elif op == 0x0D:  # br_if
                depth = r.u32()
                if stack.pop():
                    branch(depth)
            elif op == 0x0E:  # br_table
                n = r.u32()
                targets = [r.u32() for _ in range(n)]
                default = r.u32()
                i = stack.pop() & _MASK32
                branch(targets[i] if i < n else default)
            elif op == 0x0F:  # return
                n = len(ftype.results)
                return stack[len(stack) - n :] if n else []
            elif op == 0x10:  # call
                fidx = r.u32()
                callee_t = self._func_type(fidx)
                argc = len(callee_t.params)
                args = stack[len(stack) - argc :] if argc else []
                del stack[len(stack) - argc :]
                stack.extend(self._call_index(fidx, args))
            elif op == 0x11:  # call_indirect
                type_idx = r.u32()
                r.byte()  # table 0
                elem = stack.pop() & _MASK32
                if elem >= len(self.table) or self.table[elem] is None:
                    raise WasmTrap("undefined table element")
                fidx = self.table[elem]
                callee_t = self._func_type(fidx)
                if callee_t != self.m.types[type_idx]:
                    raise WasmTrap("indirect call type mismatch")
                argc = len(callee_t.params)
                args = stack[len(stack) - argc :] if argc else []
                del stack[len(stack) - argc :]
                stack.extend(self._call_index(fidx, args))
            elif op == 0x1A:  # drop
                stack.pop()
            elif op == 0x1B:  # select
                c = stack.pop()
                b = stack.pop()
                a = stack.pop()
                stack.append(a if c else b)
            elif op == 0x20:
                stack.append(locals_[r.u32()])
            elif op == 0x21:
                locals_[r.u32()] = stack.pop()
            elif op == 0x22:
                locals_[r.u32()] = stack[-1]
            elif op == 0x23:
                stack.append(self.globals[r.u32()])
            elif op == 0x24:
                self.globals[r.u32()] = stack.pop()
            elif 0x28 <= op <= 0x35:  # loads
                a = self._mem_addr(r, stack)
                stack.append(self._load(op, a))
            elif 0x36 <= op <= 0x3E:  # stores
                r.u32()
                offset = r.u32()
                val = stack.pop()
                base = stack.pop() & _MASK32
                self._store(op, base + offset, val)
            elif op == 0x3F:  # memory.size
                r.byte()
                stack.append(len(self.memory) // _PAGE)
            elif op == 0x40:  # memory.grow
                r.byte()
                delta = stack.pop() & _MASK32
                old = len(self.memory) // _PAGE
                if (
                    self.m.mem_max is not None
                    and old + delta > self.m.mem_max
                ):
                    stack.append(_MASK32)  # -1
                else:
                    self.memory.extend(bytes(delta * _PAGE))
                    stack.append(old)
            elif op == 0x41:
                stack.append(r.s32() & _MASK32)
            elif op == 0x42:
                stack.append(r.s64() & _MASK64)
            elif op == 0x43:
                stack.append(r.f32())
            elif op == 0x44:
                stack.append(r.f64())
            else:
                self._numeric(op, stack)
        n = len(ftype.results)
        return stack[len(stack) - n :] if n else []

    def _func_type(self, fidx: int) -> _FuncType:
        f = self.funcs[fidx]
        if isinstance(f, _HostFunc):
            return f.ftype
        return self.m.types[self.m.codes[f].type_idx]

    # ---- memory ------------------------------------------------------

    def _load(self, op: int, a: int):
        mem = self.memory
        try:
            if op == 0x28:  # i32.load
                return int.from_bytes(mem[a : a + 4], "little")
            if op == 0x29:  # i64.load
                return int.from_bytes(mem[a : a + 8], "little")
            if op == 0x2A:
                return struct.unpack_from("<f", mem, a)[0]
            if op == 0x2B:
                return struct.unpack_from("<d", mem, a)[0]
            if op == 0x2C:  # i32.load8_s
                return _s32(
                    int.from_bytes(mem[a : a + 1], "little", signed=True)
                    & _MASK32
                ) & _MASK32
            if op == 0x2D:  # i32.load8_u
                return mem[a]
            if op == 0x2E:  # i32.load16_s
                return (
                    int.from_bytes(mem[a : a + 2], "little", signed=True)
                    & _MASK32
                )
            if op == 0x2F:  # i32.load16_u
                return int.from_bytes(mem[a : a + 2], "little")
            if op == 0x30:  # i64.load8_s
                return (
                    int.from_bytes(mem[a : a + 1], "little", signed=True)
                    & _MASK64
                )
            if op == 0x31:
                return mem[a]
            if op == 0x32:
                return (
                    int.from_bytes(mem[a : a + 2], "little", signed=True)
                    & _MASK64
                )
            if op == 0x33:
                return int.from_bytes(mem[a : a + 2], "little")
            if op == 0x34:
                return (
                    int.from_bytes(mem[a : a + 4], "little", signed=True)
                    & _MASK64
                )
            if op == 0x35:
                return int.from_bytes(mem[a : a + 4], "little")
        except (IndexError, struct.error):
            raise WasmTrap("out of bounds memory access") from None
        raise WasmTrap(f"bad load opcode {op:#x}")

    def _store(self, op: int, a: int, val):
        mem = self.memory
        if op in (0x36, 0x3A, 0x3B, 0x3C, 0x3D, 0x3E, 0x37):
            widths = {
                0x36: 4, 0x37: 8, 0x3A: 1, 0x3B: 2, 0x3C: 1, 0x3D: 2,
                0x3E: 4,
            }
            w = widths[op]
            if a + w > len(mem):
                raise WasmTrap("out of bounds memory access")
            mem[a : a + w] = (int(val) & ((1 << (8 * w)) - 1)).to_bytes(
                w, "little"
            )
        elif op == 0x38:
            if a + 4 > len(mem):
                raise WasmTrap("out of bounds memory access")
            struct.pack_into("<f", mem, a, val)
        elif op == 0x39:
            if a + 8 > len(mem):
                raise WasmTrap("out of bounds memory access")
            struct.pack_into("<d", mem, a, val)
        else:
            raise WasmTrap(f"bad store opcode {op:#x}")

    # ---- numeric ----------------------------------------------------

    def _numeric(self, op: int, st: list) -> None:
        if op == 0x45:  # i32.eqz
            st.append(int((st.pop() & _MASK32) == 0))
        elif 0x46 <= op <= 0x4F:
            b = st.pop()
            a = st.pop()
            sa, sb = _s32(a), _s32(b)
            ua, ub = a & _MASK32, b & _MASK32
            st.append(
                int(
                    {
                        0x46: ua == ub, 0x47: ua != ub, 0x48: sa < sb,
                        0x49: ua < ub, 0x4A: sa > sb, 0x4B: ua > ub,
                        0x4C: sa <= sb, 0x4D: ua <= ub, 0x4E: sa >= sb,
                        0x4F: ua >= ub,
                    }[op]
                )
            )
        elif op == 0x50:  # i64.eqz
            st.append(int((st.pop() & _MASK64) == 0))
        elif 0x51 <= op <= 0x5A:
            b = st.pop()
            a = st.pop()
            sa, sb = _s64(a), _s64(b)
            ua, ub = a & _MASK64, b & _MASK64
            st.append(
                int(
                    {
                        0x51: ua == ub, 0x52: ua != ub, 0x53: sa < sb,
                        0x54: ua < ub, 0x55: sa > sb, 0x56: ua > ub,
                        0x57: sa <= sb, 0x58: ua <= ub, 0x59: sa >= sb,
                        0x5A: ua >= ub,
                    }[op]
                )
            )
        elif 0x5B <= op <= 0x60:  # f32 cmp
            b = st.pop()
            a = st.pop()
            st.append(
                int(
                    {
                        0x5B: a == b, 0x5C: a != b, 0x5D: a < b,
                        0x5E: a > b, 0x5F: a <= b, 0x60: a >= b,
                    }[op]
                )
            )
        elif 0x61 <= op <= 0x66:  # f64 cmp
            b = st.pop()
            a = st.pop()
            st.append(
                int(
                    {
                        0x61: a == b, 0x62: a != b, 0x63: a < b,
                        0x64: a > b, 0x65: a <= b, 0x66: a >= b,
                    }[op]
                )
            )
        elif op == 0x67:  # i32.clz
            v = st.pop() & _MASK32
            st.append(32 if v == 0 else 32 - v.bit_length())
        elif op == 0x68:  # i32.ctz
            v = st.pop() & _MASK32
            st.append(32 if v == 0 else (v & -v).bit_length() - 1)
        elif op == 0x69:  # i32.popcnt
            st.append(bin(st.pop() & _MASK32).count("1"))
        elif 0x6A <= op <= 0x78:  # i32 arith
            b = st.pop()
            a = st.pop()
            st.append(self._i32_arith(op, a, b))
        elif op == 0x79:  # i64.clz
            v = st.pop() & _MASK64
            st.append(64 if v == 0 else 64 - v.bit_length())
        elif op == 0x7A:
            v = st.pop() & _MASK64
            st.append(64 if v == 0 else (v & -v).bit_length() - 1)
        elif op == 0x7B:
            st.append(bin(st.pop() & _MASK64).count("1"))
        elif 0x7C <= op <= 0x8A:  # i64 arith
            b = st.pop()
            a = st.pop()
            st.append(self._i64_arith(op, a, b))
        elif 0x8B <= op <= 0x98:  # f32 unop/binop
            st.append(self._f_op(op - 0x8B, st, bits=32))
        elif 0x99 <= op <= 0xA6:  # f64
            st.append(self._f_op(op - 0x99, st, bits=64))
        elif op == 0xA7:  # i32.wrap_i64
            st.append(st.pop() & _MASK32)
        elif op in (0xA8, 0xAA):  # i32.trunc_f32_s / f64_s
            st.append(self._trunc(st.pop(), 32, True))
        elif op in (0xA9, 0xAB):
            st.append(self._trunc(st.pop(), 32, False))
        elif op == 0xAC:  # i64.extend_i32_s
            st.append(_s32(st.pop()) & _MASK64)
        elif op == 0xAD:
            st.append(st.pop() & _MASK32)
        elif op in (0xAE, 0xB0):
            st.append(self._trunc(st.pop(), 64, True))
        elif op in (0xAF, 0xB1):
            st.append(self._trunc(st.pop(), 64, False))
        elif op in (0xB2, 0xB7):  # f.convert_i32_s
            st.append(float(_s32(st.pop())))
        elif op in (0xB3, 0xB8):
            st.append(float(st.pop() & _MASK32))
        elif op in (0xB4, 0xB9):
            st.append(float(_s64(st.pop())))
        elif op in (0xB5, 0xBA):
            st.append(float(st.pop() & _MASK64))
        elif op == 0xB6:  # f32.demote_f64
            st.append(struct.unpack("<f", struct.pack("<f", st.pop()))[0])
        elif op == 0xBB:  # f64.promote_f32
            st.append(float(st.pop()))
        elif op == 0xBC:  # i32.reinterpret_f32
            st.append(
                int.from_bytes(struct.pack("<f", st.pop()), "little")
            )
        elif op == 0xBD:
            st.append(
                int.from_bytes(struct.pack("<d", st.pop()), "little")
            )
        elif op == 0xBE:
            st.append(
                struct.unpack(
                    "<f", (st.pop() & _MASK32).to_bytes(4, "little")
                )[0]
            )
        elif op == 0xBF:
            st.append(
                struct.unpack(
                    "<d", (st.pop() & _MASK64).to_bytes(8, "little")
                )[0]
            )
        elif op == 0xC0:  # i32.extend8_s (sign-extension proposal,
            v = st.pop() & 0xFF  # ubiquitous in LLVM output)
            st.append((v - 256 if v >= 128 else v) & _MASK32)
        elif op == 0xC1:
            v = st.pop() & 0xFFFF
            st.append((v - 65536 if v >= 32768 else v) & _MASK32)
        elif op == 0xC2:
            v = st.pop() & 0xFF
            st.append((v - 256 if v >= 128 else v) & _MASK64)
        elif op == 0xC3:
            v = st.pop() & 0xFFFF
            st.append((v - 65536 if v >= 32768 else v) & _MASK64)
        elif op == 0xC4:
            v = st.pop() & _MASK32
            st.append(_s32(v) & _MASK64)
        else:
            raise WasmTrap(f"unsupported opcode {op:#x}")

    @staticmethod
    def _i32_arith(op: int, a: int, b: int) -> int:
        sa, sb = _s32(a), _s32(b)
        ua, ub = a & _MASK32, b & _MASK32
        if op == 0x6A:
            return (ua + ub) & _MASK32
        if op == 0x6B:
            return (ua - ub) & _MASK32
        if op == 0x6C:
            return (ua * ub) & _MASK32
        if op == 0x6D:
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            if sa == -(1 << 31) and sb == -1:
                raise WasmTrap("integer overflow")
            q = abs(sa) // abs(sb)
            return (q if (sa < 0) == (sb < 0) else -q) & _MASK32
        if op == 0x6E:
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            return (ua // ub) & _MASK32
        if op == 0x6F:
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            # truncated division remainder, pure integer math
            q = abs(sa) // abs(sb)
            q = q if (sa < 0) == (sb < 0) else -q
            return (sa - sb * q) & _MASK32
        if op == 0x70:
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            return (ua % ub) & _MASK32
        if op == 0x71:
            return ua & ub
        if op == 0x72:
            return ua | ub
        if op == 0x73:
            return ua ^ ub
        if op == 0x74:
            return (ua << (ub % 32)) & _MASK32
        if op == 0x75:
            return (sa >> (ub % 32)) & _MASK32
        if op == 0x76:
            return ua >> (ub % 32)
        if op == 0x77:
            n = ub % 32
            return ((ua << n) | (ua >> (32 - n))) & _MASK32 if n else ua
        if op == 0x78:
            n = ub % 32
            return ((ua >> n) | (ua << (32 - n))) & _MASK32 if n else ua
        raise WasmTrap(f"bad i32 arith {op:#x}")

    @staticmethod
    def _i64_arith(op: int, a: int, b: int) -> int:
        sa, sb = _s64(a), _s64(b)
        ua, ub = a & _MASK64, b & _MASK64
        if op == 0x7C:
            return (ua + ub) & _MASK64
        if op == 0x7D:
            return (ua - ub) & _MASK64
        if op == 0x7E:
            return (ua * ub) & _MASK64
        if op == 0x7F:
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            if sa == -(1 << 63) and sb == -1:
                raise WasmTrap("integer overflow")
            q = abs(sa) // abs(sb)
            return (q if (sa < 0) == (sb < 0) else -q) & _MASK64
        if op == 0x80:
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            return (ua // ub) & _MASK64
        if op == 0x81:
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            # truncated remainder with INTEGER math — float division
            # loses precision beyond 2^53 and returns wrong remainders
            q = abs(sa) // abs(sb)
            q = q if (sa < 0) == (sb < 0) else -q
            return (sa - sb * q) & _MASK64
        if op == 0x82:
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            return (ua % ub) & _MASK64
        if op == 0x83:
            return ua & ub
        if op == 0x84:
            return ua | ub
        if op == 0x85:
            return ua ^ ub
        if op == 0x86:
            return (ua << (ub % 64)) & _MASK64
        if op == 0x87:
            return (sa >> (ub % 64)) & _MASK64
        if op == 0x88:
            return ua >> (ub % 64)
        if op == 0x89:
            n = ub % 64
            return ((ua << n) | (ua >> (64 - n))) & _MASK64 if n else ua
        if op == 0x8A:
            n = ub % 64
            return ((ua >> n) | (ua << (64 - n))) & _MASK64 if n else ua
        raise WasmTrap(f"bad i64 arith {op:#x}")

    @staticmethod
    def _f_op(rel: int, st: list, bits: int) -> float:
        def norm(x: float) -> float:
            if bits == 32:
                return struct.unpack("<f", struct.pack("<f", x))[0]
            return x

        if rel <= 6:  # unary: abs neg ceil floor trunc nearest sqrt
            a = st.pop()
            if rel == 0:
                return norm(abs(a))
            if rel == 1:
                return norm(-a)
            if rel == 2:
                return norm(math.ceil(a))
            if rel == 3:
                return norm(math.floor(a))
            if rel == 4:
                return norm(math.trunc(a))
            if rel == 5:
                # round-half-to-even
                return norm(
                    float(round(a))
                    if a % 1 != 0.5 and a % 1 != -0.5
                    else norm(2.0 * round(a / 2.0))
                )
            if rel == 6:
                return norm(math.sqrt(a))
        b = st.pop()
        a = st.pop()
        if rel == 7:
            return norm(a + b)
        if rel == 8:
            return norm(a - b)
        if rel == 9:
            return norm(a * b)
        if rel == 10:
            if b == 0:
                return math.inf if a > 0 else -math.inf if a < 0 else math.nan
            return norm(a / b)
        if rel == 11:
            return norm(min(a, b))
        if rel == 12:
            return norm(max(a, b))
        if rel == 13:
            return norm(math.copysign(abs(a), b))
        raise WasmTrap(f"bad float op {rel}")

    @staticmethod
    def _trunc(v: float, bits: int, signed: bool) -> int:
        if math.isnan(v) or math.isinf(v):
            raise WasmTrap("invalid conversion to integer")
        t = math.trunc(v)
        if signed:
            lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        else:
            lo, hi = 0, (1 << bits) - 1
        if not lo <= t <= hi:
            raise WasmTrap("integer overflow")
        return t & ((1 << bits) - 1)
