"""The `benthos_wasm` host module + the wasm processor runner
(reference: internal/impl/wasm/{processor_wazero.go,functions.go}).

Host functions exported to guest modules (functions.go:36-140):
- v0_msg_as_bytes() -> i64            (ptr<<32 | len of the content)
- v0_msg_set_bytes(ptr: i32, len: i32)
- v0_msg_get_meta(kptr, klen) -> i64  (ptr<<32 | len of the value)
- v0_msg_set_meta(kptr, klen, vptr, vlen)

Inbound allocations go through the guest's exported allocator —
`malloc` (Go/TinyGo) or `allocate` (Rust), exactly the export probe
wazero performs (processor_wazero.go:141-144).
"""

from __future__ import annotations

from connect_spark.wasm.interp import Instance, Module, WasmTrap


class MessageRunner:
    """One instantiated module processing messages sequentially (the
    reference pools these per thread; here one runner per executor
    task does the same job)."""

    def __init__(self, binary: bytes, function: str = "process"):
        self.function = function
        self.module = Module(binary)
        self.content: bytes = b""
        self.meta: dict[str, str] = {}
        imports = {
            "benthos_wasm.v0_msg_as_bytes": self._as_bytes,
            "benthos_wasm.v0_msg_set_bytes": self._set_bytes,
            "benthos_wasm.v0_msg_get_meta": self._get_meta,
            "benthos_wasm.v0_msg_set_meta": self._set_meta,
        }
        self.inst = Instance(self.module, imports)
        if not self.inst.has_export(function):
            raise WasmTrap(f"module exports no function {function!r}")

    # ---- allocator probe (processor_wazero.go:141-144) --------------

    def _alloc(self, size: int) -> int:
        for name in ("malloc", "allocate"):
            if self.inst.has_export(name):
                return int(self.inst.invoke(name, size))
        raise WasmTrap(
            "module exports neither malloc nor allocate; cannot pass "
            "bytes inbound"
        )

    # ---- host functions ---------------------------------------------

    def _as_bytes(self, inst: Instance) -> int:
        ptr = self._alloc(len(self.content))
        inst.write_mem(ptr, self.content)
        return ((ptr << 32) | len(self.content)) & 0xFFFFFFFFFFFFFFFF

    def _set_bytes(self, inst: Instance, ptr: int, size: int) -> None:
        self.content = inst.read_mem(ptr & 0xFFFFFFFF, size & 0xFFFFFFFF)

    def _get_meta(self, inst: Instance, kptr: int, klen: int) -> int:
        key = inst.read_mem(kptr & 0xFFFFFFFF, klen & 0xFFFFFFFF).decode()
        val = self.meta.get(key, "").encode()
        ptr = self._alloc(len(val))
        inst.write_mem(ptr, val)
        return ((ptr << 32) | len(val)) & 0xFFFFFFFFFFFFFFFF

    def _set_meta(
        self, inst: Instance, kptr: int, klen: int, vptr: int, vlen: int
    ) -> None:
        key = inst.read_mem(kptr & 0xFFFFFFFF, klen & 0xFFFFFFFF).decode()
        val = inst.read_mem(vptr & 0xFFFFFFFF, vlen & 0xFFFFFFFF).decode()
        self.meta[key] = val

    # ---- per-message drive ------------------------------------------

    def process(
        self, content: bytes, meta: dict[str, str] | None = None
    ) -> tuple[bytes, dict[str, str]]:
        self.content = content
        self.meta = dict(meta or {})
        self.inst.invoke(self.function)
        return self.content, self.meta
