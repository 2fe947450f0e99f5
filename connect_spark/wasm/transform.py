"""Redpanda Data Transform ABI on the pure-Python WASM runtime
(reference: internal/impl/redpanda/{processor_data_transform.go,
functions.go,serde.go}).

The guest runs `_start` as a coroutine: it blocks inside the
`read_batch_header` host call until the host submits a batch, reads
records with `read_next_record`, emits with `write_record[_with_
options]`, then loops. The Go engine runs the guest on a goroutine
bridged by two channels (processor_data_transform.go:267-293,
functions.go:47-84); here a daemon thread and two queues play those
roles.

Serde (serde.go): Go zigzag varints; a record is
    sized(key) sized(value) varint(n_headers) { sized(key) sized(val) }*
with nil encoded as size -1.
"""

from __future__ import annotations

import queue
import struct
import threading
from dataclasses import dataclass, field

from connect_spark.wasm.interp import Instance, Module, WasmTrap

_NO_ACTIVE = -1 & 0xFFFFFFFF  # noActiveTransform (int32 -1)
_INVALID = -2 & 0xFFFFFFFF


# --- Go varint (zigzag) serde ---------------------------------------


def _put_varint(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _get_varint(b: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        byte = b[pos]
        pos += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _put_sized(b: bytes | None) -> bytes:
    if b is None:
        return _put_varint(-1)
    return _put_varint(len(b)) + b


def _get_sized(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    n, pos = _get_varint(buf, pos)
    if n < 0:
        return None, pos
    return buf[pos : pos + n], pos + n


@dataclass
class TransformMessage:
    value: bytes
    key: bytes | None = None
    timestamp: int = 0
    offset: int = 0
    headers: list[tuple[str, bytes]] = field(default_factory=list)
    output_topic: str | None = None

    def serialize(self) -> bytes:
        out = _put_sized(self.key) + _put_sized(self.value)
        out += _put_varint(len(self.headers))
        for k, v in self.headers:
            out += _put_sized(k.encode()) + _put_sized(v)
        return out

    @classmethod
    def deserialize(cls, buf: bytes) -> "TransformMessage":
        key, pos = _get_sized(buf, 0)
        value, pos = _get_sized(buf, pos)
        n, pos = _get_varint(buf, pos)
        headers = []
        for _ in range(n):
            k, pos = _get_sized(buf, pos)
            v, pos = _get_sized(buf, pos)
            headers.append(((k or b"").decode(), v or b""))
        return cls(value=value or b"", key=key, headers=headers)


# --- engine ----------------------------------------------------------

_CLOSE = object()


class TransformEngine:
    """One guest module processing batches of TransformMessage."""

    def __init__(self, binary: bytes, timeout: float = 30.0):
        self.timeout = timeout
        self.host_q: queue.Queue = queue.Queue()
        self.guest_q: queue.Queue = queue.Queue()
        self.input_batch: list[TransformMessage] = []
        self.output_batch: list[TransformMessage] = []
        self.target_index = 0
        self.guest_error: BaseException | None = None

        module = Module(binary)
        imports = self._host_imports(module)
        self.inst = Instance(module, imports)
        if not self.inst.has_export("_start"):
            raise WasmTrap("_start function is required")
        self._thread = threading.Thread(target=self._run_guest, daemon=True)
        self._thread.start()
        # wait for the guest to reach its first read_batch_header
        self.host_q.get(timeout=self.timeout)
        if self.guest_error:
            raise self.guest_error

    def _host_imports(self, module: Module) -> dict:
        imports = {
            "redpanda_transform.check_abi_version_1": lambda inst: None,
            "redpanda_transform.check_abi_version_2": lambda inst: None,
            "redpanda_transform.read_batch_header": self._read_batch_header,
            "redpanda_transform.read_next_record": self._read_next_record,
            "redpanda_transform.write_record": self._write_record,
            "redpanda_transform.write_record_with_options": (
                self._write_record_with_options
            ),
        }
        # minimal WASI stubs so SDK-built modules instantiate
        for mod, nm, kind, extra in module.imports:
            if kind == 0 and mod == "wasi_snapshot_preview1":
                key = f"{mod}.{nm}"
                if nm == "proc_exit":
                    imports[key] = self._proc_exit
                elif key not in imports:
                    n_results = len(module.types[extra].results)
                    imports[key] = (
                        (lambda inst, *a: 0)
                        if n_results
                        else (lambda inst, *a: None)
                    )
        return imports

    def _run_guest(self) -> None:
        try:
            self.inst.invoke("_start")
        except _GuestExit:
            pass
        except BaseException as exc:  # noqa: BLE001 — surfaced to host
            self.guest_error = exc
        finally:
            self.host_q.put(_CLOSE)

    # ---- ABI host functions -----------------------------------------

    def _proc_exit(self, inst, code):
        raise _GuestExit(code)

    def _read_batch_header(
        self, inst, _a, record_count_ptr, *_rest
    ) -> int:
        self.host_q.put(None)  # done with previous batch / ready
        item = self.guest_q.get()
        if item is _CLOSE:
            return _NO_ACTIVE
        inst.write_mem(
            record_count_ptr & 0xFFFFFFFF,
            struct.pack("<I", len(self.input_batch)),
        )
        longest = max(
            (len(m.serialize()) for m in self.input_batch), default=0
        )
        return longest & 0xFFFFFFFF

    def _read_next_record(
        self, inst, attributes_ptr, timestamp_ptr, _off, data_ptr, data_len
    ) -> int:
        if self.target_index >= len(self.input_batch):
            return _NO_ACTIVE
        msg = self.input_batch[self.target_index]
        inst.write_mem(attributes_ptr & 0xFFFFFFFF, b"\x00")
        inst.write_mem(
            timestamp_ptr & 0xFFFFFFFF,
            struct.pack("<Q", msg.timestamp & 0xFFFFFFFFFFFFFFFF),
        )
        data = msg.serialize()
        if len(data) > (data_len & 0xFFFFFFFF):
            return _INVALID
        inst.write_mem(data_ptr & 0xFFFFFFFF, data)
        self.target_index += 1
        return len(data) & 0xFFFFFFFF

    def _write_record(self, inst, data_ptr, data_len) -> int:
        buf = inst.read_mem(data_ptr & 0xFFFFFFFF, data_len & 0xFFFFFFFF)
        try:
            self.output_batch.append(TransformMessage.deserialize(buf))
        except (IndexError, UnicodeDecodeError):
            return _INVALID
        return len(buf) & 0xFFFFFFFF

    def _write_record_with_options(
        self, inst, data_ptr, data_len, opts_ptr, opts_len
    ) -> int:
        rc = self._write_record(inst, data_ptr, data_len)
        if rc != _INVALID and (opts_len & 0xFFFFFFFF):
            opts = inst.read_mem(
                opts_ptr & 0xFFFFFFFF, opts_len & 0xFFFFFFFF
            )
            if opts and opts[0] == 0x01:
                topic, _ = _get_sized(opts, 1)
                self.output_batch[-1].output_topic = (topic or b"").decode()
        return rc

    # ---- host drive --------------------------------------------------

    def run(
        self, batch: list[TransformMessage]
    ) -> list[TransformMessage]:
        if self.guest_error:
            raise self.guest_error
        self.input_batch = batch
        self.target_index = 0
        self.output_batch = []
        self.guest_q.put(None)
        done = self.host_q.get(timeout=self.timeout)
        if self.guest_error:
            raise self.guest_error
        if done is _CLOSE:
            raise WasmTrap("transform guest exited mid-batch")
        return self.output_batch

    def close(self) -> None:
        self.guest_q.put(_CLOSE)
        self._thread.join(timeout=self.timeout)


class _GuestExit(Exception):
    pass
