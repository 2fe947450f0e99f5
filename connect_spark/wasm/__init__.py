"""Pure-Python WebAssembly MVP runtime for the `wasm` processor
(reference: internal/impl/wasm/processor_wazero.go — wazero with the
`benthos_wasm` host module).  No wasm runtime ships in this container,
so the core-spec binary format and instruction set are implemented
here from the public specification (W3C WebAssembly Core 1.0), exactly
like the repo's other from-spec codecs (LZ4, AES, Argon2)."""

from connect_spark.wasm.interp import Instance, Module, WasmTrap

__all__ = ["Module", "Instance", "WasmTrap"]
