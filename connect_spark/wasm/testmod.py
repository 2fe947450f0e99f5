"""Built-in demo modules assembled from spec primitives (wasm/asm.py)
— used by the correctness gate and tests; real deployments load
modules compiled by Go/Rust/TinyGo toolchains."""

from __future__ import annotations

from functools import lru_cache

from connect_spark.wasm import asm as A


@lru_cache(maxsize=1)
def uppercase_module() -> bytes:
    """process(): read content via the benthos_wasm host functions,
    ASCII-uppercase it in linear memory, write it back. Exports a bump
    `malloc` from a mutable global."""
    types = [
        A.functype([], [A.I64]),                       # as_bytes
        A.functype([A.I32, A.I32], []),                # set_bytes
        A.functype([A.I32, A.I32], [A.I64]),           # get_meta
        A.functype([A.I32, A.I32, A.I32, A.I32], []),  # set_meta
        A.functype([A.I32], [A.I32]),                  # malloc
        A.functype([], []),                            # process
    ]
    imports = [
        A.import_func("benthos_wasm", "v0_msg_as_bytes", 0),
        A.import_func("benthos_wasm", "v0_msg_set_bytes", 1),
        A.import_func("benthos_wasm", "v0_msg_get_meta", 2),
        A.import_func("benthos_wasm", "v0_msg_set_meta", 3),
    ]
    malloc = (
        A.global_get(0)
        + A.global_get(0) + A.local_get(0) + A.I32_ADD + A.global_set(0)
        + A.END
    )
    L_PTR, L_LEN, L_I, L_B, L_PL = 0, 1, 2, 3, 4
    process = (
        A.call(0) + A.local_set(L_PL)
        + A.local_get(L_PL) + A.i64c(32) + A.I64_SHR_U
        + A.I32_WRAP_I64 + A.local_set(L_PTR)
        + A.local_get(L_PL) + A.I32_WRAP_I64 + A.local_set(L_LEN)
        + A.i32c(0) + A.local_set(L_I)
        + A.block() + A.loop()
        + A.local_get(L_I) + A.local_get(L_LEN) + A.I32_GE_U + A.br_if(1)
        + A.local_get(L_PTR) + A.local_get(L_I) + A.I32_ADD
        + A.load8_u() + A.local_set(L_B)
        + A.local_get(L_B) + A.i32c(97) + A.I32_GE_U
        + A.if_()
        + A.local_get(L_B) + A.i32c(123) + A.I32_LT_U
        + A.if_()
        + A.local_get(L_PTR) + A.local_get(L_I) + A.I32_ADD
        + A.local_get(L_B) + A.i32c(32) + A.I32_SUB + A.store8()
        + A.END + A.END
        + A.local_get(L_I) + A.i32c(1) + A.I32_ADD + A.local_set(L_I)
        + A.br(0)
        + A.END + A.END
        + A.local_get(L_PTR) + A.local_get(L_LEN) + A.call(1)
        + A.END
    )
    return A.module(
        types=types,
        imports=imports,
        func_type_idxs=[4, 5],
        memory_pages=1,
        globals_=[bytes([A.I32, 1]) + A.i32c(4096) + A.END],
        exports=[A.export("malloc", 0, 4), A.export("process", 0, 5)],
        codes=[
            A.func_body([], malloc),
            A.func_body([(1, A.I32)] * 4 + [(1, A.I64)], process),
        ],
    )
