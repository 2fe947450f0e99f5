"""Pure-Python WASM runtime (connect_spark/wasm/): interpreter
semantics on hand-assembled spec-conformant binaries, then the
benthos_wasm host contract (functions.go:36-140) end to end."""

from __future__ import annotations

import pytest

from connect_spark.wasm import Instance, Module, WasmTrap
from connect_spark.wasm.host import MessageRunner
from tests import wasm_asm as A


def _simple_module(code: bytes, results=(A.I32,), params=(), locals_=()):
    """One exported function `f` with the given body."""
    return A.module(
        types=[A.functype(list(params), list(results))],
        func_type_idxs=[0],
        exports=[A.export("f", 0, 0)],
        codes=[A.func_body(list(locals_), code)],
    )


def test_arithmetic_and_locals():
    # f(a, b) = (a + b) * (a - b)
    code = (
        A.local_get(0) + A.local_get(1) + A.I32_ADD
        + A.local_get(0) + A.local_get(1) + A.I32_SUB
        + A.I32_MUL + A.END
    )
    binary = _simple_module(code, params=(A.I32, A.I32))
    inst = Instance(Module(binary))
    assert inst.invoke("f", 7, 3) == 40
    assert inst.invoke("f", 10, 0) == 100


def test_factorial_loop_and_branches():
    # iterative factorial with block/loop/br_if
    # locals: 0=n (param), 1=acc
    code = (
        A.i32c(1) + A.local_set(1)
        + A.block()
        + A.loop()
        + A.local_get(0) + A.I32_EQZ + A.br_if(1)       # done when n==0
        + A.local_get(1) + A.local_get(0) + A.I32_MUL + A.local_set(1)
        + A.local_get(0) + A.i32c(1) + A.I32_SUB + A.local_set(0)
        + A.br(0)
        + A.END + A.END
        + A.local_get(1) + A.END
    )
    binary = _simple_module(code, params=(A.I32,), locals_=[(1, A.I32)])
    inst = Instance(Module(binary))
    assert inst.invoke("f", 5) == 120
    assert inst.invoke("f", 0) == 1
    assert inst.invoke("f", 10) == 3628800


def test_if_else_and_signed_compare():
    # f(a) = a < 0 ? -a : a   (abs via if/else with result)
    code = (
        A.local_get(0) + A.i32c(0) + A.I32_LT_S
        + A.if_(A.I32)
        + A.i32c(0) + A.local_get(0) + A.I32_SUB
        + A.ELSE
        + A.local_get(0)
        + A.END + A.END
    )
    binary = _simple_module(code, params=(A.I32,))
    inst = Instance(Module(binary))
    assert inst.invoke("f", 5) == 5
    assert inst.invoke("f", (-7) & 0xFFFFFFFF) == 7


def test_memory_load_store_and_data_segment():
    # f() = mem[0..3] as i32 + 1, after data segment wrote 41
    code = (
        A.i32c(0) + A.i32_load() + A.i32c(1) + A.I32_ADD + A.END
    )
    binary = A.module(
        types=[A.functype([], [A.I32])],
        func_type_idxs=[0],
        memory_pages=1,
        exports=[A.export("f", 0, 0)],
        codes=[A.func_body([], code)],
        data=[(0, (41).to_bytes(4, "little"))],
    )
    inst = Instance(Module(binary))
    assert inst.invoke("f") == 42


def test_call_between_functions_and_globals():
    # g0 mutable global; f0 bumps it by param, f1 = f0(x) then g0
    bump = (
        A.global_get(0) + A.local_get(0) + A.I32_ADD + A.global_set(0)
        + A.END
    )
    read = A.local_get(0) + A.call(0) + A.global_get(0) + A.END
    binary = A.module(
        types=[
            A.functype([A.I32], []),
            A.functype([A.I32], [A.I32]),
        ],
        func_type_idxs=[0, 1],
        globals_=[bytes([A.I32, 1]) + A.i32c(100) + A.END],
        exports=[A.export("f", 0, 1)],
        codes=[A.func_body([], bump), A.func_body([], read)],
    )
    inst = Instance(Module(binary))
    assert inst.invoke("f", 11) == 111
    assert inst.invoke("f", 9) == 120  # global persists


def test_call_indirect_via_table():
    # two funcs: double and square; f(i, x) calls table[i](x)
    double = A.local_get(0) + A.i32c(2) + A.I32_MUL + A.END
    square = A.local_get(0) + A.local_get(0) + A.I32_MUL + A.END
    dispatch = (
        A.local_get(1)
        + A.local_get(0)
        + b"\x11" + A.leb(0) + b"\x00"  # call_indirect type 0
        + A.END
    )
    binary = A.module(
        types=[
            A.functype([A.I32], [A.I32]),
            A.functype([A.I32, A.I32], [A.I32]),
        ],
        func_type_idxs=[0, 0, 1],
        tables=[2],
        elements=[(0, [0, 1])],
        exports=[A.export("f", 0, 2)],
        codes=[
            A.func_body([], double),
            A.func_body([], square),
            A.func_body([], dispatch),
        ],
    )
    inst = Instance(Module(binary))
    assert inst.invoke("f", 0, 21) == 42
    assert inst.invoke("f", 1, 9) == 81


def test_i64_and_f64_ops():
    code = (
        A.i64c(1 << 40) + A.i64c(3) + A.I64_MUL
        + A.i64c(8) + A.I64_SHR_U + A.I32_WRAP_I64 + A.END
    )
    binary = _simple_module(code)
    assert Instance(Module(binary)).invoke("f") == (3 << 40) >> 8 & 0xFFFFFFFF

    fcode = A.f64c(2.25) + A.F64_SQRT + A.f64c(0.5) + A.F64_ADD + A.END
    binary = _simple_module(fcode, results=(A.F64,))
    assert Instance(Module(binary)).invoke("f") == 2.0


def test_div_by_zero_traps_and_unreachable():
    code = A.i32c(1) + A.i32c(0) + A.I32_DIV_S + A.END
    with pytest.raises(WasmTrap, match="divide by zero"):
        Instance(Module(_simple_module(code))).invoke("f")
    with pytest.raises(WasmTrap, match="unreachable"):
        Instance(Module(_simple_module(A.UNREACHABLE + A.END))).invoke("f")


# --- the benthos_wasm host contract ---------------------------------


from connect_spark.wasm.testmod import uppercase_module as _uppercase_module


def test_host_contract_uppercase_roundtrip():
    runner = MessageRunner(_uppercase_module())
    content, meta = runner.process(b"hello, World 42!")
    assert content == b"HELLO, WORLD 42!"
    content, _ = runner.process(b"second message")  # runner is reusable
    assert content == b"SECOND MESSAGE"


def test_host_meta_functions():
    """A module that copies meta key 'k' (bytes at data 0..1) into the
    message content via get_meta + set_bytes."""
    types = [
        A.functype([], [A.I64]),
        A.functype([A.I32, A.I32], []),
        A.functype([A.I32, A.I32], [A.I64]),
        A.functype([A.I32, A.I32, A.I32, A.I32], []),
        A.functype([A.I32], [A.I32]),
        A.functype([], []),
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
    # process: pl = get_meta(ptr=0, len=1); set_bytes(pl>>32, pl&..)
    process = (
        A.i32c(0) + A.i32c(1) + A.call(2) + A.local_set(0)
        + A.local_get(0) + A.i64c(32) + A.I64_SHR_U + A.I32_WRAP_I64
        + A.local_get(0) + A.I32_WRAP_I64
        + A.call(1)
        + A.END
    )
    binary = A.module(
        types=types,
        imports=imports,
        func_type_idxs=[4, 5],
        memory_pages=1,
        globals_=[bytes([A.I32, 1]) + A.i32c(4096) + A.END],
        exports=[A.export("malloc", 0, 4), A.export("process", 0, 5)],
        codes=[
            A.func_body([], malloc),
            A.func_body([(1, A.I64)], process),
        ],
        data=[(0, b"k")],
    )
    runner = MessageRunner(binary)
    content, meta = runner.process(b"original", {"k": "replaced!"})
    assert content == b"replaced!"


def test_missing_process_export_fails():
    binary = _simple_module(A.i32c(1) + A.END)
    with pytest.raises(WasmTrap, match="no function 'process'"):
        MessageRunner(binary)


def test_yaml_wasm_processor(spark, tmp_path):
    path = str(tmp_path / "upper.wasm")
    with open(path, "wb") as fh:
        fh.write(_uppercase_module())
    from connect_spark.plans.pipeline import apply_processor

    df = spark.createDataFrame([("abc",), ("Mixed Case",)], ["content"])
    out = apply_processor(
        df, {"wasm": {"module_path": path}}
    ).collect()
    assert {r["content"] for r in out} == {"ABC", "MIXED CASE"}
