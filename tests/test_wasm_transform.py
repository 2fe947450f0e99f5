"""Redpanda Data Transform ABI (connect_spark/wasm/transform.py):
the coroutine protocol (read_batch_header blocking / read_next_record
/ write_record), Go-varint serde, and the YAML processor."""

from __future__ import annotations

import pytest

from connect_spark.wasm.transform import (
    TransformEngine,
    TransformMessage,
    _get_varint,
    _put_varint,
)
from tests import wasm_asm as A


def test_go_varint_zigzag_roundtrip():
    for n in (0, 1, -1, 63, -64, 300, -300, 2**40, -(2**40)):
        buf = _put_varint(n)
        got, pos = _get_varint(buf, 0)
        assert got == n and pos == len(buf)


def test_message_serde_roundtrip():
    m = TransformMessage(
        value=b"payload",
        key=b"k1",
        headers=[("h1", b"v1"), ("h2", b"")],
    )
    back = TransformMessage.deserialize(m.serialize())
    assert back.value == b"payload"
    assert back.key == b"k1"
    assert back.headers == [("h1", b"v1"), ("h2", b"")]
    # nil key encodes as -1 and decodes back to None
    m2 = TransformMessage(value=b"x")
    assert TransformMessage.deserialize(m2.serialize()).key is None


def _identity_transform_module() -> bytes:
    """_start: loop over batches; for each record, read it into memory
    and write it straight back (the mirror transform — exercises the
    full ABI protocol and serde in both directions)."""
    types = [
        A.functype([], []),                      # 0: check_abi
        A.functype([A.I32] * 10, [A.I32]),       # 1: read_batch_header
        A.functype([A.I32] * 5, [A.I32]),        # 2: read_next_record
        A.functype([A.I32, A.I32], [A.I32]),     # 3: write_record
        A.functype([], []),                      # 4: _start
    ]
    imports = [
        A.import_func("redpanda_transform", "check_abi_version_2", 0),
        A.import_func("redpanda_transform", "read_batch_header", 1),
        A.import_func("redpanda_transform", "read_next_record", 2),
        A.import_func("redpanda_transform", "write_record", 3),
    ]
    # locals: 0=n(batch rc) 1=count 2=i 3=sz
    start = (
        A.call(0)  # check_abi_version_2
        + A.block()  # outer exit
        + A.loop()  # batch loop
        # n = read_batch_header(0, 8, 0 x8)
        + A.i32c(0) + A.i32c(8) + A.i32c(0) * 8 + A.call(1)
        + A.local_tee(0)
        + A.i32c(0) + A.I32_LT_S + A.br_if(1)  # n < 0 -> exit
        + A.i32c(8) + A.i32_load() + A.local_set(1)  # count = mem[8]
        + A.i32c(0) + A.local_set(2)
        + A.block() + A.loop()  # record loop
        + A.local_get(2) + A.local_get(1) + A.I32_GE_U + A.br_if(1)
        # sz = read_next_record(attr@16, ts@24, off@32, data@1024, 60000)
        + A.i32c(16) + A.i32c(24) + A.i32c(32) + A.i32c(1024)
        + A.i32c(60000) + A.call(2) + A.local_tee(3)
        + A.i32c(0) + A.I32_LT_S + A.br_if(3)  # error -> exit all
        + A.i32c(1024) + A.local_get(3) + A.call(3) + A.DROP
        + A.local_get(2) + A.i32c(1) + A.I32_ADD + A.local_set(2)
        + A.br(0)
        + A.END + A.END  # record loop/block
        + A.br(0)
        + A.END + A.END  # batch loop/outer
        + A.END
    )
    return A.module(
        types=types,
        imports=imports,
        func_type_idxs=[4],
        memory_pages=1,
        exports=[A.export("_start", 0, 4), A.export("memory", 2, 0)],
        codes=[A.func_body([(4, A.I32)], start)],
    )


def test_identity_transform_roundtrips_batches():
    eng = TransformEngine(_identity_transform_module())
    try:
        batch = [
            TransformMessage(value=b"first", key=b"a", timestamp=111),
            TransformMessage(
                value=b"second", headers=[("h", b"v")]
            ),
        ]
        out = eng.run(batch)
        assert [m.value for m in out] == [b"first", b"second"]
        assert out[0].key == b"a"
        assert out[1].headers == [("h", b"v")]
        # engine is reusable across batches (the pool contract)
        out2 = eng.run([TransformMessage(value=b"third")])
        assert [m.value for m in out2] == [b"third"]
    finally:
        eng.close()


def test_missing_start_rejected():
    binary = A.module(
        types=[A.functype([], [])],
        func_type_idxs=[0],
        exports=[A.export("not_start", 0, 0)],
        codes=[A.func_body([], A.END)],
    )
    with pytest.raises(Exception, match="_start"):
        TransformEngine(binary)


def test_yaml_redpanda_data_transform_processor(spark, tmp_path):
    path = str(tmp_path / "identity.wasm")
    with open(path, "wb") as fh:
        fh.write(_identity_transform_module())
    from connect_spark.plans.pipeline import apply_processor

    df = spark.createDataFrame([("alpha",), ("beta",)], ["content"])
    out = apply_processor(
        df, {"redpanda_data_transform": {"module_path": path}}
    ).collect()
    assert {r["content"] for r in out} == {"alpha", "beta"}
