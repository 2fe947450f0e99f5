"""ffi processor (operators/ffi.py; reference
internal/impl/ffi/processor.go): real dlopen + invoke through ctypes,
driven against libc — including the reference doc's own memcmp
example."""

from __future__ import annotations

import json

import pytest

from connect_spark.plans.pipeline import apply_processor


def test_reference_doc_memcmp_example(spark):
    """processor.go:80-95 example: libc memcmp("foo","bar",3) != 0,
    memcmp("foo","foo",3) == 0."""
    df = spark.createDataFrame([("foo",), ("bar",)], ["content"])
    out = apply_processor(
        df,
        {
            "ffi": {
                "library_path": "libc.so.6",
                "function_name": "memcmp",
                "args_mapping": 'root = [this.content, "bar", 3]',
                "signature": {
                    "return": {"type": "int32"},
                    "parameters": [
                        {"type": "byte*"},
                        {"type": "byte*"},
                        {"type": "int64"},
                    ],
                },
            }
        },
    ).collect()
    res = {r["content"]: json.loads(r["ffi_result"]) for r in out}
    assert res["bar"] == [0]
    assert res["foo"] != [0]


def test_strlen_per_message(spark):
    df = spark.createDataFrame([("a",), ("abcd",)], ["content"])
    out = apply_processor(
        df,
        {
            "ffi": {
                "library_path": "libc.so.6",
                "function_name": "strlen",
                "args_mapping": "root = [this.content]",
                "signature": {
                    "return": {"type": "int64"},
                    "parameters": [{"type": "byte*"}],
                },
            }
        },
    ).collect()
    assert {r["content"]: json.loads(r["ffi_result"])[0] for r in out} == {
        "a": 1,
        "abcd": 4,
    }


def test_out_parameter_mutation(spark):
    """`out` pointer parameters return the mutated buffer — libc
    strcat appends in place."""
    from connect_spark.operators.ffi import ffi_call

    df = spark.createDataFrame([("hello",)], ["content"])
    out = ffi_call(
        df,
        "libc.so.6",
        "strcat",
        'root = [this.content, " world"]',
        {
            "return": {"type": "void"},
            "parameters": [
                {"type": "byte*", "out": True, "out_size": 64},
                {"type": "byte*"},
            ],
        },
    ).collect()[0]
    assert json.loads(out["ffi_result"]) == ["hello world"]


def test_invalid_config_fails_fast(spark):
    from connect_spark.operators.ffi import ffi_call

    df = spark.createDataFrame([("x",)], ["content"])
    with pytest.raises(ValueError, match="invalid return type"):
        ffi_call(df, "libc.so.6", "strlen", "root = []",
                 {"return": {"type": "float"}})
    with pytest.raises(ValueError, match="out parameters"):
        ffi_call(df, "libc.so.6", "strlen", "root = []",
                 {"return": {"type": "void"},
                  "parameters": [{"type": "int32", "out": True}]})
    with pytest.raises(OSError):
        ffi_call(df, "libnope_missing.so", "f", "root = []",
                 {"return": {"type": "void"}})
