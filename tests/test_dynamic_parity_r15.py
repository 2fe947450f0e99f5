"""Two-path parity for the r15 dynamic batch evaluator.

The engine runs a mapping EITHER as Catalyst Columns (structured
frames — the hot path) or through pyeval.eval_batch (raw content
envelopes — the message-model path). Both must produce the same
documents for the shared surface. Each case here runs one mapping
both ways over the same rows: once via compile_mapping on a typed
frame, once via the mapping processor on the serialized content
envelope (which routes through _dynamic_apply), and compares the
resulting document multisets.

Scope: constructs BOTH paths implement (field math, if/else, match
with and without subject, string methods, naked-path assignment, the
pipe-coalesce operator, meta assignment). Known intentional
divergences stay out: strict-bool && errors (Column path follows
Spark null semantics), batch functions on unordered frames.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

ROWS = [
    {"a": 4, "b": 7, "name": "alpha beta", "flag": True},
    {"a": 0, "b": 2, "name": "Gamma", "flag": False},
    {"a": 15, "b": 0, "name": "delta epsilon zeta", "flag": True},
]

CASES = [
    # naked-path assignment + arithmetic
    "total = this.a + this.b\nroot.a = this.a",
    # if / else
    'root.cls = if this.a > 5 { "big" } else { "small" }',
    # match without subject
    'root.m = match { this.a > 10 => "high", this.a > 2 => "mid", '
    '_ => "low" }',
    # string methods
    "root.u = this.name.uppercase()\n"
    'root.n = this.name.split(" ").length()',
    # pipe coalesce on a missing field
    'root.v = this.missing | this.a',
    # meta assignment + root_meta
    'meta src = "parity"\nroot.m = root_meta("src")\nroot.a = this.a',
    # nested assignment
    "root.out.sum = this.a + this.b\nroot.out.flag = this.flag",
]


def _typed(spark):
    return spark.createDataFrame(
        [tuple(r.values()) for r in ROWS], list(ROWS[0].keys())
    )


def _envelope(spark):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rows = [
        (json.dumps(r, separators=(",", ":")), i)
        for i, r in enumerate(ROWS)
    ]
    schema = StructType([
        StructField("content", StringType()),
        StructField("_arrival_order", LongType()),
    ])
    return spark.createDataFrame(rows, schema)


def _norm(doc: dict):
    def n(v):
        if isinstance(v, float) and v.is_integer():
            return int(v)
        if isinstance(v, dict):
            return {k: n(x) for k, x in v.items()}
        if isinstance(v, list):
            return [n(x) for x in v]
        return v

    return json.dumps(n(doc), sort_keys=True)


def _column_path(spark, src):
    from connect_spark.bloblang.compiler import compile_mapping

    out = compile_mapping(_typed(spark), src, mode="mapping")
    docs = []
    for r in out.collect():
        d = r.asDict(recursive=True)
        d.pop("_meta", None)
        docs.append(_norm(d))
    return sorted(docs)


def _dynamic_path(spark, src):
    from connect_spark.plans.pipeline import _dynamic_apply

    out = _dynamic_apply(_envelope(spark), src, "mapping")
    docs = []
    for r in out.collect():
        assert r["_error"] is None, r["_error"]
        docs.append(_norm(json.loads(r["content"])))
    return sorted(docs)


@pytest.mark.parametrize("src", CASES)
def test_mapping_two_path_parity(spark, src):
    assert _column_path(spark, src) == _dynamic_path(spark, src)


def test_dynamic_deleted_and_meta(spark):
    """deleted() drops the same rows on both paths, and meta
    assignments surface in the envelope metadata."""
    src = 'root = if this.a > 10 { deleted() }\nmeta tag = "kept"'
    from connect_spark.plans.pipeline import _dynamic_apply

    out = _dynamic_apply(_envelope(spark), src, "mapping").collect()
    assert len(out) == 2  # a=15 dropped
    for r in out:
        assert r["_meta"]["tag"] == "kept"
    from connect_spark.bloblang.compiler import compile_mapping

    col_out = compile_mapping(
        _typed(spark),
        "root = if this.a > 10 { deleted() }",
        mode="mapping",
    ).collect()
    assert len(col_out) == 2
