"""Regression tests for the round-2 ADVICE.md findings."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from connect_spark.functions.avro_codec import decode, encode, resolve_names
from connect_spark.plans.pipeline import build_pipeline
from connect_spark.plans.templates import (
    TemplateError,
    clear_templates,
    expand_component,
    register_template,
)
from connect_spark.sources.files import read_file_messages


def _contents(df):
    return sorted(
        bytes(r.content).decode() for r in df.select("content").collect()
    )


# ------------------------------------------------ A1: switch scanner


def test_switch_scanner_first_match_wins(spark, tmp_path):
    """A file matching two case patterns is decomposed by the FIRST
    case only (scanners/switch.adoc: cases tried in order)."""
    (tmp_path / "both.jsonl").write_bytes(b"a\nb")
    df = read_file_messages(
        spark,
        str(tmp_path) + "/*",
        scanner="switch",
        scanner_conf={
            "cases": [
                {"re_match_name": r"\.jsonl$", "scanner": "lines"},
                # also matches both.jsonl — must NOT fire
                {"re_match_name": r"both", "scanner": "to_the_end"},
            ]
        },
    )
    assert sorted(_contents(df)) == ["a", "b"]


def test_switch_scanner_rejects_unmatched(spark, tmp_path):
    (tmp_path / "x.jsonl").write_bytes(b"a")
    (tmp_path / "orphan.xyz").write_bytes(b"zzz")
    with pytest.raises(ValueError, match="matched no case"):
        read_file_messages(
            spark,
            str(tmp_path) + "/*",
            scanner="switch",
            scanner_conf={
                "cases": [{"re_match_name": r"\.jsonl$", "scanner": "lines"}]
            },
        ).collect()


def test_switch_scanner_default_case(spark, tmp_path):
    """A case with no re_match_name is a catch-all."""
    (tmp_path / "x.jsonl").write_bytes(b"a\nb")
    (tmp_path / "orphan.xyz").write_bytes(b"zzz")
    df = read_file_messages(
        spark,
        str(tmp_path) + "/*",
        scanner="switch",
        scanner_conf={
            "cases": [
                {"re_match_name": r"\.jsonl$", "scanner": "lines"},
                {"scanner": "to_the_end"},
            ]
        },
    )
    assert sorted(_contents(df)) == ["a", "b", "zzz"]


# --------------------------------------------- A2: template expansion


def test_template_cycle_raises():
    clear_templates()
    register_template(
        {"name": "a", "type": "processor", "mapping": 'root.b = {}'}
    )
    register_template(
        {"name": "b", "type": "processor", "mapping": 'root.a = {}'}
    )
    with pytest.raises(TemplateError, match="cycle"):
        expand_component("a", {}, "processor")
    # self-cycle too
    register_template(
        {"name": "selfy", "type": "processor", "mapping": 'root.selfy = {}'}
    )
    with pytest.raises(TemplateError, match="cycle"):
        expand_component("selfy", {}, "processor")
    clear_templates()


def test_inline_templates_scoped_per_pipeline(spark):
    """An inline template from one config must not leak into (or
    shadow components of) a later Pipeline build."""
    clear_templates()
    cfg1 = {
        "templates": [
            {
                "name": "shadow_mapping",
                "type": "processor",
                "mapping": 'root.mapping = "root.v = 1"',
            }
        ],
        "input": {"generate": {"count": 1, "mapping": "root.v = 7"}},
        "pipeline": {"processors": [{"shadow_mapping": {}}]},
    }
    rows = build_pipeline(spark, cfg1).dataframe().collect()
    assert rows[0].v == 1
    # second pipeline, no inline templates: the name must be unknown
    cfg2 = {
        "input": {"generate": {"count": 1, "mapping": "root.v = 7"}},
        "pipeline": {"processors": [{"shadow_mapping": {}}]},
    }
    with pytest.raises(Exception):
        build_pipeline(spark, cfg2).dataframe().collect()


# ------------------------------------------------- A3: jq error rows


def test_jq_malformed_json_flags_error_keeps_row(spark):
    cfg = {
        "input": {
            "generate": {
                "count": 3,
                "mapping": 'root.content = if counter() == 1 { "not json" } '
                'else { "{\\"x\\": " + (counter() * 10).string() + "}" }',
            }
        },
        "pipeline": {"processors": [{"jq": {"query": ".x"}}]},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 3  # nothing silently dropped
    errored = [r for r in rows if r._error is not None]
    ok = sorted(r.content for r in rows if r._error is None)
    assert len(errored) == 1
    # errored message content is UNCHANGED (jq.adoc:77)
    assert errored[0].content == "not json"
    assert len(ok) == 2 and all(c.isdigit() for c in ok)


def test_jq_zero_output_filter_keeps_row(spark):
    cfg = {
        "input": {
            "generate": {"count": 2, "mapping": 'root.content = "{\\"a\\":1}"'}
        },
        "pipeline": {"processors": [{"jq": {"query": ".a | select(. > 5)"}}]},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 2
    assert all(r.content is None for r in rows)
    assert all(r._error is None for r in rows)


# ----------------------------------------- A4: javascript equality


def test_js_strict_equality_numbers():
    from connect_spark.operators.javascript import Interp, _std_globals

    def ev(expr):
        env = Interp(f"var __r = ({expr});").run(_std_globals())
        return env.get("__r")

    # JSON.parse yields Python int for whole numbers — both are the
    # single JS number type, so 1 === 1.0
    assert ev('JSON.parse("{\\"n\\": 1}").n === 1.0') is True
    assert ev("1 === 1.0") is True
    assert ev('1 === "1"') is False
    assert ev("true === 1") is False
    # null == undefined is true; null === undefined is false
    assert ev("null == undefined") is True
    assert ev("null === undefined") is False
    assert ev("null != undefined") is False
    assert ev("({}).missing == null") is True


# ---------------------------------------------- A5: avro unions


def test_avro_int_matches_float_union():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "v", "type": ["null", "double"]}],
    }
    blob = encode(json.loads('{"v": 1}'), schema)
    assert decode(blob, schema) == {"v": 1.0}
    blob2 = encode({"v": None}, schema)
    assert decode(blob2, schema) == {"v": None}


def test_avro_named_type_reference_in_union():
    schema = {
        "type": "record",
        "name": "Outer",
        "fields": [
            {
                "name": "first",
                "type": {
                    "type": "record",
                    "name": "Point",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": "int"},
                    ],
                },
            },
            # named reference, allowed by the Avro spec once declared
            {"name": "second", "type": ["null", "Point"]},
        ],
    }
    val = {"first": {"x": 1, "y": 2}, "second": {"x": 3, "y": 4}}
    blob = encode(val, schema)
    assert decode(blob, schema) == val


def test_avro_recursive_named_type():
    schema = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "int"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    val = {"v": 1, "next": {"v": 2, "next": None}}
    blob = encode(val, schema)
    assert decode(blob, schema) == val


def test_avro_unresolved_name_raises():
    with pytest.raises(ValueError, match="unresolved"):
        resolve_names(
            {
                "type": "record",
                "name": "R",
                "fields": [{"name": "v", "type": "Mystery"}],
            }
        )


# --- round-4 deep-review regression pins ----------------------------


def test_nested_after_flat_assignment_applies(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame(
        [({"name": "old", "age": 3},)],
        "raw struct<name:string,age:bigint>",
    )
    row = compile_mapping(
        df, 'root.user = this.raw\nroot.user.name = "new"'
    ).collect()[0]
    assert row.user.name == "new" and row.user.age == 3


def test_flat_after_nested_overwrites(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([(1,)], "x bigint")
    row = compile_mapping(
        df, 'root.a.b = 1\nroot.a = "flat"'
    ).collect()[0]
    assert row.a == "flat"


def test_match_subject_rebinds_this(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([("article",), ("ad",)], ["type"])
    rows = compile_mapping(
        df,
        'root.kind = match this.type { this == "article" => 1, _ => 0 }',
    ).collect()
    assert [r.kind for r in rows] == [1, 0]


def test_root_if_deleted_else_object(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([(1,), (10,)], ["x"])
    rows = compile_mapping(
        df, 'root = if this.x < 5 { deleted() } else { {"a": this.x} }'
    ).collect()
    assert len(rows) == 1 and rows[0]["a"] == 10


def test_range_negative_step_excludes_stop(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([(1,)], "x bigint")
    row = compile_mapping(df, "root.r = range(10, 0, -2)").collect()[0]
    assert row.r == [10, 8, 6, 4, 2]


def test_enumerated_empty_and_slice_negative(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([([], "abcdef")], "tags array<string>, s string")
    row = compile_mapping(
        df,
        "root.e = this.tags.enumerated()\nroot.tail = this.s.slice(-3)",
    ).collect()[0]
    assert row.e == [] and row.tail == "def"


def test_salted_join_rejects_outer_forms(spark):
    import pytest as _pytest

    from connect_spark.operators.skew import salted_join

    a = spark.range(10).toDF("k")
    b = spark.range(5).toDF("k")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(a, b, on="k", how="full_outer")


def test_awk_trailing_newline_and_printf(spark):
    from connect_spark.operators.awk import AwkProgram

    assert AwkProgram("{ print NR }").run("a\nb\n") == "1\n2"
    assert AwkProgram('{ printf "%s:", $1; print $2 }').run("a b") == "a:b"
    assert AwkProgram("END { print NR }").run("x\ny\n") == "2"


def test_functions_review_fixes(spark):
    """Round-4 second deep-review pins: msgpack bytes bridge, jq
    subtraction lexing, AES strict key length, avro required field,
    lz4 empty frame, jsonschema typed checks, cache set dedupe,
    empty vector store."""
    import json

    import pytest as _pytest

    # msgpack bin payloads decode to latin-1 text, not a task crash
    from connect_spark.functions.msgpack_codec import packb, unpackb
    from connect_spark.functions.msgpack_codec import msgpack_decode_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(packb({"k": b"\x01\x02"}),)], "b binary")
    row = df.select(msgpack_decode_udf()(F.col("b")).alias("j")).collect()[0]
    assert json.loads(row.j) == {"k": "\x01\x02"}

    # jq: unspaced subtraction parses
    from connect_spark.functions.jq import JqFilter

    assert JqFilter(".a-1").run({"a": 5}) == [4]
    assert JqFilter("-1").run({}) == [-1]

    # AES: 33-byte key rejected instead of silently truncated
    from connect_spark.functions.aes import encrypt_aes

    with _pytest.raises(ValueError, match="16, 24, or 32"):
        encrypt_aes(b"x", "ctr", bytes(33), bytes(16))

    # avro: missing required field errors
    from connect_spark.functions.avro_codec import encode

    with _pytest.raises(ValueError, match="missing required field"):
        encode({}, {"type": "record", "name": "R",
                    "fields": [{"name": "s", "type": "string"}]})

    # lz4: empty input frames roundtrip with no phantom block
    from connect_spark.functions.lz4_codec import compress, decompress

    frame = compress(b"")
    assert decompress(frame) == b""
    assert b"\x00\x00\x00\x80" not in frame[7:11]

    # jsonschema: a JSON number does not validate as type string
    from connect_spark.functions.jsonschema import json_schema_validate

    jdf = spark.createDataFrame(
        [('{"name": 42}',), ('{"name": "ok"}',)], ["payload"]
    )
    out = json_schema_validate(
        jdf, "payload", {"properties": {"name": {"type": "string"}}}
    ).collect()
    errs = {r.payload: r._error for r in out}
    assert errs['{"name": 42}'] is not None
    assert errs['{"name": "ok"}'] is None

    # cache.set dedupes duplicate keys within a batch
    from pyspark.sql import Row

    from connect_spark.state.cache import ParquetKVCache
    import tempfile

    cache = ParquetKVCache(spark, tempfile.mkdtemp() + "/kv", key="k")
    cache.set(spark.createDataFrame([Row(k=1, v="a"), Row(k=1, v="b")]))
    assert cache.read().count() == 1

    # empty vector store: search returns empty, not AttributeError
    from connect_spark.sinks.search import VectorSink

    vs = VectorSink(spark, tempfile.mkdtemp() + "/vs")
    assert vs.search([0.1, 0.2]).count() == 0
