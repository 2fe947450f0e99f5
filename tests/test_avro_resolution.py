"""Avro schema resolution (functions/avro_codec.py::decode_resolved):
the published 'Schema Resolution' rules — defaults, skipped fields,
aliases, promotions, unions, enums — plus the schema-registry reader-
schema integration."""
from __future__ import annotations

import json

import pytest

from connect_spark.functions.avro_codec import (
    decode_resolved,
    encode,
    resolve_names,
)


def _rec(fields, name="R"):
    return {"type": "record", "name": name, "fields": fields}


def _enc(value, schema):
    return encode(value, resolve_names(json.loads(json.dumps(schema))))


def test_reader_default_for_missing_field():
    w = _rec([{"name": "a", "type": "int"}])
    r = _rec([{"name": "a", "type": "int"},
              {"name": "b", "type": "string", "default": "dflt"}])
    got = decode_resolved(_enc({"a": 7}, w), w, r)
    assert got == {"a": 7, "b": "dflt"}


def test_missing_field_without_default_raises():
    w = _rec([{"name": "a", "type": "int"}])
    r = _rec([{"name": "a", "type": "int"},
              {"name": "b", "type": "string"}])
    with pytest.raises(ValueError, match="no default"):
        decode_resolved(_enc({"a": 1}, w), w, r)


def test_writer_only_field_skipped():
    w = _rec([
        {"name": "a", "type": "int"},
        {"name": "junk", "type": {"type": "array", "items": "string"}},
        {"name": "c", "type": "string"},
    ])
    r = _rec([{"name": "c", "type": "string"},
              {"name": "a", "type": "int"}])
    got = decode_resolved(
        _enc({"a": 5, "junk": ["x", "y"], "c": "keep"}, w), w, r)
    assert got == {"c": "keep", "a": 5}


def test_field_rename_via_reader_alias():
    w = _rec([{"name": "old_name", "type": "long"}])
    r = _rec([{"name": "new_name", "type": "long",
               "aliases": ["old_name"]}])
    got = decode_resolved(_enc({"old_name": 42}, w), w, r)
    assert got == {"new_name": 42}


@pytest.mark.parametrize("wt,rt,val,expect", [
    ("int", "long", 5, 5),
    ("int", "double", 5, 5.0),
    ("long", "float", 3, 3.0),
    ("float", "double", 1.5, 1.5),
])
def test_numeric_promotions(wt, rt, val, expect):
    w = _rec([{"name": "x", "type": wt}])
    r = _rec([{"name": "x", "type": rt}])
    got = decode_resolved(_enc({"x": val}, w), w, r)
    assert got == {"x": expect}
    assert type(got["x"]) is type(expect)


def test_union_writer_branch_resolves_against_reader_union():
    w = _rec([{"name": "v", "type": ["null", "int"]}])
    r = _rec([{"name": "v", "type": ["null", "long"]}])
    assert decode_resolved(_enc({"v": 9}, w), w, r) == {"v": 9}
    assert decode_resolved(_enc({"v": None}, w), w, r) == {"v": None}


def test_writer_nonunion_to_reader_union():
    w = _rec([{"name": "v", "type": "int"}])
    r = _rec([{"name": "v", "type": ["null", "long"]}])
    assert decode_resolved(_enc({"v": 3}, w), w, r) == {"v": 3}


def test_incompatible_types_raise():
    w = _rec([{"name": "v", "type": "string"}])
    r = _rec([{"name": "v", "type": "int"}])
    with pytest.raises(ValueError, match="cannot resolve"):
        decode_resolved(_enc({"v": "x"}, w), w, r)


def test_enum_symbol_resolution_and_default():
    we = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
    re_known = {"type": "enum", "name": "E", "symbols": ["A", "B"]}
    re_dflt = {"type": "enum", "name": "E", "symbols": ["A"],
               "default": "A"}
    w = _rec([{"name": "e", "type": we}])
    assert decode_resolved(
        _enc({"e": "B"}, w), w,
        _rec([{"name": "e", "type": re_known}])) == {"e": "B"}
    assert decode_resolved(
        _enc({"e": "C"}, w), w,
        _rec([{"name": "e", "type": re_dflt}])) == {"e": "A"}
    with pytest.raises(ValueError, match="enum symbol"):
        decode_resolved(
            _enc({"e": "C"}, w), w,
            _rec([{"name": "e", "type": re_known}]))


def test_nested_record_and_array_resolution():
    inner_w = _rec([{"name": "x", "type": "int"}], name="Inner")
    inner_r = _rec([{"name": "x", "type": "long"},
                    {"name": "y", "type": "int", "default": -1}],
                   name="Inner")
    w = _rec([{"name": "items",
               "type": {"type": "array", "items": inner_w}}])
    r = _rec([{"name": "items",
               "type": {"type": "array", "items": inner_r}}])
    got = decode_resolved(
        _enc({"items": [{"x": 1}, {"x": 2}]}, w), w, r)
    assert got == {"items": [{"x": 1, "y": -1}, {"x": 2, "y": -1}]}


def test_schema_registry_reader_schema_evolution(spark):
    """A consumer pinning a reader schema sees evolved fields with
    defaults even for payloads produced under the old schema."""
    from connect_spark.functions.schema_registry import (
        RegistrySchema,
        encode_confluent_frame,
        schema_registry_decode,
    )
    from pyspark.sql import functions as F

    writer = json.dumps(_rec([{"name": "n", "type": "long"}]))
    reader = json.dumps(_rec([
        {"name": "n", "type": "long"},
        {"name": "tag", "type": "string", "default": "legacy"},
    ]))
    from connect_spark.functions.avro_codec import avro_encode_udf

    df = spark.range(5).select(
        F.to_json(F.struct(F.col("id").alias("n"))).alias("j"))
    framed = df.select(encode_confluent_frame(
        avro_encode_udf(writer)(F.col("j")), 9).alias("msg"))
    out = schema_registry_decode(
        framed, "msg",
        {9: RegistrySchema("avro", "n bigint, tag string",
                           avro_schema=writer,
                           reader_schema=reader)},
    )
    rows = out.select(
        F.get_json_object("decoded", "$.n").alias("n"),
        F.get_json_object("decoded", "$.tag").alias("tag"),
    ).collect()
    assert sorted(int(r["n"]) for r in rows) == [0, 1, 2, 3, 4]
    assert all(r["tag"] == "legacy" for r in rows)
