"""Pure-Python Avro codec: spec golden bytes, roundtrip coverage of
every supported type, UDF integration, and registry-framed decode
error paths (internal/impl/avro/processor.go,
internal/impl/confluent/processor_schema_registry_decode.go)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.functions.avro_codec import (
    avro_decode,
    avro_encode_udf,
    decode,
    encode,
)
from connect_spark.functions.schema_registry import (
    RegistrySchema,
    encode_confluent_frame,
    schema_registry_decode,
)


def test_avro_spec_golden_bytes():
    # Avro 1.11 spec examples
    assert encode(0, "long") == b"\x00"
    assert encode(-1, "long") == b"\x01"
    assert encode(1, "long") == b"\x02"
    assert encode(-64, "long") == b"\x7f"
    assert encode(64, "long") == b"\x80\x01"
    assert encode("foo", "string") == b"\x06foo"
    rec = {
        "type": "record",
        "name": "test",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    assert encode({"a": 27, "b": "foo"}, rec) == b"\x36\x06foo"
    # spec array example: [3, 27] -> 04 06 36 00
    arr = {"type": "array", "items": "long"}
    assert encode([3, 27], arr) == b"\x04\x06\x36\x00"


def test_avro_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "full",
        "fields": [
            {"name": "n", "type": "null"},
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "long", "string"]},
            {"name": "arr", "type": {"type": "array", "items": "double"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["RED", "GREEN"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "FX", "size": 3}},
            {"name": "nested", "type": {
                "type": "record", "name": "inner",
                "fields": [{"name": "x", "type": "long"}]}},
        ],
    }
    v = {
        "n": None, "b": True, "i": -123, "l": 1 << 40, "f": 0.5,
        "d": -2.25, "s": "héllo", "u": "mixed", "arr": [1.5, -0.25],
        "m": {"a": 1, "b": -2}, "e": "GREEN", "fx": "xyz",
        "nested": {"x": 7},
    }
    assert decode(encode(v, schema), schema) == v
    # union branch switching
    for u in (None, 42, "s"):
        v2 = dict(v, u=u)
        assert decode(encode(v2, schema), schema) == v2


def test_avro_udf_roundtrip(spark):
    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "name", "type": ["null", "string"]}],
    })
    df = spark.createDataFrame([Row(id=1, name="a"), Row(id=2, name=None)])
    as_json = F.to_json(F.struct("id", "name"))
    binary = avro_encode_udf(schema)(as_json)
    typed = avro_decode(binary, schema, "id BIGINT, name STRING")
    got = (
        df.select(typed["id"].alias("id"), typed["name"].alias("name"))
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.name) for r in got] == [(1, "a"), (2, None)]


def test_schema_registry_avro_and_errors(spark):
    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    })
    df = spark.createDataFrame([Row(id=5)])
    framed_ok = encode_confluent_frame(
        avro_encode_udf(schema)(F.to_json(F.struct("id"))), schema_id=3
    )
    framed_unknown = encode_confluent_frame(
        avro_encode_udf(schema)(F.to_json(F.struct("id"))), schema_id=99
    )
    reg = {3: RegistrySchema("avro", "id BIGINT", schema)}

    ok = schema_registry_decode(df.withColumn("_f", framed_ok), "_f", reg)
    row = ok.collect()[0]
    assert row.schema_id == 3
    assert json.loads(row.decoded) == {"id": 5}
    assert row._error is None

    bad = schema_registry_decode(df.withColumn("_f", framed_unknown), "_f", reg)
    row = bad.collect()[0]
    assert row._error is not None and "unknown schema id" in row._error


def test_message_index_bytes_roundtrip():
    """Confluent protobuf message-index prefix (serde_protobuf.go:
    299-345): single-0 shortcut, flat index, nested path — zigzag
    varints both ways."""
    from connect_spark.functions.schema_registry import (
        message_index_bytes,
        read_message_indexes,
    )

    assert message_index_bytes([0]) == b"\x00"
    for idx in ([0], [1], [3], [1, 2], [2, 0, 5], [70, 130]):
        raw = message_index_bytes(idx) + b"\xffpayload"
        got, consumed = read_message_indexes(raw)
        assert got == idx
        assert raw[consumed:] == b"\xffpayload"


def test_schema_registry_protobuf_nested_message(spark):
    """A payload whose message-index path selects a NESTED message
    definition ([1, 0] = second top-level message's first nested)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from connect_spark.functions.schema_registry import (
        RegistrySchema,
        confluent_protobuf_encode_udf,
        encode_confluent_frame,
        schema_registry_decode,
    )

    inner = {"fields": {1: {"name": "n", "type": "int64"},
                        2: {"name": "tag", "type": "string"}}}
    outer = {"fields": {1: {"name": "x", "type": "int64"}},
             "nested": [inner]}
    first = {"fields": {1: {"name": "y", "type": "int64"}}}
    msgs = (first, outer)

    df = spark.createDataFrame([Row(j='{"n": 42, "tag": "deep"}')])
    framed = encode_confluent_frame(
        confluent_protobuf_encode_udf(msgs, [1, 0])(F.col("j")), 9)
    out = schema_registry_decode(
        df.withColumn("_f", framed), "_f",
        {9: RegistrySchema("protobuf", "n BIGINT, tag STRING",
                           proto_messages=msgs)},
    )
    r = out.select(
        F.from_json("decoded", "n BIGINT, tag STRING").alias("d"),
        "schema_id",
    ).first()
    assert r.schema_id == 9
    assert r.d.n == 42 and r.d.tag == "deep"
