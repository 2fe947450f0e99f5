"""Format-processor queries: XML parse roundtrip (native from_xml /
xpath — Spark 4), JSON-schema validation with the error model. Oracles
compute the expected fields from the base columns directly, so the
compare checks the parse logic against ground truth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import fanout_scan, load_table
from connect_spark.functions.jsonschema import json_schema_validate
from connect_spark.queries import QuerySpec


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`xml` processor + parse_xml method (internal/impl/xml/
    {processor,bloblang}.go): build an XML doc per event, parse it back
    with native from_xml and xpath — output must equal the source
    fields (the oracle computes them directly)."""
    # two XML parses per row are the heavy stage; the local events
    # scan is 3 splits (opt guide §2.5)
    ev = fanout_scan(
        spark, load_table(spark, sf_dir, "events"), sf_dir, "events")
    xml = F.concat(
        F.lit("<event><type>"),
        F.col("event_type"),
        F.lit("</type><user>"),
        F.col("user_id"),
        F.lit("</user><k>"),
        F.get_json_object("props", "$.k"),
        F.lit("</k></event>"),
    )
    parsed = F.from_xml(xml, "type STRING, user BIGINT, k INT")
    return ev.select(
        "event_id",
        parsed["type"].alias("xml_type"),
        parsed["user"].alias("xml_user"),
        parsed["k"].alias("xml_k"),
        F.xpath_string(xml, F.lit("/event/type")).alias("xpath_type"),
    )


XML_SQL = """
SELECT event_id,
       event_type AS xml_type,
       user_id AS xml_user,
       CAST(json_extract_string(props, '$.k') AS INT) AS xml_k,
       event_type AS xpath_type
FROM events
"""


_EVENT_SCHEMA = {
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 85}},
}


def json_schema_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`json_schema` processor: validate props against a schema; rows
    out of range carry `_error` instead of being dropped.  The
    validation chain is several get_json_object parses per row of
    narrow algebra above an unsplittable scan — spread it (opt guide
    §2.5; measured 3.0s -> 0.9s at sf0.1, no-op once the scan splits
    on its own)."""
    from connect_spark.catalog import fanout_scan

    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select("event_id", "props"),
        sf_dir, "events")
    out = json_schema_validate(ev, "props", _EVENT_SCHEMA)
    return out.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.col("_error").alias("error"),
    )


JSON_SCHEMA_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CASE
         WHEN props IS NULL OR json_valid(props) = false THEN 'invalid json'
         WHEN json_extract_string(props, '$.k') IS NULL
           THEN 'missing required property k'
         WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NULL
           THEN 'k: not a number'
         WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
              != floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
           THEN 'k: not an integer'
         WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) < 0
           THEN 'k: below minimum'
         WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) > 85
           THEN 'k: above maximum'
       END AS error
FROM events
"""


# --- Avro (pure-Python codec; internal/impl/avro/processor.go) ---

_AVRO_SCHEMA = """
{"type": "record", "name": "Event", "fields": [
  {"name": "event_id", "type": "long"},
  {"name": "event_type", "type": ["null", "string"]},
  {"name": "value", "type": "double"},
  {"name": "k", "type": ["null", "long"]}
]}
"""

_AVRO_DDL = "event_id BIGINT, event_type STRING, value DOUBLE, k BIGINT"


def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`avro` processor from_json→binary→to_json roundtrip
    (internal/impl/avro/processor.go): shape each event as a record
    (with nullable-union fields), encode to Avro binary, decode back,
    and emit the decoded fields — the oracle supplies the expected
    values straight from the base table, so a codec bug on any field
    (varint, union branch, IEEE double) breaks the hash."""
    from connect_spark.functions.avro_codec import avro_decode, avro_encode_udf

    # the Avro encode/decode UDF pair is Python CPU per row above an
    # unsplittable scan — spread it (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value", "props"),
        sf_dir, "events")
    as_json = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    enc = avro_encode_udf(_AVRO_SCHEMA)
    binary = enc(as_json)
    decoded = avro_decode(binary, _AVRO_SCHEMA, _AVRO_DDL)
    return ev.select(
        "event_id",
        decoded["event_type"].alias("avro_type"),
        decoded["value"].alias("avro_value"),
        decoded["k"].alias("avro_k"),
    )


AVRO_SQL = """
SELECT event_id,
       event_type AS avro_type,
       value AS avro_value,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS avro_k
FROM events
"""


def schema_registry_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent-framed Avro decode
    (internal/impl/confluent/processor_schema_registry_decode.go):
    frame each Avro payload with magic 0x00 + schema id 7, decode via
    a registry carrying an Avro entry, emit typed fields."""
    from connect_spark.functions.avro_codec import avro_encode_udf
    from connect_spark.functions.schema_registry import (
        RegistrySchema,
        encode_confluent_frame,
        schema_registry_decode,
    )

    # Avro encode + registry decode are Python CPU per row above an
    # unsplittable scan — spread it (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"),
        sf_dir, "events")
    as_json = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.lit(None).cast("long").alias("k"),
        )
    )
    framed = encode_confluent_frame(
        avro_encode_udf(_AVRO_SCHEMA)(as_json), schema_id=7
    )
    df = ev.withColumn("_framed", framed)
    out = schema_registry_decode(
        df,
        "_framed",
        {7: RegistrySchema("avro", _AVRO_DDL, _AVRO_SCHEMA)},
    )
    decoded = F.from_json(F.col("decoded"), _AVRO_DDL)
    return out.select(
        "event_id",
        F.col("schema_id"),
        decoded["event_type"].alias("sr_type"),
        decoded["value"].alias("sr_value"),
    )


SR_AVRO_SQL = """
SELECT event_id,
       7 AS schema_id,
       event_type AS sr_type,
       value AS sr_value
FROM events
"""


_AVRO_READER_V2 = """
{"type": "record", "name": "Event", "fields": [
  {"name": "event_id", "type": "long"},
  {"name": "kind", "type": ["null", "string"],
   "aliases": ["event_type"], "default": null},
  {"name": "value", "type": "double"},
  {"name": "source", "type": "string", "default": "unknown"}
]}
"""


def schema_registry_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (the Avro spec's Schema Resolution,
    functions/avro_codec.py::decode_resolved): payloads produced under
    the v1 writer schema decode through a pinned v2 READER schema —
    a renamed field resolved via alias (event_type→kind), a brand-new
    field taking its default ('unknown'), and the writer-only field k
    skipped.  The oracle supplies the expected evolved shape straight
    from the base table, so a wrong skip, default, alias, or
    promotion breaks the hash."""
    from connect_spark.functions.avro_codec import avro_encode_udf
    from connect_spark.functions.schema_registry import (
        RegistrySchema,
        encode_confluent_frame,
        schema_registry_decode,
    )

    # same per-row Python codec shape as schema_registry_avro —
    # spread the unsplittable scan (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"),
        sf_dir, "events")
    as_json = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.lit(None).cast("long").alias("k"),
        )
    )
    framed = encode_confluent_frame(
        avro_encode_udf(_AVRO_SCHEMA)(as_json), schema_id=8
    )
    df = ev.withColumn("_framed", framed)
    ddl = "event_id BIGINT, kind STRING, value DOUBLE, source STRING"
    out = schema_registry_decode(
        df,
        "_framed",
        {8: RegistrySchema("avro", ddl, _AVRO_SCHEMA,
                           reader_schema=_AVRO_READER_V2)},
    )
    decoded = F.from_json(F.col("decoded"), ddl)
    return out.select(
        "event_id",
        decoded["kind"].alias("kind"),
        decoded["source"].alias("source"),
        decoded["value"].alias("sr_value"),
    )


SR_EVOLUTION_SQL = """
SELECT event_id,
       event_type AS kind,
       'unknown' AS source,
       value AS sr_value
FROM events
"""


# --- Protobuf (descriptor-based pure-Python codec) ---

_PB_DESC = {
    "fields": {
        1: {"name": "event_id", "type": "int64"},
        2: {"name": "event_type", "type": "string"},
        3: {"name": "value", "type": "double"},
        4: {"name": "user", "type": "message", "message": {
            "fields": {1: {"name": "user_id", "type": "sint64"}},
        }},
    }
}


def protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`protobuf` processor from_json→wire→to_json roundtrip
    (internal/impl/protobuf/processor_protobuf.go): varint, double,
    length-delimited string, nested message, and sint zigzag all on
    the wire; the oracle supplies expected values from the base table
    so any wire-format bug breaks the hash."""
    from connect_spark.functions.protobuf_codec import (
        protobuf_decode,
        protobuf_encode_udf,
    )

    # protobuf wire encode/decode is Python CPU per row above an
    # unsplittable scan — spread it (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value", "user_id"),
        sf_dir, "events")
    as_json = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.struct(F.col("user_id")).alias("user"),
        )
    )
    binary = protobuf_encode_udf(_PB_DESC)(as_json)
    decoded = protobuf_decode(
        binary,
        _PB_DESC,
        "event_id BIGINT, event_type STRING, value DOUBLE, "
        "user STRUCT<user_id: BIGINT>",
    )
    return ev.select(
        "event_id",
        decoded["event_type"].alias("pb_type"),
        decoded["value"].alias("pb_value"),
        decoded["user"]["user_id"].alias("pb_user"),
    )


PB_SQL = """
SELECT event_id,
       event_type AS pb_type,
       value AS pb_value,
       user_id AS pb_user
FROM events
"""


def schema_registry_protobuf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent-framed PROTOBUF decode (round-4 verdict task #5;
    internal/impl/confluent/serde_protobuf.go:98,299-345): payloads
    carry the zigzag-varint message-index prefix selecting the target
    message within the schema file, then the protobuf wire bytes.
    Even event_ids frame as schema 7 / first message (the single-0x00
    shortcut); odd ids frame as schema 8 / second message (explicit
    index array) with a different field layout — so dispatch, both
    index encodings, and the wire decode are all under the hash."""
    from connect_spark.functions.schema_registry import (
        RegistrySchema,
        confluent_protobuf_encode_udf,
        encode_confluent_frame,
        schema_registry_decode,
    )

    msg_a = {"fields": {
        1: {"name": "event_id", "type": "int64"},
        2: {"name": "event_type", "type": "string"},
        3: {"name": "value", "type": "double"},
    }}
    msg_b = {"fields": {
        1: {"name": "event_id", "type": "int64"},
        2: {"name": "label", "type": "string"},
    }}
    msgs = (msg_a, msg_b)
    ddl_a = "event_id BIGINT, event_type STRING, value DOUBLE"
    ddl_b = "event_id BIGINT, label STRING"

    # two protobuf encode UDFs + registry decode per row above an
    # unsplittable scan — spread it (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"),
        sf_dir, "events")
    json_a = F.to_json(F.struct(
        F.col("event_id"), F.col("event_type"), F.col("value")))
    json_b = F.to_json(F.struct(
        F.col("event_id"),
        F.concat(F.lit("L-"), F.col("event_type")).alias("label")))
    framed = F.when(
        F.col("event_id") % 2 == 0,
        encode_confluent_frame(
            confluent_protobuf_encode_udf(msgs, [0])(json_a), 7),
    ).otherwise(
        encode_confluent_frame(
            confluent_protobuf_encode_udf(msgs, [1])(json_b), 8),
    )
    df = ev.withColumn("_framed", framed)
    out = schema_registry_decode(df, "_framed", {
        7: RegistrySchema("protobuf", ddl_a, proto_messages=msgs),
        8: RegistrySchema("protobuf", ddl_b, proto_messages=msgs),
    })
    return out.select(
        "event_id",
        "schema_id",
        F.coalesce(
            F.from_json("decoded", ddl_a)["event_type"],
            F.from_json("decoded", ddl_b)["label"],
        ).alias("sr_field"),
        F.from_json("decoded", ddl_a)["value"].alias("sr_value"),
    )


SR_PB_SQL = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN 7 ELSE 8 END AS schema_id,
       CASE WHEN event_id % 2 = 0 THEN event_type
            ELSE 'L-' || event_type END AS sr_field,
       CASE WHEN event_id % 2 = 0 THEN value ELSE NULL END AS sr_value
FROM events
"""


def msgpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`msgpack` processor roundtrip (internal/impl/msgpack/
    processor.go): map/str/int/float/nil through the binary format and
    back; oracle = base-table ground truth."""
    from connect_spark.functions.msgpack_codec import (
        msgpack_decode,
        msgpack_encode_udf,
    )

    # msgpack encode/decode is Python CPU per row above an
    # unsplittable scan — spread it (opt guide §2.5/§4)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value", "props"),
        sf_dir, "events")
    as_json = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    binary = msgpack_encode_udf()(as_json)
    decoded = msgpack_decode(
        binary, "event_id BIGINT, event_type STRING, value DOUBLE, k BIGINT"
    )
    return ev.select(
        "event_id",
        decoded["event_type"].alias("mp_type"),
        decoded["value"].alias("mp_value"),
        decoded["k"].alias("mp_k"),
    )


MSGPACK_SQL = """
SELECT event_id,
       event_type AS mp_type,
       value AS mp_value,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS mp_k
FROM events
"""


def archive_tar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """archive format=tar → unarchive roundtrip (archive.adoc:46-58,
    operators/archive_formats.py): documents fold into per-group tar
    blobs (path = doc_id, deterministic headers) and explode back; the
    oracle fingerprints the ORIGINAL text, so any corruption anywhere
    in pack → blob → unpack breaks the value hash."""
    from connect_spark.operators.archive_formats import (
        archive_format,
        unarchive_format,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 20).alias("grp")
    )
    arch = archive_format(
        docs,
        "tar",
        group_by=["grp"],
        content=F.encode("text", "UTF-8"),
        path=F.col("doc_id").cast("string"),
    )
    back = unarchive_format(arch, "tar")
    return back.select(
        F.col("part_path").cast("bigint").alias("doc_id"),
        F.md5("part").alias("fp"),
        F.length("part").alias("n_bytes"),
    )


ARCHIVE_TAR_SQL = """
SELECT doc_id,
       md5(text) AS fp,
       CAST(strlen(text) AS INT) AS n_bytes
FROM documents
"""


QUERIES = [
    QuerySpec("archive_tar_roundtrip", archive_tar_roundtrip, ARCHIVE_TAR_SQL),
    QuerySpec("xml_roundtrip", xml_roundtrip, XML_SQL),
    QuerySpec("json_schema_events", json_schema_events, JSON_SCHEMA_SQL),
    QuerySpec("avro_roundtrip", avro_roundtrip, AVRO_SQL),
    QuerySpec("schema_registry_avro", schema_registry_avro, SR_AVRO_SQL),
    QuerySpec("schema_registry_evolution", schema_registry_evolution,
              SR_EVOLUTION_SQL),
    QuerySpec("schema_registry_protobuf", schema_registry_protobuf,
              SR_PB_SQL),
    QuerySpec("protobuf_roundtrip", protobuf_roundtrip, PB_SQL),
    QuerySpec("msgpack_roundtrip", msgpack_roundtrip, MSGPACK_SQL),
]
