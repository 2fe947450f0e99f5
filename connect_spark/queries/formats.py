"""Format-processor queries: XML parse roundtrip (native from_xml /
xpath — Spark 4), JSON-schema validation with the error model. Oracles
compute the expected fields from the base columns directly, so the
compare checks the parse logic against ground truth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.functions.jsonschema import json_schema_validate
from connect_spark.queries import QuerySpec


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`xml` processor + parse_xml method (internal/impl/xml/
    {processor,bloblang}.go): build an XML doc per event, parse it back
    with native from_xml and xpath — output must equal the source
    fields (the oracle computes them directly)."""
    ev = load_table(spark, sf_dir, "events")
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
    out of range carry `_error` instead of being dropped."""
    ev = load_table(spark, sf_dir, "events")
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


QUERIES = [
    QuerySpec("xml_roundtrip", xml_roundtrip, XML_SQL),
    QuerySpec("json_schema_events", json_schema_events, JSON_SCHEMA_SQL),
]
