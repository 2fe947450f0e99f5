"""Driver-gated rows for the extension engines (awk, jq, geoip): each
engine's output is checked against a DuckDB oracle computing the same
answer from the base columns — so a bug anywhere in the interpreter /
reader pipeline breaks the value hash, not just a unit test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def jq_project_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jq processor over the props JSON: object construction + path +
    comparison ('{k: .k, big: (.k >= 50)}'); jq null-comparison
    semantics (null < numbers) are mirrored with coalesce in SQL."""
    from connect_spark.functions.jq import jq_udf

    ev = load_table(spark, sf_dir, "events")
    out = jq_udf('{k: .k, big: (.k >= 50)}')(F.col("props"))
    decoded = F.from_json(F.element_at(out, 1), "big BOOLEAN, k BIGINT")
    return ev.select(
        "event_id",
        decoded["k"].alias("k"),
        decoded["big"].alias("big"),
    )


JQ_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 IS NULL THEN false
            ELSE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
       END AS big
FROM events
"""


def awk_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """awk processor over synthesized log lines: field access,
    arithmetic, pattern filter, printf formatting."""
    from connect_spark.operators.awk import awk_udf

    ev = load_table(spark, sf_dir, "events")
    line = F.concat_ws(
        " ", F.col("event_type"), F.col("user_id").cast("string"),
        F.col("event_id").cast("string"),
    )
    prog = '/^(purchase|error)/ { printf "%s:%d", $1, $2 * 2 }'
    return ev.select(
        "event_id",
        awk_udf(prog)(line).alias("awk_out"),
    )


AWK_SQL = """
SELECT event_id,
       CASE WHEN event_type IN ('purchase', 'error')
            THEN event_type || ':' || CAST(user_id * 2 AS VARCHAR)
            ELSE '' END AS awk_out
FROM events
"""


def geoip_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geoip over a deterministic in-query MaxMind DB: users map to
    10.x.0.1 addresses; /9 networks split US/DE, 192.168/16 is GB for
    every 7th user. The oracle recomputes the same routing from
    user_id arithmetic — gating tree walk + data-section decode."""
    from connect_spark.functions.geoip import MmdbWriter, geoip_country

    w = MmdbWriter()
    w.insert("10.0.0.0/9", {"country": {"iso_code": "US"}})
    w.insert("10.128.0.0/9", {"country": {"iso_code": "DE"}})
    w.insert("192.168.0.0/16", {"country": {"iso_code": "GB"}})
    mmdb = w.tobytes()

    ev = load_table(spark, sf_dir, "events")
    ip = F.when(
        F.col("user_id") % 7 == 0,
        F.concat(F.lit("192.168."), (F.col("user_id") % 256).cast("string"),
                 F.lit(".1")),
    ).otherwise(
        F.concat(F.lit("10."), (F.col("user_id") % 256).cast("string"),
                 F.lit(".0.1"))
    )
    return ev.select(
        "event_id",
        ip.alias("ip"),
        geoip_country(ip, mmdb).alias("country"),
    )


GEOIP_SQL = """
SELECT event_id,
       CASE WHEN user_id % 7 = 0
            THEN '192.168.' || CAST(user_id % 256 AS VARCHAR) || '.1'
            ELSE '10.' || CAST(user_id % 256 AS VARCHAR) || '.0.1'
       END AS ip,
       CASE WHEN user_id % 7 = 0 THEN 'GB'
            WHEN user_id % 256 < 128 THEN 'US'
            ELSE 'DE'
       END AS country
FROM events
"""


def js_transform_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """javascript processor over event JSON: structured read, string
    methods, arithmetic with JS coercion, conditional logic — the
    oracle recomputes the same answer from the base columns."""
    from connect_spark.operators.javascript import javascript_udf

    ev = load_table(spark, sf_dir, "events")
    as_json = F.to_json(
        F.struct("event_id", "event_type", "user_id", "value")
    )
    code = """
    var doc = benthos.v0_msg_as_structured();
    doc.tag = doc.event_type.toUpperCase() + "-" + (doc.user_id % 100);
    doc.double_value = doc.value * 2;
    doc.tier = doc.value >= 50 ? "high" : "low";
    benthos.v0_msg_set_structured(doc);
    """
    out = javascript_udf(code)(as_json)
    decoded = F.from_json(
        out,
        "event_id BIGINT, tag STRING, double_value DOUBLE, tier STRING",
    )
    return ev.select(
        "event_id",
        decoded["tag"].alias("tag"),
        decoded["double_value"].alias("double_value"),
        decoded["tier"].alias("tier"),
    )


JS_SQL = """
SELECT event_id,
       upper(event_type) || '-' || CAST(user_id % 100 AS VARCHAR) AS tag,
       value * 2 AS double_value,
       CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS tier
FROM events
"""


def bloblang_eval_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `bloblang` method (methods.adoc:3321): the mapping SOURCE
    varies per message — here chosen by event_type, the dynamic-
    dispatch pattern static mappings can't express. Compiled
    executor-side with a per-source cache (bloblang/pyeval.py)."""
    from connect_spark.bloblang.methods import METHODS

    ev = load_table(spark, sf_dir, "events")
    mapping_src = (
        F.when(
            F.col("event_type") == "purchase",
            F.lit("root.out = this.value * 2"),
        )
        .when(
            F.col("event_type") == "click",
            F.lit("root.out = this.value + 10"),
        )
        .otherwise(F.lit("root.out = 0 - this.value"))
    )
    payload = F.to_json(F.struct("value"))
    result = METHODS["bloblang"](payload, mapping_src)
    return ev.select(
        "event_id",
        F.get_json_object(result, "$.out").cast("double").alias("out"),
    )


BLOBLANG_EVAL_SQL = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN value * 2
            WHEN event_type = 'click' THEN value + 10
            ELSE 0 - value
       END AS out
FROM events
"""


QUERIES = [
    QuerySpec("jq_project_events", jq_project_events, JQ_SQL),
    QuerySpec(
        "bloblang_eval_dynamic", bloblang_eval_dynamic, BLOBLANG_EVAL_SQL
    ),
    QuerySpec("awk_extract_events", awk_extract_events, AWK_SQL),
    QuerySpec("geoip_enrich_events", geoip_enrich_events, GEOIP_SQL),
    QuerySpec("js_transform_events", js_transform_events, JS_SQL),
]
