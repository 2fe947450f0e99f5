"""Core-processor queries (SURVEY.md §2.A) with DuckDB oracles.

Each query exercises one core processor semantic from the reference on
the driver's test tables, expressed Spark-first (pure Column algebra —
no UDFs anywhere in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.errors import flag_error
from connect_spark.operators.core import (
    archive_concat,
    archive_json_array,
    bounds_check,
    dedupe,
    group_by_value,
    mapping,
    mutation,
    select_parts,
    switch,
    unarchive,
)
from connect_spark.queries import QuerySpec


# --- q1_pricing_summary: mapping + group_by_value reduce (TPC-H Q1 shape) ---

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship batch aggregation: `mapping` computes revenue per row,
    `group_by_value`-style reduce aggregates per (returnflag, linestatus)
    — the reference's batch-reduce pattern (system_window.adoc:108-123)
    generalized. Filter pushes down to the parquet scan; partial
    aggregation combines map-side, so one shuffle of tiny partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- mapping_project: new-document projection + deleted() filter ---

def mapping_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapping` (mapping.adoc:26): fresh document with computed fields;
    rows assigned `deleted()` drop (bloblang/about.adoc:355-363) — here
    the l_quantity < 5 rows. Narrow projection, filter pushed to scan."""
    li = load_table(spark, sf_dir, "lineitem")
    kept = li.filter(F.col("l_quantity") >= 5)  # deleted() on the rest
    # Per-row arithmetic stays UNROUNDED: both engines produce the same
    # IEEE double for a*b, so the hash matches exactly; rounding money
    # products would land on .xx5 midpoints where engines disagree.
    out = mapping(
        kept,
        order_id=F.col("l_orderkey"),
        line_no=F.col("l_linenumber"),
        revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")),
        tax_amount=F.col("l_extendedprice") * F.col("l_tax"),
        status=F.upper(F.concat_ws("-", "l_returnflag", "l_linestatus")),
    )
    return out.where(F.col("revenue") > 0)


MAPPING_SQL = """
SELECT l_orderkey AS order_id,
       l_linenumber AS line_no,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * l_tax AS tax_amount,
       upper(l_returnflag || '-' || l_linestatus) AS status
FROM lineitem
WHERE l_quantity >= 5
  AND l_extendedprice * (1 - l_discount) > 0
"""


# --- mutation_enrich: in-place assignment keeping existing columns ---

def mutation_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mutation` (mutation.adoc:26) + JSON field extraction (the
    `parse_json` method, methods.adoc:3577): add columns in place."""
    ev = load_table(spark, sf_dir, "events")
    out = mutation(
        ev,
        day=F.date_format("ts", "yyyy-MM-dd"),
        is_error=(F.col("event_type") == "error").cast("int"),
        k=F.get_json_object("props", "$.k").cast("int"),
    )
    return out.select(
        "event_id", "user_id", "event_type", "day", "is_error", "k"
    )


MUTATION_SQL = """
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(event_type = 'error' AS INT) AS is_error,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


# --- switch_route: first-matching-check routing ---

def switch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`switch` (switch.adoc:38-73): per-row routing compiled to one
    when/otherwise chain instead of N sub-pipelines + union."""
    ev = load_table(spark, sf_dir, "events")
    out = switch(
        ev,
        cases=[
            (F.col("event_type") == "purchase", {"route": F.lit("billing")}),
            (F.col("event_type") == "error", {"route": F.lit("ops")}),
        ],
        default={"route": F.lit("product")},
    )
    out = switch(
        out,
        cases=[
            (F.col("value") < 10, {"bucket": F.lit("low")}),
            (F.col("value") < 30, {"bucket": F.lit("mid")}),
        ],
        default={"bucket": F.lit("high")},
    )
    return out.select("event_id", "route", "bucket")


SWITCH_SQL = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN 'billing'
            WHEN event_type = 'error' THEN 'ops'
            ELSE 'product' END AS route,
       CASE WHEN value < 10 THEN 'low'
            WHEN value < 30 THEN 'mid'
            ELSE 'high' END AS bucket
FROM events
"""


# --- group_by_value_agg ---

def group_by_value_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`group_by_value` (group_by_value.adoc:26): dynamic key grouping
    with a reduce per group."""
    orders = load_table(spark, sf_dir, "orders")
    return group_by_value(
        orders,
        key=F.col("o_orderpriority"),
        aggs={
            "n_orders": F.count(F.lit(1)),
            "total": F.round(F.sum("o_totalprice"), 2),
            "avg_price": F.round(F.avg("o_totalprice"), 2),
            "n_open": F.sum((F.col("o_orderstatus") == "O").cast("bigint")),
        },
    )


GROUP_BY_VALUE_SQL = """
SELECT o_orderpriority AS group_key,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total,
       round(avg(o_totalprice), 2) AS avg_price,
       CAST(sum(CAST(o_orderstatus = 'O' AS BIGINT)) AS BIGINT) AS n_open
FROM orders
GROUP BY o_orderpriority
"""


# --- dedupe_first_per_user ---

def dedupe_first_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedupe` (dedupe.adoc:53-78): first-seen-wins per key. Arrival
    order is made explicit (ts, event_id) so the distributed result is
    deterministic — see operators/core.py::dedupe."""
    ev = load_table(spark, sf_dir, "events")
    out = dedupe(ev, ["user_id"], order_by=[F.col("ts"), F.col("event_id")])
    return out.select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_event_type"),
        F.col("ts").cast("string").alias("first_ts"),
    )


DEDUPE_SQL = """
SELECT user_id,
       event_id AS first_event_id,
       event_type AS first_event_type,
       CAST(ts AS VARCHAR) AS first_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# --- select_parts_topk ---

def select_parts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select_parts` (select_parts.adoc:26): batch-index selection →
    top-3 per event_type by value."""
    ev = load_table(spark, sf_dir, "events")
    out = select_parts(
        ev,
        n=3,
        partition_by=[F.col("event_type")],
        order_by=[F.col("value").desc(), F.col("event_id")],
    )
    return out.select("event_type", "event_id", "value")


SELECT_PARTS_SQL = """
SELECT event_type, event_id, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


# --- archive_lines / archive_json ---

def archive_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`archive` format lines/concatenate (archive.adoc:46-58): fold a
    group into one message. Sorted for distributed determinism."""
    docs = load_table(spark, sf_dir, "documents")
    out = archive_concat(
        docs,
        group_by=[F.col("lang")],
        value=F.col("doc_id").cast("string"),
        sep=",",
    )
    return out.select("lang", "archived")


ARCHIVE_LINES_SQL = """
SELECT lang,
       array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',') AS archived
FROM documents
GROUP BY lang
"""


def archive_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`archive` format json_array (archive.adoc:46-58)."""
    docs = load_table(spark, sf_dir, "documents")
    out = archive_json_array(
        docs, group_by=[F.col("source")], value=F.col("doc_id")
    )
    return out.select("source", "archived")


ARCHIVE_JSON_SQL = """
SELECT source, to_json(list_sort(list(doc_id))) AS archived
FROM documents
GROUP BY source
"""


# --- unarchive_explode: one message -> many ---

def unarchive_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`unarchive` (unarchive.adoc:26): explode documents into words and
    count global word frequency. split+explode are narrow; the count is
    a partially-aggregated shuffle keyed by word."""
    docs = load_table(spark, sf_dir, "documents")
    words = unarchive(
        docs.select("doc_id", F.split("text", " ").alias("toks")),
        F.col("toks"),
        out="word",
    )
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


UNARCHIVE_SQL = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word != ''
GROUP BY word
"""


# --- bounds_check_filter ---

def bounds_check_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bounds_check` (bounds_check.adoc:26): size-bounded rows only."""
    docs = load_table(spark, sf_dir, "documents")
    out = bounds_check(docs, F.col("text"), min_len=150, max_len=400)
    return out.select("doc_id", "lang", "n_chars")


BOUNDS_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE length(text) >= 150 AND length(text) <= 400
"""


# --- error_model: try/catch error-column convention ---

def error_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try/catch error-flag semantics (try.adoc:26, functions.adoc:504):
    rows failing a parse/validation get `_error` set instead of being
    dropped; downstream sees both streams. Pure `when` algebra."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    out = ev.withColumn("k", k)
    out = flag_error(out, F.col("k").isNull(), "k missing")
    out = flag_error(out, F.col("k") > 90, "k out of range")
    return out.select("event_id", "k", F.col("_error").alias("error"))


ERROR_MODEL_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL
              THEN 'k missing'
            WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) > 90
              THEN 'k out of range'
       END AS error
FROM events
"""


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, headline=True),
    QuerySpec("mapping_project", mapping_project, MAPPING_SQL),
    QuerySpec("mutation_enrich", mutation_enrich, MUTATION_SQL),
    QuerySpec("switch_route", switch_route, SWITCH_SQL),
    QuerySpec("group_by_value_agg", group_by_value_agg, GROUP_BY_VALUE_SQL),
    QuerySpec("dedupe_first_per_user", dedupe_first_per_user, DEDUPE_SQL, headline=True),
    QuerySpec("select_parts_topk", select_parts_topk, SELECT_PARTS_SQL),
    QuerySpec("archive_lines", archive_lines, ARCHIVE_LINES_SQL),
    QuerySpec("archive_json", archive_json, ARCHIVE_JSON_SQL),
    QuerySpec("unarchive_explode", unarchive_explode, UNARCHIVE_SQL),
    QuerySpec("bounds_check_filter", bounds_check_filter, BOUNDS_SQL),
    QuerySpec("error_model", error_model, ERROR_MODEL_SQL),
]
