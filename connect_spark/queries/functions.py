"""Bloblang scalar-surface matrices (SURVEY.md §2.G) with DuckDB
oracles — string, timestamp, number, encoding/hash, array/object
method families evaluated per-row over the test tables.

Each output column corresponds to one or more reference methods
(docs/modules/guides/pages/bloblang/methods.adoc section cites in the
comments). Everything compiles to JVM Column expressions — this whole
family is whole-stage-codegen'd, no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


# --- string methods (methods.adoc:35) ---

def fn_string_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    return docs.select(
        "doc_id",
        F.upper(head).alias("uppercased"),            # uppercase
        F.lower(head).alias("lowercased"),            # lowercase
        F.initcap(head).alias("capitalized"),         # capitalize
        F.length("text").alias("str_len"),            # length
        F.trim(head).alias("trimmed"),                # trim
        F.reverse(head).alias("reversed"),            # reverse
        F.substring("text", 5, 10).alias("sliced"),   # slice
        F.concat_ws("|", "lang", "source").alias("joined"),  # format/join
        F.col("text").startswith("key").cast("int").alias("has_prefix"),
        F.col("text").endswith("e").cast("int").alias("has_suffix"),
        F.col("text").contains("spark").cast("int").alias("contains_spark"),
        (F.instr("text", "data")).alias("index_of_data"),    # index_of
        F.regexp_replace(F.lower(head), "[^a-z0-9]+", "-").alias("slug"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),   # repeat
        F.lpad("lang", 5, "_").alias("padded"),
        F.translate(head, "aeiou", "AEIOU").alias("translated"),
        F.split(F.col("text"), " ").getItem(0).alias("first_word"),
    )


STRING_SQL = """
SELECT doc_id,
       upper(substr(text, 1, 24)) AS uppercased,
       lower(substr(text, 1, 24)) AS lowercased,
       -- DuckDB has no initcap; title-case first letter of each word
       list_aggregate(list_transform(string_split(substr(text, 1, 24), ' '),
         w -> CASE WHEN len(w) > 0
                   THEN upper(w[1]) || lower(w[2:]) ELSE w END), 'string_agg', ' ')
         AS capitalized,
       length(text) AS str_len,
       trim(substr(text, 1, 24)) AS trimmed,
       reverse(substr(text, 1, 24)) AS reversed,
       substr(text, 5, 10) AS sliced,
       lang || '|' || source AS joined,
       CAST(starts_with(text, 'key') AS INT) AS has_prefix,
       CAST(ends_with(text, 'e') AS INT) AS has_suffix,
       CAST(contains(text, 'spark') AS INT) AS contains_spark,
       strpos(text, 'data') AS index_of_data,
       regexp_replace(lower(substr(text, 1, 24)), '[^a-z0-9]+', '-', 'g') AS slug,
       repeat('ab', 3) AS repeated,
       lpad(lang, 5, '_') AS padded,
       translate(substr(text, 1, 24), 'aeiou', 'AEIOU') AS translated,
       string_split(text, ' ')[1] AS first_word
FROM documents
"""


# --- regex methods (methods.adoc:797) ---

def fn_regex_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").rlike("spark .* table").cast("int").alias("re_match"),  # re_match
        F.regexp_replace("text", "[aeiou]", "_").substr(1, 30).alias("re_replaced"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{5,}"), 0)).alias(
            "n_long_words"
        ),                                                    # re_find_all
        F.array_join(
            F.slice(F.regexp_extract_all("text", F.lit("\\b[bs][a-z]+"), 0), 1, 5),
            ",",
        ).alias("first5_bs"),
        F.regexp_extract("text", "(\\w+) (\\w+)", 2).alias("second_word"),
    )


REGEX_SQL = r"""
SELECT doc_id,
       CAST(regexp_matches(text, 'spark .* table') AS INT) AS re_match,
       substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 30) AS re_replaced,
       len(regexp_extract_all(text, '[a-z]{5,}')) AS n_long_words,
       coalesce(array_to_string(regexp_extract_all(text, '\b[bs][a-z]+')[1:5], ','), '')
         AS first5_bs,
       regexp_extract(text, '(\w+) (\w+)', 2) AS second_word
FROM documents
"""


# --- timestamp methods (methods.adoc:1581) ---

def fn_timestamp_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),                      # ts_format parts
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),               # ISO-adjusted below
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),  # ts_format
        F.unix_timestamp("ts").alias("epoch_s"),      # ts_unix
        (F.unix_micros("ts") / 1000).cast("bigint").alias("epoch_ms"),  # ts_unix_milli
        F.date_trunc("hour", "ts").cast("string").alias("hour_floor"),  # ts_round
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).cast("string").alias("plus_day"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTE")).cast("string").alias("minus_90m"),
        F.datediff(F.lit("2024-02-01"), F.col("ts")).alias("days_to_feb"),
    )


TS_SQL = """
SELECT event_id,
       year(ts) AS y,
       month(ts) AS mo,
       day(ts) AS d,
       hour(ts) AS h,
       minute(ts) AS mi,
       dayofweek(ts) + 1 AS dow,
       strftime(ts, '%Y-%m-%d %H:%M') AS formatted,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS epoch_ms,
       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_floor,
       CAST(ts + INTERVAL '1 day' AS VARCHAR) AS plus_day,
       CAST(ts - INTERVAL '90 minutes' AS VARCHAR) AS minus_90m,
       datediff('day', CAST(ts AS DATE), DATE '2024-02-01') AS days_to_feb
FROM events
"""


# --- number methods (methods.adoc:955) ---

def fn_number_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.ceil("l_quantity").alias("ceil_v"),
        F.floor("l_quantity").alias("floor_v"),
        F.round(F.col("l_extendedprice") / 7, 3).alias("round_v"),
        F.round(F.log("l_extendedprice"), 6).alias("log_v"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_v"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pow_v"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_v"),
        F.greatest("l_tax", "l_discount").alias("max_v"),
        F.least("l_tax", "l_discount").alias("min_v"),
        (F.col("l_orderkey") % 7).alias("mod_v"),
        F.col("l_partkey").bitwiseAND(F.lit(255)).alias("band_v"),
        F.col("l_partkey").bitwiseOR(F.lit(8)).alias("bor_v"),
        F.col("l_partkey").bitwiseXOR(F.lit(129)).alias("bxor_v"),
        F.col("l_quantity").cast("int").alias("as_int"),
        F.col("l_linenumber").cast("double").alias("as_float"),
    )


NUMBER_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_v,
       CAST(ceil(l_quantity) AS BIGINT) AS ceil_v,
       CAST(floor(l_quantity) AS BIGINT) AS floor_v,
       round(l_extendedprice / 7, 3) AS round_v,
       round(ln(l_extendedprice), 6) AS log_v,
       round(log10(l_extendedprice), 6) AS log10_v,
       round(pow(l_discount + 1, 3), 6) AS pow_v,
       round(sqrt(l_quantity), 6) AS sqrt_v,
       greatest(l_tax, l_discount) AS max_v,
       least(l_tax, l_discount) AS min_v,
       l_orderkey % 7 AS mod_v,
       l_partkey & 255 AS band_v,
       l_partkey | 8 AS bor_v,
       xor(l_partkey, 129) AS bxor_v,
       CAST(l_quantity AS INT) AS as_int,
       CAST(l_linenumber AS DOUBLE) AS as_float
FROM lineitem
"""


# --- encoding & crypto methods (methods.adoc:3737) ---

def fn_encoding_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 16)
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),               # hash md5
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
        F.base64(head.cast("binary")).alias("b64"),   # encode base64
        F.hex(head.cast("binary")).alias("hex_enc"),  # encode hex
    )


ENCODING_SQL = """
SELECT doc_id,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       to_base64(encode(substr(text, 1, 16))) AS b64,
       upper(hex(encode(substr(text, 1, 16)))) AS hex_enc
FROM documents
"""


# --- array/object methods (methods.adoc:2257) over tokenized text ---

def fn_array_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),                        # length
        F.size(F.array_distinct(toks)).alias("n_uniq"),      # unique
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),  # slice/join
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.element_at(toks, 3).alias("third"),                # index
        F.array_join(F.sort_array(F.array_distinct(F.slice(toks, 1, 8))), ",")
            .alias("sorted_head"),                           # sort+unique
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),  # filter
        F.array_join(
            F.transform(F.slice(toks, 1, 4), lambda t: F.upper(t)), ","
        ).alias("upper4"),                                   # map_each
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),                              # fold/sum
        F.array_max(F.transform(toks, lambda t: F.length(t))).alias("max_tok_len"),
        F.array_position(toks, "table").cast("int").alias("pos_table"),
    )


ARRAY_SQL = """
WITH t AS (SELECT *, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_toks,
       len(list_distinct(toks)) AS n_uniq,
       array_to_string(toks[1:5], ' ') AS first5,
       CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
       toks[3] AS third,
       array_to_string(list_sort(list_distinct(toks[1:8])), ',') AS sorted_head,
       len(list_filter(toks, x -> len(x) > 4)) AS n_long,
       array_to_string(list_transform(toks[1:4], x -> upper(x)), ',') AS upper4,
       CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS total_chars,
       list_max(list_transform(toks, x -> len(x))) AS max_tok_len,
       CAST(coalesce(list_position(toks, 'table'), 0) AS INT) AS pos_table
FROM t
"""


# --- map/object methods (methods.adoc:2257 keys/values/with/without) ---

def fn_map_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),                   # get
        F.size(F.map_keys(m)).alias("n_keys"),                       # length
        F.array_join(
            F.sort_array(
                F.map_values(F.map_filter(m, lambda k, v: k != "user"))
            ),
            ",",
        ).alias("without_user_vals"),                                # without
        F.to_json(
            F.map_from_arrays(F.array(F.lit("t")), F.array(F.element_at(m, "type")))
        ).alias("projected_json"),                                   # with
    )


MAP_SQL = """
WITH m AS (
  SELECT event_id,
         MAP(['type', 'user', 'k'],
             [event_type, CAST(user_id AS VARCHAR),
              json_extract_string(props, '$.k')]) AS mp,
         event_type
  FROM events
)
SELECT event_id,
       array_to_string(list_sort(map_keys(mp)), ',') AS keys_sorted,
       mp['type'][1] AS type_val,
       len(map_keys(mp)) AS n_keys,
       array_to_string(list_sort([x.value FOR x IN map_entries(mp) IF x.key != 'user']), ',')
         AS without_user_vals,
       '{"t":"' || event_type || '"}' AS projected_json
FROM m
"""


# --- uuid_v5 (methods.adoc:3931) — RFC 4122/9562 name-based UUIDs ---
#
# DuckDB 1.0 has no sha1(), so the oracle pins literals computed by an
# INDEPENDENT implementation (CPython's uuid.uuid5) over the same
# deterministic name set — same role as an RFC vector table.

def fn_uuid_v5_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from connect_spark.bloblang.methods import METHODS

    u5 = METHODS["uuid_v5"]
    df = spark.range(64).select(
        F.col("id").cast("int").alias("i"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("nm"),
    )
    return df.select(
        "i",
        u5(F.col("nm"), "dns").alias("u5_dns"),
        u5(F.col("nm"), "url").alias("u5_url"),
        u5(F.col("nm"), "oid").alias("u5_oid"),
        u5(F.col("nm"), "x500").alias("u5_x500"),
        u5(F.col("nm")).alias("u5_nil"),
        u5(F.col("nm"), "77f836b7-9f61-46c0-851e-9b6ca3535e69").alias("u5_custom"),
    )


def _uuid5_oracle_sql() -> str:
    import uuid

    ns = {
        "u5_dns": uuid.NAMESPACE_DNS,
        "u5_url": uuid.NAMESPACE_URL,
        "u5_oid": uuid.NAMESPACE_OID,
        "u5_x500": uuid.NAMESPACE_X500,
        "u5_nil": uuid.UUID(int=0),
        "u5_custom": uuid.UUID("77f836b7-9f61-46c0-851e-9b6ca3535e69"),
    }
    rows = []
    for i in range(64):
        name = f"name-{i}"
        vals = ", ".join(f"'{uuid.uuid5(u, name)}'" for u in ns.values())
        rows.append(f"({i}, {vals})")
    cols = ", ".join(ns)
    return (
        f"SELECT * FROM (VALUES {', '.join(rows)}) AS t(i, {cols})"
    )


UUID5_SQL = _uuid5_oracle_sql()


# --- parse_logfmt (methods.adoc:3602) over a logfmt line built from
# events — quoted value with a space exercises the quoting grammar; the
# oracle re-parses with DuckDB's regexp engine.

def fn_parse_logfmt_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from connect_spark.bloblang.methods import METHODS
    from connect_spark.catalog import fanout_scan

    # the logfmt parse is ~10 regex passes per row of narrow algebra
    # above an unsplittable scan — spread it (opt guide §2.5; measured
    # 5.4s -> 1.5s at sf0.1, a no-op once the scan splits on its own)
    ev = fanout_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id"),
        sf_dir, "events")
    line = F.concat(
        F.lit("type="), F.col("event_type"),
        F.lit(' msg="user '), F.col("user_id").cast("string"),
        F.lit(' event" id='), F.col("event_id").cast("string"),
    )
    m = METHODS["parse_logfmt"](line)
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("lf_type"),
        F.element_at(m, "msg").alias("lf_msg"),
        F.element_at(m, "id").alias("lf_id"),
    )


PARSE_LOGFMT_SQL = r"""
WITH src AS (
  SELECT event_id,
         'type=' || event_type || ' msg="user ' || CAST(user_id AS VARCHAR)
           || ' event" id=' || CAST(event_id AS VARCHAR) AS line
  FROM events
), tok AS (
  SELECT event_id,
         regexp_extract_all(line, '([\w.\-/@]+)=("(?:[^"\\]|\\.)*"|[^\s"]*)', 1) AS ks,
         regexp_extract_all(line, '([\w.\-/@]+)=("(?:[^"\\]|\\.)*"|[^\s"]*)', 2) AS vs
  FROM src
), unq AS (
  SELECT event_id, ks,
         list_transform(vs, v -> CASE
           WHEN v LIKE '"%' AND v LIKE '%"' AND len(v) >= 2
           THEN regexp_replace(v[2:-2], '\\(.)', '\1', 'g')
           ELSE v END) AS vs
  FROM tok
)
SELECT event_id,
       vs[list_position(ks, 'type')] AS lf_type,
       vs[list_position(ks, 'msg')] AS lf_msg,
       vs[list_position(ks, 'id')] AS lf_id
FROM unq
"""


QUERIES = [
    QuerySpec("fn_string_matrix", fn_string_matrix, STRING_SQL),
    QuerySpec("uuid_v5_vectors", fn_uuid_v5_vectors, UUID5_SQL),
    QuerySpec("parse_logfmt_events", fn_parse_logfmt_events, PARSE_LOGFMT_SQL),
    QuerySpec("fn_map_matrix", fn_map_matrix, MAP_SQL),
    QuerySpec("fn_regex_matrix", fn_regex_matrix, REGEX_SQL),
    QuerySpec("fn_timestamp_matrix", fn_timestamp_matrix, TS_SQL),
    QuerySpec("fn_number_matrix", fn_number_matrix, NUMBER_SQL),
    QuerySpec("fn_encoding_matrix", fn_encoding_matrix, ENCODING_SQL),
    QuerySpec("fn_array_matrix", fn_array_matrix, ARRAY_SQL),
]


def fn_sr_header_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """with_schema_registry_header in the gate (round-11; reference
    `internal/impl/confluent/bloblang.go:30-46`): every event's JSON
    payload gets the Confluent wire header prepended through the
    Bloblang function (magic 0x00 + big-endian uint32 schema id),
    then the columns decode the header BACK out of the binary —
    magic byte, schema id via hex/conv, payload length — so the
    oracle pins the exact 5-byte layout arithmetically."""
    from connect_spark.bloblang.compiler import (
        _fn_with_schema_registry_header,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type")
    framed = ev.withColumn(
        "framed",
        _fn_with_schema_registry_header(
            (F.col("event_id") % 100000 + 7).cast("bigint"),
            F.concat(F.lit('{"t":"'), F.col("event_type"), F.lit('"}')),
        ),
    )
    return framed.select(
        "event_id",
        F.conv(F.hex(F.substring("framed", 1, 1)), 16, 10)
        .cast("int").alias("magic"),
        F.conv(F.hex(F.substring(F.col("framed"), 2, 4)), 16, 10)
        .cast("bigint").alias("schema_id"),
        F.length("framed").alias("framed_len"),
        F.substring(F.col("framed"), 6, 1024).cast("string")
        .alias("payload"),
    )


SR_HEADER_SQL = """
SELECT event_id,
       0 AS magic,
       CAST(event_id % 100000 + 7 AS BIGINT) AS schema_id,
       CAST(5 + length('{"t":"' || event_type || '"}') AS INT)
           AS framed_len,
       '{"t":"' || event_type || '"}' AS payload
FROM events
"""


QUERIES += [
    QuerySpec("fn_sr_header_roundtrip", fn_sr_header_roundtrip,
              SR_HEADER_SQL),
]


# --- Bloblang FUNCTION surface matrix (functions.adoc; r14 verdict
# "What's missing" #1 — the 11 previously-unregistered functions) ---

def fn_functions_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every deterministic documented Bloblang *function* driven
    END-TO-END through the YAML processor path (group_by_value →
    mapping), not re-expressed as Columns: batch_index/batch_size
    (functions.adoc:446,463 — batch = the group_by_value group),
    count (:919), bytes (:33), content (:480), json, error/errored +
    error_source_label/name/path (:504-583, healthy-row nulls),
    root_meta (:962), file (:733), uuid_v7 (:423, format-pinned
    boolean since the value is random), timestamp_unix (sanity bound).

    Scale shape: the batch functions are ONE window over the group
    key (single hash exchange); count() is the inherently-sequential
    global sequence (same note as counter(), compiler.py) — a matrix
    gate, not a hot-path pattern."""
    import os

    from connect_spark.catalog import load_table
    from connect_spark.plans.pipeline import apply_processor

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "fn_file_fixture.txt",
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    ).withColumn("_arrival_order", F.col("event_id"))
    work = apply_processor(
        ev, {"group_by_value": {"value": '${! json("user_id") }'}}
    )
    src = f'''
meta origin = "fn-matrix"
root.event_id = this.event_id
root.bidx = batch_index()
root.bsize = batch_size()
root.pad = bytes(4).encode("hex")
root.pad_len = bytes(8).length()
root.seq = count("fn_matrix")
root.doc_json = content()
root.etype = json("event_type")
root.err_msg = error()
root.has_err = errored()
root.err_label = error_source_label()
root.err_name = error_source_name()
root.err_path = error_source_path()
root.origin = root_meta("origin")
root.uuid7_ok = uuid_v7().re_match("^[0-9a-f]{{8}}-[0-9a-f]{{4}}-7[0-9a-f]{{3}}-[89ab][0-9a-f]{{3}}-[0-9a-f]{{12}}$")
root.ts_ok = timestamp_unix() > 1500000000
root.fixture = file("{fixture}").trim()
'''
    out = apply_processor(work, {"mapping": src})
    return out.select(
        "event_id",
        F.col("bidx").cast("long").alias("bidx"),
        F.col("bsize").cast("long").alias("bsize"),
        "pad",
        F.col("pad_len").cast("long").alias("pad_len"),
        F.col("seq").cast("long").alias("seq"),
        "doc_json", "etype", "err_msg", "has_err",
        "err_label", "err_name", "err_path", "origin",
        "uuid7_ok", "ts_ok", "fixture",
    )


FN_FUNCTIONS_SQL = """
SELECT event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
         AS bidx,
       count(*) OVER (PARTITION BY user_id) AS bsize,
       '00000000' AS pad,
       CAST(8 AS BIGINT) AS pad_len,
       row_number() OVER (ORDER BY event_id) AS seq,
       '{"event_id":' || event_id || ',"user_id":' || user_id ||
         ',"event_type":"' || event_type || '"}' AS doc_json,
       event_type AS etype,
       CAST(NULL AS VARCHAR) AS err_msg,
       FALSE AS has_err,
       CAST(NULL AS VARCHAR) AS err_label,
       CAST(NULL AS VARCHAR) AS err_name,
       CAST(NULL AS VARCHAR) AS err_path,
       'fn-matrix' AS origin,
       TRUE AS uuid7_ok,
       TRUE AS ts_ok,
       'fn-file-fixture-v1' AS fixture
FROM events
"""


QUERIES += [
    QuerySpec("fn_functions_matrix", fn_functions_matrix,
              FN_FUNCTIONS_SQL),
]


def dynamic_batch_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic mapping fallback as a DISTRIBUTED batch engine
    (r15): a raw content envelope grouped by group_by_value, then a
    mapping the Column compiler refuses (`root = this` + merged
    assignments into an unparsed document) evaluates through
    applyInPandas — one Arrow group per batch, pyeval.eval_batch
    message semantics (plans/pipeline.py _dynamic_apply). Exercises
    from_all().sum(), from_all().fold(max), batch_index() ordering,
    and deleted() row drops, end-to-end against a SQL window oracle.

    Scale shape: batch = per-user event history (bounded by user
    activity, not corpus size); ONE hash exchange on the group key;
    the Python stage is Arrow-batched per group. The Column path
    stays the hot path — this gates the fallback's semantics."""
    from connect_spark.plans.pipeline import apply_processor

    ev = load_table(spark, sf_dir, "events").select(
        F.to_json(F.struct(
            "event_id",
            "user_id",
            # floor() is exact on doubles in BOTH engines — no
            # decimal rounding-mode divergence in the oracle compare
            F.floor("value").cast("bigint").alias("value_units"),
        )).alias("content"),
        F.col("event_id").alias("_arrival_order"),
    )
    work = apply_processor(
        ev, {"group_by_value": {"value": '${! json("user_id") }'}}
    )
    src = """
root = this
batch_total = json("value_units").from_all().sum()
batch_max = json("value_units").from_all().fold(0, match {
  tally < value => value
  _ => tally
})
brank = batch_index()
root = match {
  batch_index() >= 5 => deleted()
}
"""
    out = apply_processor(work, {"mapping": src})
    parsed = F.from_json(
        F.col("content"),
        "struct<event_id:bigint,user_id:bigint,value_units:bigint,"
        "batch_total:bigint,batch_max:bigint,brank:bigint>",
    )
    return out.select(parsed.alias("d")).select(
        F.col("d.event_id").alias("event_id"),
        F.col("d.user_id").alias("user_id"),
        F.col("d.value_units").alias("value_units"),
        F.col("d.batch_total").alias("batch_total"),
        F.col("d.batch_max").alias("batch_max"),
        F.col("d.brank").alias("brank"),
    )


DYNAMIC_BATCH_SQL = """
WITH ranked AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value) AS BIGINT) AS value_units,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
           AS brank
  FROM events
), totals AS (
  SELECT user_id,
         CAST(SUM(value_units) AS BIGINT) AS batch_total,
         CAST(GREATEST(MAX(value_units), 0) AS BIGINT) AS batch_max
  FROM ranked GROUP BY user_id
)
SELECT r.event_id, r.user_id, r.value_units,
       t.batch_total, t.batch_max, CAST(r.brank AS BIGINT) AS brank
FROM ranked r JOIN totals t USING (user_id)
WHERE r.brank < 5
"""


QUERIES += [
    QuerySpec("dynamic_batch_reduce", dynamic_batch_reduce,
              DYNAMIC_BATCH_SQL),
]
