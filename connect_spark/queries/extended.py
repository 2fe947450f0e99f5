"""Extended coverage queries: pivot/rollup/set-ops (Spark-native
upgrades the reference lacks, SURVEY.md §2.C note), workflow/branch
DAG, sql_select-style parameterized selection, grok extraction, text
chunking, and a compress/decompress roundtrip (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import fanout_scan, load_table
from connect_spark.functions.formats import (
    compress_udf,
    decompress_udf,
    grok_extract,
    text_chunks,
)
from connect_spark.operators.branch import workflow
from connect_spark.queries import QuerySpec


# --- pivot (group_by + per-value columns) ---

def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status. The reference can
    only express this as N parallel `group_by` pipelines; one shuffle
    here."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_filled"),
        F.coalesce("P", F.lit(0)).alias("n_pending"),
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'O') AS n_open,
       count(*) FILTER (o_orderstatus = 'F') AS n_filled,
       count(*) FILTER (o_orderstatus = 'P') AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


# --- rollup ---

def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total
    in one pass (absent in the reference; native in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- grouping sets ---

def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with explicit GROUPING() markers — the general
    form rollup/cube specialize (arbitrary aggregation lattices in one
    pass; Catalyst expands to a single Expand + one aggregation, so
    the fact table is scanned once, not once per set).  Emitted
    per-column grouping flags disambiguate subtotal rows from genuine
    NULL groups."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
    """)


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""


# --- time-series gap fill (the hypertable rollup family) ---

def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filled hourly rollup with LOCF: per
    event_type, a dense hourly spine from the type's first to last
    hour (sequence + explode — no data-dependent holes), the hourly
    aggregate left-joined on, and empty hours carrying the last
    observed value forward (last(ignorenulls) over the time order).
    The TimescaleDB time_bucket_gapfill + locf() shape, expressed as
    Catalyst primitives; all filled values are integers so the fill
    is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type",
                  F.date_trunc("hour", "ts").alias("h"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("cents").alias("cents"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("event_type",
                F.explode(F.expr(
                    "sequence(h0, h1, interval 1 hour)")).alias("h"))
    )
    from pyspark.sql import Window

    joined = spine.join(hourly, ["event_type", "h"], "left")
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, 0))
    return joined.select(
        "event_type",
        F.col("h").cast("string").alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        (F.col("n").isNull()).cast("int").alias("filled"),
        F.last("cents", ignorenulls=True).over(w).alias("cents_locf"),
    )


# portable LOCF (no IGNORE NULLS dependence): the gaps-and-islands
# trick — each non-null observation opens a group; MAX within the
# group IS that observation
GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n,
         SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), bounds AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly
  GROUP BY event_type
), spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
           AS h
  FROM bounds
), joined AS (
  SELECT s.event_type, s.h, hh.n, hh.cents
  FROM spine s LEFT JOIN hourly hh
    ON hh.event_type = s.event_type AND hh.h = s.h
), grouped AS (
  SELECT *, SUM(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END)
              OVER (PARTITION BY event_type ORDER BY h
                    ROWS UNBOUNDED PRECEDING) AS grp
  FROM joined
)
SELECT event_type, CAST(h AS VARCHAR) AS hour,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS filled,
       CAST(MAX(cents) OVER (PARTITION BY event_type, grp) AS BIGINT)
         AS cents_locf
FROM grouped
"""


# --- set operations ---

def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: custkeys that are BUILDING-segment AND have a
    300k+ order, minus those with any F-status order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("k")
    )
    filled = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    return building.intersect(big).exceptAll(filled.distinct())


SETOPS_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
EXCEPT
SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
"""


# --- workflow / branch DAG ---

def workflow_enrich_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`workflow` DAG (workflow.adoc:37-43): branch B depends on A's
    output, C is independent — all collapse into one projection."""
    li = load_table(spark, sf_dir, "lineitem")
    out = workflow(
        li,
        branches={
            "net": {"net_price": F.col("l_extendedprice") * (1 - F.col("l_discount"))},
            "taxed": {"final_price": F.col("net_price") * (1 + F.col("l_tax"))},
            "flags": {"is_return": (F.col("l_returnflag") == "R").cast("int")},
        },
        dependencies={"taxed": ["net"]},
    )
    return out.select(
        "l_orderkey", "l_linenumber", "net_price", "final_price", "is_return"
    )


WORKFLOW_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS final_price,
       CAST(l_returnflag = 'R' AS INT) AS is_return
FROM lineitem
"""


# --- sql_select processor shape ---

def sql_select_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sql_select` (processor_sql_select.go:32-67): columns + where
    args + order/limit — here a declarative select whose filter pushes
    to the scan instead of a per-message SELECT."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(
            (F.col("o_totalprice") > 200000)
            & (F.col("o_orderkey") % 10 == 0)
        )
    )


SQL_SELECT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 200000 AND o_orderkey % 10 = 0
"""


# --- grok extraction ---

def grok_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`grok` (grok.adoc:26): structured extraction from a text line,
    compiled to native regexp_extract (no UDF). The synthetic line is
    built from event fields, then parsed back."""
    ev = load_table(spark, sf_dir, "events")
    line = F.concat_ws(
        " ",
        F.upper("event_type"),
        F.concat(F.lit("user="), F.col("user_id")),
        F.concat(F.lit("value="), F.col("value")),
    )
    parsed = grok_extract(line, "%{WORD:level} user=%{INT:uid} value=%{NUMBER:val}")
    return ev.select(
        "event_id",
        parsed["level"].alias("level"),
        parsed["uid"].cast("bigint").alias("uid"),
        parsed["val"].cast("double").alias("val"),
    )


GROK_SQL = r"""
WITH lines AS (
  SELECT event_id,
         upper(event_type) || ' user=' || user_id || ' value=' || value AS line
  FROM events
)
SELECT event_id,
       regexp_extract(line, '(\w+) user=([+-]?\d+) value=([+-]?\d+(?:\.\d+)?)', 1) AS level,
       CAST(regexp_extract(line, '(\w+) user=([+-]?\d+) value=([+-]?\d+(?:\.\d+)?)', 2) AS BIGINT) AS uid,
       CAST(regexp_extract(line, '(\w+) user=([+-]?\d+) value=([+-]?\d+(?:\.\d+)?)', 3) AS DOUBLE) AS val
FROM lines
"""


# --- text chunker ---

def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_chunker token strategy (text_chunker.adoc:85-101): 20-token
    chunks, exploded with chunk index — the LLM-pipeline pre-embedding
    step. Narrow array algebra, no UDF, no shuffle."""
    docs = fanout_scan(  # opt guide §2.5: 1-task scan, heavy narrow chunking
        spark, load_table(spark, sf_dir, "documents"), sf_dir,
        "documents")
    chunks = docs.select(
        "doc_id", F.posexplode(text_chunks("text", 20)).alias("chunk_idx", "chunk")
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.size(F.filter(F.split("chunk", " "), lambda t: t != "")).alias(
            "chunk_tokens"
        ),
    )


CHUNK_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), c AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(CAST(ceil(len(toks) / 20.0) AS INT), 1)),
                i -> array_to_string(toks[i * 20 + 1 : i * 20 + 20], ' '))) AS chunk,
         generate_subscripts(range(0, greatest(CAST(ceil(len(toks) / 20.0) AS INT), 1)), 1) - 1 AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx, chunk,
       len(list_filter(string_split(chunk, ' '), x -> x != '')) AS chunk_tokens
FROM c
"""


# --- recursive_character / markdown chunker strategies ---

def chunk_recursive_character(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_chunker `recursive_character` strategy
    (text_chunker.adoc:85-101): separators ["\\n\\n","\\n"," "],
    chunk_size=100 chars, overlap=0. On the single-line documents
    corpus this reduces to greedy word-packing, which the oracle
    replays exactly with a recursive CTE (one word per iteration)."""
    from connect_spark.text.chunker import recursive_chunks_udf

    docs = fanout_scan(  # opt guide §2.5: 1-task scan, heavy narrow chunking
        spark, load_table(spark, sf_dir, "documents"), sf_dir,
        "documents")
    chunks = recursive_chunks_udf(
        chunk_size=100, chunk_overlap=0, separators=["\n\n", "\n", " "]
    )(F.col("text"))
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).withColumn("chunk_chars", F.length("chunk").cast("bigint"))


CHUNK_RECURSIVE_SQL = """
WITH RECURSIVE t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), words AS (
  SELECT doc_id, u.s['i'] AS i, u.s['w'] AS w
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) + 1),
                  i -> {'i': i, 'w': toks[i]})) AS s
    FROM t
  ) u
), state AS (
  SELECT doc_id, i, w, 1 AS chunk_no, len(w) AS total
  FROM words WHERE i = 1
  UNION ALL
  SELECT w.doc_id, w.i, w.w,
         CASE WHEN s.total + 1 + len(w.w) > 100
              THEN s.chunk_no + 1 ELSE s.chunk_no END,
         CASE WHEN s.total + 1 + len(w.w) > 100
              THEN len(w.w) ELSE s.total + 1 + len(w.w) END
  FROM state s JOIN words w ON w.doc_id = s.doc_id AND w.i = s.i + 1
)
SELECT doc_id, chunk_no - 1 AS chunk_idx,
       string_agg(w, ' ' ORDER BY i) AS chunk,
       CAST(len(string_agg(w, ' ' ORDER BY i)) AS BIGINT) AS chunk_chars
FROM state
GROUP BY doc_id, chunk_no
"""


def chunk_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_chunker `markdown` strategy: header lines start sections;
    each output row is (header, body). Markdown is synthesized from
    the documents table identically on both sides, so the oracle can
    state the expected sections directly."""
    from connect_spark.text.chunker import markdown_chunks_udf

    docs = fanout_scan(  # opt guide §2.5: 1-task scan, heavy narrow chunking
        spark, load_table(spark, sf_dir, "documents"), sf_dir,
        "documents")
    md = F.concat(
        F.lit("# Doc\nabstract: "),
        F.substring("text", 1, 40),
        F.lit("\n# Content\n"),
        F.col("text"),
    )
    secs = markdown_chunks_udf(chunk_size=2000)(md)
    return docs.select(
        "doc_id", F.posexplode(secs).alias("chunk_idx", "sec")
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("sec.header").alias("header"),
        F.col("sec.body").alias("body"),
    )


CHUNK_MARKDOWN_SQL = """
SELECT doc_id, 0 AS chunk_idx, '# Doc' AS header,
       'abstract: ' || substr(text, 1, 40) AS body
FROM documents
UNION ALL
SELECT doc_id, 1 AS chunk_idx, '# Content' AS header, text AS body
FROM documents
"""


# --- compress roundtrip ---

def compress_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compress+decompress processors (compress.adoc:26): gzip
    roundtrip over document text via Arrow-batched pandas UDFs.

    Self-verifying against DuckDB: the oracle can't gzip, but it CAN
    assert what a correct roundtrip must produce — raw byte length,
    roundtrip_ok == true for every row, and the md5 of the decoded
    bytes (== md5 of the original text). The compressed length itself
    is zlib-version-dependent and stays out of the hashed output."""
    # gzip deflate/inflate is Python CPU per row above an unsplittable
    # scan — spread it (opt guide §2.5/§4)
    docs = fanout_scan(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir, "documents")
    comp = compress_udf("gzip")
    decomp = decompress_udf("gzip")
    out = docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("raw"),
    ).withColumn("gz", comp("raw")).withColumn("back", decomp("gz"))
    return out.select(
        "doc_id",
        F.octet_length("raw").alias("raw_len"),
        (F.col("raw") == F.col("back")).alias("roundtrip_ok"),
        F.md5("back").alias("back_md5"),
    )


COMPRESS_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS raw_len,
       TRUE AS roundtrip_ok,
       md5(text) AS back_md5
FROM documents
"""


QUERIES = [
    QuerySpec("pivot_status_by_priority", pivot_status_by_priority, PIVOT_SQL),
    QuerySpec("rollup_lineitem", rollup_lineitem, ROLLUP_SQL),
    QuerySpec("grouping_sets_orders", grouping_sets_orders,
              GROUPING_SETS_SQL),
    QuerySpec("timeseries_gapfill_locf", timeseries_gapfill_locf,
              GAPFILL_SQL),
    QuerySpec("setops_segments", setops_segments, SETOPS_SQL),
    QuerySpec("workflow_enrich_lineitem", workflow_enrich_lineitem, WORKFLOW_SQL),
    QuerySpec("sql_select_orders", sql_select_orders, SQL_SELECT_SQL),
    QuerySpec("grok_extract_events", grok_extract_events, GROK_SQL),
    QuerySpec("chunk_documents", chunk_documents, CHUNK_SQL, headline=True),
    QuerySpec(
        "chunk_recursive_character",
        chunk_recursive_character,
        CHUNK_RECURSIVE_SQL,
    ),
    QuerySpec("chunk_markdown", chunk_markdown, CHUNK_MARKDOWN_SQL),
    QuerySpec("compress_roundtrip", compress_roundtrip, COMPRESS_SQL),
]
