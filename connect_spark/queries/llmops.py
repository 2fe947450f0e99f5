"""Training-data pipeline operators beyond dedup/ANN (round 5):
PII scrubbing, Gopher-style quality rules, sequence packing, and
benchmark-contamination detection — the remaining table-stakes ops of
a 100-TB LLM data pipeline, each as pure Column algebra with a DuckDB
oracle.

Scale notes:
- `text_pii_scrub` / `quality_gopher_rules`: narrow projections over
  one scan — zero shuffles, whole-stage codegen.
- `pack_sequences`: one global sort-window (cumulative token sum) —
  the deterministic sequential-packing contract; at 100 TB you run it
  per shard (partitionBy on a shard key gives the same plan with a
  hash exchange instead of a global sort, packing within shards, as
  real pipelines do).
- `contamination_13gram`: benchmark n-gram set is tiny relative to
  the corpus (a benchmark is KBs); candidates come from an equality
  semi-join on the gram hash — never a cross join; AQE broadcasts the
  benchmark side at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import fanout_scan, load_table
from connect_spark.queries import QuerySpec

# regex subset valid in BOTH Java regex (Spark) and RE2 (DuckDB)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / phone numbers from document text —
    regex-based PII scrubbing (the standard pre-training hygiene
    pass).  Patterns stay in the Java-regex ∩ RE2 subset so the DuckDB
    oracle applies the IDENTICAL expressions."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _IPV4_RE, "<IP>"),
        _PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.substring(scrubbed, 1, 64).alias("scrub_head"),
        F.length(scrubbed).alias("scrub_len"),
        (F.length("text") - F.length(F.regexp_replace(
            "text", _EMAIL_RE, ""))).alias("email_chars_removed"),
    )


PII_SQL = f"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IPV4_RE}', '<IP>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
         text
  FROM documents
)
SELECT doc_id,
       substr(scrubbed, 1, 64) AS scrub_head,
       length(scrubbed) AS scrub_len,
       length(text) - length(
         regexp_replace(text, '{_EMAIL_RE}', '', 'g'))
         AS email_chars_removed
FROM s
"""


def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word count bounds, mean word length band, symbol-to-word ratio,
    bullet-line ratio, alphabetic-word ratio — each as a flag plus the
    overall keep decision.  Pure Column algebra; ratios in exact
    integer basis points so both engines hash identically."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " +")
    n_words = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("bigint"), lambda a, x: a + x)
    # mean word length in basis points (×100), integer math
    mwl_x100 = (total_chars * 100 / n_words).cast("bigint")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_hash = F.length("text") - F.length(
        F.regexp_replace("text", "#", ""))
    n_ellips = (F.length("text") - F.length(
        F.regexp_replace("text", r"\.\.\.", ""))) / 3
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda ln: ln.rlike("^[-*•]")))
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl_x100.alias("mwl_x100"),
        ((n_hash + n_ellips.cast("bigint")) * 10000 / n_words)
            .cast("bigint").alias("symbol_ratio_bp"),
        (n_alpha * 10000 / n_words).cast("bigint").alias("alpha_bp"),
        (n_bullet * 10000 / n_lines).cast("bigint").alias("bullet_bp"),
    )
    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
        & (F.col("mwl_x100") >= 300) & (F.col("mwl_x100") <= 1000)
        & (F.col("symbol_ratio_bp") <= 1000)
        & (F.col("alpha_bp") >= 8000)
        & (F.col("bullet_bp") <= 9000)
    )
    return out.withColumn("keep", keep.cast("int"))


GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(text, ' +') AS toks,
         string_split(text, chr(10)) AS lines,
         text
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> len(x))) * 100
              // len(toks) AS BIGINT) AS mwl_x100,
         CAST((
             (length(text) - length(replace(text, '#', '')))
             + CAST((length(text) - length(replace(text, '...', '')))
                    // 3 AS BIGINT)
           ) * 10000 // len(toks) AS BIGINT) AS symbol_ratio_bp,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              * 10000 // len(toks) AS BIGINT) AS alpha_bp,
         CAST(len(list_filter(lines,
                              x -> regexp_matches(x, '^[-*•]')))
              * 10000 // len(lines) AS BIGINT) AS bullet_bp
  FROM t
)
SELECT *,
       CAST(n_words BETWEEN 50 AND 100000
            AND mwl_x100 BETWEEN 300 AND 1000
            AND symbol_ratio_bp <= 1000
            AND alpha_bp >= 8000
            AND bullet_bp <= 9000 AS INT) AS keep
FROM m
"""


def quality_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's REPETITION rules (Rae et al. 2021 §A1.1, public — the
    half `quality_gopher_rules` doesn't cover): fraction of the
    document covered by its most frequent 2-gram and 3-gram, and the
    fraction of duplicate lines.  High values mark boilerplate /
    degenerate generations.  One explode + per-(doc, gram) count +
    per-doc max — a single shuffle keyed by doc_id whose volume is
    the token stream, exactly like the shingle pipeline; ratios in
    integer basis points so both engines hash identically."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " +")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.split(F.col("text"), "\n").alias("lines"),
    ).filter(F.size("toks") >= 3)

    def gram_top(n: int, alias: str) -> DataFrame:
        grams = F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda j: F.concat_ws(" ", F.slice("toks", j + 1, n)),
        )
        ex = base.select(
            "doc_id", F.explode(grams).alias("g"),
            (F.size("toks") - n + 1).alias("n_grams"))
        return (
            ex.groupBy("doc_id", "n_grams", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(
                (F.max("c") * 10000 / F.first("n_grams"))
                .cast("bigint").alias(alias))
        )

    dup_lines = base.select(
        "doc_id",
        (
            (F.size("lines")
             - F.size(F.array_distinct("lines"))) * 10000
            / F.size("lines")
        ).cast("bigint").alias("dup_line_bp"),
    )
    out = (
        base.select("doc_id")
        .join(gram_top(2, "top_bigram_bp"), "doc_id")
        .join(gram_top(3, "top_trigram_bp"), "doc_id")
        .join(dup_lines, "doc_id")
    )
    keep = (
        (F.col("top_bigram_bp") <= 2000)
        & (F.col("top_trigram_bp") <= 1800)
        & (F.col("dup_line_bp") <= 3000)
    )
    return out.withColumn("keep", keep.cast("int"))


REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(text, ' +') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
), base AS (
  SELECT * FROM t WHERE len(toks) >= 3
), g2 AS (
  SELECT doc_id, len(toks) - 1 AS n_grams,
         unnest(list_transform(range(1, len(toks)),
                j -> toks[j] || ' ' || toks[j+1])) AS g
  FROM base
), top2 AS (
  SELECT doc_id,
         CAST(MAX(c) * 10000 // ANY_VALUE(n_grams) AS BIGINT)
           AS top_bigram_bp
  FROM (SELECT doc_id, n_grams, g, COUNT(*) AS c
        FROM g2 GROUP BY 1, 2, 3)
  GROUP BY doc_id
), g3 AS (
  SELECT doc_id, len(toks) - 2 AS n_grams,
         unnest(list_transform(range(1, len(toks) - 1),
                j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]))
           AS g
  FROM base
), top3 AS (
  SELECT doc_id,
         CAST(MAX(c) * 10000 // ANY_VALUE(n_grams) AS BIGINT)
           AS top_trigram_bp
  FROM (SELECT doc_id, n_grams, g, COUNT(*) AS c
        FROM g3 GROUP BY 1, 2, 3)
  GROUP BY doc_id
), dl AS (
  SELECT doc_id,
         CAST((len(lines) - len(list_distinct(lines))) * 10000
              // len(lines) AS BIGINT) AS dup_line_bp
  FROM base
)
SELECT b.doc_id, top_bigram_bp, top_trigram_bp, dup_line_bp,
       CAST(top_bigram_bp <= 2000 AND top_trigram_bp <= 1800
            AND dup_line_bp <= 3000 AS INT) AS keep
FROM base b
JOIN top2 USING (doc_id)
JOIN top3 USING (doc_id)
JOIN dl USING (doc_id)
"""


def quality_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality scoring, the CCNet/KenLM idea with exact
    integer math: train bigram document frequencies on the corpus
    itself, then score each doc by the mean corpus-df of its DISTINCT
    bigrams — low scores mark text unlike the rest of the corpus
    (gibberish, foreign boilerplate), high scores mark boilerplate.
    Two map-side-combined aggregations and ONE equality join keyed by
    the bigram — the same shuffle shape as the shingle pipeline; at
    100 TB you'd train df on a sample and broadcast, which is the
    same plan with a smaller build side."""
    # tokenize + bigram explode is the heavy narrow stage and the
    # local documents scan is one split (opt guide §2.5)
    docs = fanout_scan(
        spark, load_table(spark, sf_dir, "documents"), sf_dir,
        "documents")
    toks = F.split(F.col("text"), " +")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda j: F.concat_ws(" ", F.slice(toks, j + 1, 2)),
    )
    ex = docs.filter(F.size(toks) >= 2).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    df_tbl = ex.groupBy("g").agg(
        F.count(F.lit(1)).alias("df"))
    return (
        ex.join(df_tbl, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("df") * 100 / F.count(F.lit(1)))
            .cast("bigint").alias("mean_df_x100"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
    )


BIGRAM_LM_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks)),
                j -> toks[j] || ' ' || toks[j+1])) AS g
  FROM t WHERE len(toks) >= 2
), dfs AS (
  SELECT g, COUNT(*) AS df FROM g GROUP BY g
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(df) * 100 // COUNT(*) AS BIGINT) AS mean_df_x100,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique
FROM g JOIN dfs USING (g)
GROUP BY doc_id
"""


def vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics — the distributed half of
    tokenizer training (text/bpe.py trains merges from exactly these
    counts): top-50 bigrams by corpus frequency with deterministic
    tie-break.  One map-side-combined count agg; the top-k is a tiny
    final reduction (50 rows through one exchange) — the plan shape
    vocabulary construction uses at any corpus size.  The bigram
    explode is narrow algebra above an unsplittable scan — spread it
    (opt guide §2.5; measured 3.2s -> 1.0s at sf0.1, no-op once the
    scan splits on its own)."""
    from connect_spark.catalog import fanout_scan

    docs = fanout_scan(
        spark,
        load_table(spark, sf_dir, "documents").select("text"),
        sf_dir, "documents")
    toks = F.split(F.col("text"), " +")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda j: F.concat_ws(" ", F.slice(toks, j + 1, 2)),
    )
    return (
        docs.filter(F.size(toks) >= 2)
        .select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "bigram")
        .limit(50)
    )


VOCAB_SQL = """
SELECT bigram, freq FROM (
  SELECT g AS bigram, COUNT(*) AS freq
  FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                  j -> toks[j] || ' ' || toks[j+1])) AS g
    FROM (SELECT regexp_split_to_array(text, ' +') AS toks
          FROM documents)
    WHERE len(toks) >= 2
  )
  GROUP BY g
)
ORDER BY freq DESC, bigram
LIMIT 50
"""


def pack_sequences(
    spark: SparkSession, sf_dir: str, token_mode: str = "ws"
) -> DataFrame:
    """Sequence packing for training: documents (whitespace token
    counts) are packed into 2048-token bins by cumulative-sum
    bucketing WITHIN a shard — pack_id = floor((cumsum - tokens) /
    seq_len) over (shard, doc_id) order.  The window partitions by a
    shard key (doc_id % 16 here; a directory shard in production), so
    the plan is a hash exchange + per-partition sort — never a
    single-partition global sort.  Bins never span shards, exactly as
    real pipelines pack per input shard."""
    seq_len = 2048
    n_shards = 16
    docs = load_table(spark, sf_dir, "documents")
    if token_mode == "bpe":
        # real subword counts: broadcast merge table + Arrow-batched
        # UDF (text/bpe.py) — same plan shape, no extra shuffle
        from connect_spark.text.bpe import bpe_count_udf

        toks = bpe_count_udf(spark)(F.col("text"))
    else:
        toks = F.size(F.split(F.col("text"), " +")).cast("bigint")
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        toks.alias("n_tokens"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    out = with_cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        ((F.col("cum") - F.col("n_tokens")) / seq_len)
            .cast("bigint").alias("pack_id"),
    )
    return (
        out.groupBy("shard", "pack_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


PACK_SQL = """
WITH t AS (
  SELECT doc_id,
         doc_id % 16 AS shard,
         CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT shard,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
"""


# --- BPE token counting (public-spec byte-level BPE, text/bpe.py) ---
#
# The encoder can't run inside DuckDB, so the oracle is literal-pinned:
# the SAME pure-Python reference encoder runs at import time over a
# fixed vector set (edge cases included) and its outputs are embedded
# as VALUES.  The Spark side runs the vectors through the DISTRIBUTED
# path — broadcast merge table + Arrow-batched pandas UDF — so the row
# checks Spark-executor encoding == reference encoding, token for
# token.

_BPE_VECTORS: list[tuple[str, str]] = [
    ("english", "the quick brown fox jumps over the lazy dog"),
    ("repeat", "the the the the the"),
    ("contraction", "it's we're they'll don't I'd you've I'm"),
    ("numbers", "order 12345 totals 67890 discount 10 percent"),
    ("code", "for i in range(100): total += values[i] * weights[i]"),
    ("sql", "select count(*) from orders where o_orderkey >= 1995"),
    ("unicode", "naïve café über žluťoučký kůň 日本語のテキスト"),
    ("emoji_bytes", "rocket 🚀 and snowman ☃ fall back to bytes"),
    ("empty", ""),
    ("spaces", "   leading and    internal   and trailing   "),
    ("newlines", "line one\nline two\n\nline four"),
    ("longword", "internationalization" * 3),
    ("punct_run", "!!! ??? ... --- ### %%% &&&"),
    ("mixed", "Training data pipelines tokenize 100TB of text daily."),
    ("tabs", "a\tb\tc\td"),
    ("single_char", "x"),
]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_oracle_sql() -> str:
    from connect_spark.text.bpe import default_tokenizer

    tok = default_tokenizer()
    rows = []
    for name, text in _BPE_VECTORS:
        toks = tok.encode(text)
        head = " ".join(toks[:8])
        rows.append(
            f"({_sql_quote(name)}, {len(toks)}, {_sql_quote(head)})")
    return (
        "SELECT name, CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,"
        " head_tokens FROM (VALUES\n  "
        + ",\n  ".join(rows)
        + "\n) AS t(name, n_bpe_tokens, head_tokens)"
    )


def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE token counts over the pinned vector set via the
    distributed path: merge table broadcast once per executor, counts
    and token heads from Arrow-batched pandas UDFs.  At corpus scale
    this is a narrow map over the documents table (see
    `pack_sequences(token_mode='bpe')`); the registered query uses
    pinned vectors so the oracle can literal-check every token."""
    from connect_spark.text.bpe import bpe_count_udf, bpe_encode_udf

    df = spark.createDataFrame(_BPE_VECTORS, "name string, text string")
    count_udf = bpe_count_udf(spark)
    encode_udf = bpe_encode_udf(spark)
    return df.select(
        "name",
        count_udf("text").alias("n_bpe_tokens"),
        F.concat_ws(" ", F.slice(encode_udf("text"), 1, 8))
            .alias("head_tokens"),
    )


def bpe_train_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING as a distributed iterative Spark job
    (text/bpe_train.py): one corpus pass builds the vocabulary-sized
    word-count table, then each merge round is a map-side-combined
    pair count + TakeOrdered argmax + pure-Column merge fold — the
    driver holds only the learned merge table. Bit-identical to the
    in-process trainer (tests/test_bpe_train_spark.py parity);
    deterministic tie-break (count desc, pair asc), so the output is
    stable. Iterative and therefore not SQL-expressible — registered
    with the rows-only driver check; the pytest parity gate is the
    correctness anchor."""
    from connect_spark.text.bpe_train import train_bpe_spark

    docs = load_table(spark, sf_dir, "documents").select("text")
    merges = train_bpe_spark(docs, "text", 16)
    rows = [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING")


def bpe_train_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate bit-parity for distributed BPE training: train the
    SAME bounded corpus slice (doc_id < 300 — deterministic, counts
    are order-independent) through both `train_bpe_spark` (the
    production iterative Spark job) and `text/bpe.py::train_bpe` (the
    in-process reference trainer serving as the oracle side, the one
    place a corpus collect is legitimate: it IS the gate's reference
    implementation, bounded by construction) and return every rank
    where the learned merge tables differ. Expected: zero rows — the
    greedy argmax, (count desc, pair asc) tie-break and stop rule must
    agree exactly, so the SQL oracle is the empty relation. This
    upgrades `bpe_train_distributed` from a rows-only driver check to
    a value-level one."""
    from connect_spark.text.bpe import train_bpe
    from connect_spark.text.bpe_train import train_bpe_spark

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") < 300).select("doc_id", "text")
    texts = [r.text for r in docs.select("text").collect()]
    local = train_bpe(texts, 12)
    dist = train_bpe_spark(docs.select("text"), "text", 12)
    rows = [
        (i + 1,) + (dist[i] if i < len(dist) else ("", ""))
        + (local[i] if i < len(local) else ("", ""))
        for i in range(max(len(local), len(dist)))
        if (dist[i] if i < len(dist) else None)
        != (local[i] if i < len(local) else None)
    ]
    return spark.createDataFrame(
        rows, "rank INT, spark_left STRING, spark_right STRING,"
        " local_left STRING, local_right STRING")


BPE_TRAIN_PARITY_SQL = """
SELECT CAST(NULL AS INT) AS rank, '' AS spark_left, '' AS spark_right,
       '' AS local_left, '' AS local_right
WHERE FALSE
"""


def contamination_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: documents sharing 13-gram word
    sequences with a held-out 'benchmark' set (docs with doc_id % 50
    == 0 stand in for it).  Grams hash to md5-derived keys; candidates
    come from an equality join on the hash — benchmark grams are tiny,
    AQE broadcasts them at scale.  Output: per contaminated corpus doc,
    how many distinct benchmark grams it contains."""
    from connect_spark.catalog import fanout_scan

    n = 13
    # one md5 per token position is heavy narrow algebra above an
    # unsplittable scan — spread it (opt guide §2.5)
    docs = fanout_scan(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir, "documents")
    toks = F.split(F.col("text"), " +")
    # one slice per gram instead of 13 element lookups — an order of
    # magnitude less generated code (the 13-get form spent ~30s in
    # whole-stage codegen compilation before the first row moved)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda j: F.md5(F.concat_ws(" ", F.slice(toks, j + 1, n))),
    )
    exploded = docs.filter(F.size(toks) >= n).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    bench = exploded.filter(F.col("doc_id") % 50 == 0).select(
        F.col("g").alias("bg")).distinct()
    corpus = exploded.filter(F.col("doc_id") % 50 != 0)
    return (
        corpus.join(bench, corpus.g == bench.bg)
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
    )


CONTAMINATION_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 11),
           j -> md5(array_to_string(toks[j:j+12], ' '))))) AS g
  FROM t WHERE len(toks) >= 13
), bench AS (
  SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0
)
SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_contaminated_grams
FROM g c JOIN bench b ON c.g = b.g
WHERE c.doc_id % 50 <> 0
GROUP BY 1
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-mix builder:
    docs stratify into length bands (short/medium/long) with per-band
    keep rates (10% / 50% / 90%), and the keep decision is a pure
    hash of doc_id (first 4 hex chars of md5 compared against the
    band's hex threshold — lexicographic compare of lowercase hex IS
    the numeric compare).  No RNG: the same corpus always yields the
    same sample on any cluster, resumable and auditable, and the
    operator is one narrow projection+filter — no shuffle, fully
    pushed into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    stratum = (
        F.when(F.length("text") < 500, "short")
        .when(F.length("text") < 2000, "medium")
        .otherwise("long")
    )
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = (
        F.when(stratum == "short", "1999")    # 10% of 0x10000
        .when(stratum == "medium", "7fff")    # 50%
        .otherwise("e666")                    # 90%
    )
    return (
        docs.select(
            "doc_id", stratum.alias("stratum"), key.alias("sample_key"),
            thr.alias("thr"))
        .filter(F.col("sample_key") < F.col("thr"))
        .select("doc_id", "stratum", "sample_key")
    )


SAMPLE_STRATIFIED_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(text) < 500 THEN 'short'
              WHEN length(text) < 2000 THEN 'medium'
              ELSE 'long' END AS stratum,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key
  FROM documents
)
SELECT doc_id, stratum, sample_key
FROM t
WHERE sample_key < CASE stratum WHEN 'short' THEN '1999'
                                WHEN 'medium' THEN '7fff'
                                ELSE 'e666' END
"""


QUERIES = [
    QuerySpec("text_pii_scrub", text_pii_scrub, PII_SQL),
    QuerySpec("sample_stratified", sample_stratified,
              SAMPLE_STRATIFIED_SQL),
    QuerySpec("quality_gopher_rules", quality_gopher_rules, GOPHER_SQL),
    QuerySpec("quality_repetition_rules", quality_repetition_rules,
              REPETITION_SQL),
    QuerySpec("quality_bigram_lm", quality_bigram_lm, BIGRAM_LM_SQL),
    QuerySpec("vocab_top_bigrams", vocab_top_bigrams, VOCAB_SQL),
    QuerySpec("pack_sequences", pack_sequences, PACK_SQL),
    QuerySpec("bpe_train_distributed", bpe_train_distributed, None),
    QuerySpec("bpe_train_parity", bpe_train_parity,
              BPE_TRAIN_PARITY_SQL),
    QuerySpec("text_token_count_bpe", text_token_count_bpe,
              _bpe_oracle_sql()),
    QuerySpec("contamination_13gram", contamination_13gram,
              CONTAMINATION_SQL),
]
