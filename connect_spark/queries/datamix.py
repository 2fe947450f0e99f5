"""Corpus-assembly operators: the steps that turn a cleaned document
pool into the stream a trainer actually reads.

Three ops a 100-TB pretraining build runs AFTER dedup + quality
filtering (queries/textops.py, llmops.py, dataprep.py):

- `shard_shuffle_manifest`: deterministic global shuffle + sharding.
  Every doc gets a content-independent pseudorandom key (md5 of its
  id under a fixed salt), the key's hex prefix is the shard, and the
  within-shard order is the key order.  The registered query emits
  the shard MANIFEST (doc/token counts, key range, an order-pinning
  checksum) — the artifact a trainer's data loader consumes.  All
  derivations are engine-independent (md5 + integer math), so the
  DuckDB oracle pins the exact permutation, not just the counts.

- `dsir_importance_resample`: Data Selection via Importance
  Resampling (Xie et al. 2023): hashed token features (256 md5
  buckets), Laplace-smoothed bucket distributions for a target slice
  vs the raw pool, keep a doc iff its summed log-likelihood ratio is
  >= 0.  The per-BUCKET log ratios are rounded to integer micro-nats
  before summing, so the per-doc score is exact integer math — the
  one float op is computing 256 shared weights, where a cross-engine
  ulp flips a weight only if 1e6*ln(ratio) lands within ~1e-9 of a
  rounding boundary.  The target slice is content-defined (docs
  containing the token 'spark') because the synthetic corpus has no
  lang-level distribution signal — all five langs share one uniform
  31-word vocabulary, measured before this design was chosen.

- `mixture_interleave_blocks`: weighted deterministic interleave
  (the "data mixing" schedule): each lang emits docs on a virtual
  clock at a rate proportional to its mixture weight; the output is
  the per-block composition of the merged stream.  Virtual times are
  integers (weights divide a fixed LCM scale), and blocks are
  virtual-time windows, NOT count windows — so there is no global
  row_number / single-partition sort anywhere in the plan.

Scale notes:
- Shuffle/shard: md5 keys are uniform, so hex-prefix shards are
  balanced by construction; at 100 TB raise the prefix to 3-4 hex
  chars (4096-65536 shards) so each shard fits an executor, and the
  physical write is repartition(shard) + sortWithinPartitions(key) —
  the manifest aggregation itself is one map-side-combined groupBy.
- DSIR: bucket tables are 256 rows (broadcast); the only shuffle
  carries (doc_id, bucket) pairs.  At 100-TB count magnitudes,
  pre-normalize bucket counts to ppm integers before the
  cross-multiply so products stay inside int64 (documented at the
  comparison site).
- Interleave: per-lang sequence numbers are the one ordered
  dependency; a window per lang is fine up to ~corpus/lang-count per
  executor, beyond that the standard two-pass prefix-sum (count per
  partition, then offset) computes the same rank without a
  lang-global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

N_SHARD_HEX = 1          # 16 shards at test SF; 3-4 at 100 TB
_SHUFFLE_SALT = "shuffle:"
_DSIR_TARGET_TOKEN = "spark"
_LAPLACE_BUCKETS = 256   # 2 hex chars

# mixture weights (en upsampled 4x) and the virtual-clock scale:
# 840 = LCM-friendly constant divisible by every weight below, so
# every emission time is an exact integer.
_MIX_WEIGHTS = {"en": 4, "zh": 1, "es": 1, "de": 1, "fr": 1}
_VT_SCALE = 840
_BLOCK_VT = 10 * _VT_SCALE   # one block = 10 unit-weight emissions
_N_BLOCKS = 8


def _toks(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


# --- deterministic shuffle + shard manifest -------------------------

def shuffle_shards(docs: DataFrame, prefix_len: int = N_SHARD_HEX) -> DataFrame:
    """Assign (shard, shuffle_key, pos) to every doc.  The key is
    md5('shuffle:' || doc_id): content-independent, so re-running on a
    corpus with edited texts keeps the permutation stable; uniform, so
    shards are balanced.  pos is the 1-based rank inside the shard in
    key order (doc_id tiebreak makes the order total)."""
    keyed = docs.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(_SHUFFLE_SALT), F.col("doc_id").cast("string"))),
    ).withColumn("shard", F.substring("shuffle_key", 1, prefix_len))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.withColumn("pos", F.row_number().over(w))


def shard_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest of the deterministic global shuffle.  The
    order_checksum (sum of pos * (doc_id % 997)) pins the exact
    within-shard permutation: any transposition of two docs changes
    it, so the oracle match verifies the ORDER, not just membership."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _toks().alias("toks"))
    sharded = shuffle_shards(
        docs.select("doc_id", F.size("toks").cast("long").alias("n_tok")))
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("token_total"),
                 F.min("shuffle_key").alias("first_key"),
                 F.max("shuffle_key").alias("last_key"),
                 F.sum(F.col("pos") * (F.col("doc_id") % 997))
                 .alias("order_checksum")))


SHARD_MANIFEST_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
           AS n_tok,
         md5('{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), sharded AS (
  SELECT *, substr(shuffle_key, 1, {N_SHARD_HEX}) AS shard,
         row_number() OVER (PARTITION BY substr(shuffle_key, 1, {N_SHARD_HEX})
                            ORDER BY shuffle_key, doc_id) AS pos
  FROM keyed
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS token_total,
       MIN(shuffle_key) AS first_key, MAX(shuffle_key) AS last_key,
       CAST(SUM(pos * (doc_id % 997)) AS BIGINT) AS order_checksum
FROM sharded GROUP BY shard
"""


# --- DSIR importance resampling --------------------------------------

def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR keep/drop over hashed token features.

    Features: bucket(tok) = first 2 hex chars of md5(tok) (256
    buckets; the corpus vocabulary is 31 words, so buckets are
    near-injective here — at real vocabulary sizes raise to 4-5 hex
    chars, the paper's 10k-bucket regime).  p = Laplace-smoothed
    bucket distribution of the TARGET slice (docs containing
    'spark'), q = of the full pool.  Per-bucket integer weight in
    micro-nats:

        w(b) = round(1e6 * ln( (p_cnt+1)(q_tot+B) /
                               ((q_cnt+1)(p_tot+B)) ))

    and a doc is kept iff sum_t w(bucket(t)) >= 0 — the paper's
    log-likelihood-ratio rule.  Summation is pure BIGINT, so scores
    are exact and engine-independent; only the 256 shared weights
    touch floats, where a cross-engine ulp matters only if
    1e6*ln(ratio) sits within ~1e-9 of a rounding boundary.

    Plan: one explode to (doc_id, bucket), two 256-row count tables
    (AQE broadcasts them), one groupBy doc_id, one groupBy
    (lang, in_target).  At 100 TB the explode shuffle carries
    (doc_id, bucket) pairs only; the weight table stays
    bucket-sized."""
    scored = dsir_scored(load_table(spark, sf_dir, "documents"))
    return (scored.groupBy("lang", "in_target")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 F.sum(F.when(F.col("keep"), F.col("n_tok"))
                       .otherwise(0)).alias("tokens_kept")))


def dsir_scored(docs: DataFrame) -> DataFrame:
    """Doc-level DSIR scores over any (doc_id, lang, text) frame:
    (doc_id, lang, in_target, n_tok, score, keep).  Weights are
    trained on the full input frame; callers that want
    corpus-trained weights applied to a new batch pass the corpus
    and filter afterwards."""
    tok = (docs.select(
        "doc_id", "lang",
        F.array_contains(_toks(), _DSIR_TARGET_TOKEN).alias("in_target"),
        F.explode(_toks()).alias("tok"))
        .withColumn("bucket", F.substring(F.md5("tok"), 1, 2)))
    q_cnt = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("q_cnt"))
    p_cnt = (tok.filter(F.col("in_target"))
             .groupBy("bucket").agg(F.count(F.lit(1)).alias("p_cnt")))
    totals = tok.agg(
        F.count(F.lit(1)).alias("q_tot"),
        F.sum(F.col("in_target").cast("long")).alias("p_tot"))
    B = F.lit(_LAPLACE_BUCKETS)
    weights = (q_cnt.join(p_cnt, "bucket", "left")
               .crossJoin(F.broadcast(totals))
               .select(
                   "bucket",
                   F.round(
                       F.log(
                           ((F.coalesce("p_cnt", F.lit(0)) + 1)
                            * (F.col("q_tot") + B)).cast("double")
                           / ((F.col("q_cnt") + 1)
                              * (F.col("p_tot") + B)).cast("double")
                       ) * F.lit(1000000.0), 0
                   ).cast("long").alias("w")))
    return (tok.join(weights, "bucket")
            .groupBy("doc_id", "lang", "in_target")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.sum("w").alias("score"))
            .withColumn("keep", F.col("score") >= 0))


_DSIR_CTES = f"""tok AS (
  SELECT doc_id, lang,
         list_contains(list_filter(string_split(text, ' '),
                                   x -> x != ''),
                       '{_DSIR_TARGET_TOKEN}') AS in_target,
         substr(md5(t.tok), 1, 2) AS bucket
  FROM documents,
       UNNEST(list_filter(string_split(text, ' '), x -> x != ''))
         AS t(tok)
), q_cnt AS (
  SELECT bucket, COUNT(*) AS q_cnt FROM tok GROUP BY bucket
), p_cnt AS (
  SELECT bucket, COUNT(*) AS p_cnt FROM tok
  WHERE in_target GROUP BY bucket
), totals AS (
  SELECT COUNT(*) AS q_tot,
         SUM(CASE WHEN in_target THEN 1 ELSE 0 END) AS p_tot
  FROM tok
), weights AS (
  SELECT q.bucket,
         CAST(ROUND(1000000.0 * ln(
             CAST((COALESCE(p.p_cnt, 0) + 1)
                  * (tt.q_tot + {_LAPLACE_BUCKETS}) AS DOUBLE)
             / CAST((q.q_cnt + 1)
                    * (tt.p_tot + {_LAPLACE_BUCKETS}) AS DOUBLE)),
           0) AS BIGINT) AS w
  FROM q_cnt q LEFT JOIN p_cnt p USING (bucket), totals tt
), scored AS (
  SELECT t.doc_id, t.lang, t.in_target,
         COUNT(*) AS n_tok, SUM(w.w) AS score
  FROM tok t JOIN weights w USING (bucket)
  GROUP BY 1, 2, 3
)"""

DSIR_SQL = f"""
WITH {_DSIR_CTES}
SELECT lang, in_target, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN score >= 0 THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM scored
GROUP BY lang, in_target
"""


# --- weighted mixture interleave --------------------------------------

def mixture_interleave_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave of per-lang streams.

    The i-th doc of lang L (doc_id order) is emitted at virtual time
    (i-1) * (SCALE / w_L) — integer, since every weight divides
    SCALE.  Blocks are fixed virtual-time windows, so the block of a
    doc depends only on its rank WITHIN its lang: the plan needs no
    global ordering, no single-partition window, no driver state —
    each lang's ranks come from one per-lang window (or a two-pass
    prefix-sum at cluster scale) and everything after is Column
    algebra.  Output: composition of the first {n} blocks — the
    mixing schedule a curriculum/mixture trainer would consume."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w_rank = Window.partitionBy("lang").orderBy("doc_id")
    expr = None
    for lang, wgt in _MIX_WEIGHTS.items():
        step = F.lit(_VT_SCALE // wgt)
        expr = (F.when(F.col("lang") == lang, step) if expr is None
                else expr.when(F.col("lang") == lang, step))
    vt = ((F.row_number().over(w_rank) - 1).cast("long")
          * expr.otherwise(F.lit(_VT_SCALE)))
    blocks = (docs.withColumn("vt", vt)
              .withColumn("block", (F.col("vt") / _BLOCK_VT)
                          .cast("long"))
              .filter(F.col("block") < _N_BLOCKS))
    return (blocks.groupBy("block", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("vt").alias("first_vt"),
                 F.max("vt").alias("last_vt")))


def _mixture_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {_VT_SCALE // wgt}"
        for lang, wgt in _MIX_WEIGHTS.items())
    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
         (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
           * (CASE {cases} ELSE {_VT_SCALE} END) AS vt
  FROM documents
)
SELECT vt // {_BLOCK_VT} AS block, lang,
       COUNT(*) AS n_docs, MIN(vt) AS first_vt, MAX(vt) AS last_vt
FROM ranked
WHERE vt // {_BLOCK_VT} < {_N_BLOCKS}
GROUP BY 1, 2
"""


# --- composed incremental corpus refresh ------------------------------

_NEARDUP_DROP_BP = 5000   # drop batch docs >= 50% Jaccard vs corpus


def pipeline_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-refresh flagship: ingest a NEW batch of documents
    (doc_id % 10 == 0 stands in for today's crawl) against the
    standing corpus, running the full admission chain as ONE plan:

      1. exact dedup: md5 fingerprint — first-in-batch wins, and
         anything already in the corpus is dropped (anti join),
      2. near-dup dedup: the incremental LSH probe
         (queries/textops.py dedup_incremental) — batch docs whose
         best corpus match is >= 50% Jaccard are dropped; cost is
         |batch| x collision rate, never |corpus|^2,
      3. quality gate: the integer token/word-length rules,
      4. DSIR admission: log-likelihood score >= 0 (weights from
         dsir_scored; production trains them on the standing corpus
         — same plan shape either way),
      5. shard assignment: the same md5 shuffle key the full-build
         manifest uses, so appended docs land in their final shards.

    Output: the manifest DELTA — docs/tokens appended per shard —
    which is exactly what a trainer's loader needs to pick up the
    refreshed corpus.  Every stage is an equality join or Column
    algebra; nothing in the chain materializes between stages."""
    from connect_spark.queries.textops import dedup_incremental

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
    batch = fp.filter(F.col("doc_id") % 10 == 0)
    corp = fp.filter(F.col("doc_id") % 10 != 0)
    w = Window.partitionBy("fp").orderBy("doc_id")
    first_in_batch = (batch.withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") == 1).select("doc_id", "fp"))
    not_in_corpus = first_in_batch.join(
        corp.select("fp").distinct(), "fp", "left_anti").select("doc_id")
    near_dups = (dedup_incremental(spark, sf_dir)
                 .filter(F.col("jaccard_bp") >= _NEARDUP_DROP_BP)
                 .select(F.col("new_doc").alias("doc_id")))
    survivors = not_in_corpus.join(near_dups, "doc_id", "left_anti")

    t = docs.join(survivors, "doc_id").select(
        "doc_id", _toks().alias("toks")
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tok"),
        F.aggregate(F.transform("toks", lambda x: F.length(x)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("char_sum"))
    quality = t.filter(
        (F.col("n_tok") >= 5) & (F.col("n_tok") <= 5000)
        & (F.col("char_sum") <= 12 * F.col("n_tok"))
        & (F.col("char_sum") >= 2 * F.col("n_tok"))).select(
            "doc_id", "n_tok")
    admitted = quality.join(
        dsir_scored(docs).filter("keep").select("doc_id"), "doc_id")
    sharded = admitted.withColumn(
        "shard",
        F.substring(
            F.md5(F.concat(F.lit(_SHUFFLE_SALT),
                           F.col("doc_id").cast("string"))),
            1, N_SHARD_HEX))
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_added"),
                 F.sum("n_tok").alias("tokens_added")))


def _refresh_sql() -> str:
    from connect_spark.queries.textops import DEDUP_INCREMENTAL_SQL

    return f"""
WITH best AS (
{DEDUP_INCREMENTAL_SQL}
),
{_DSIR_CTES},
fp AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
),
first_in_batch AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM fp WHERE doc_id % 10 = 0
  ) WHERE rn = 1
),
not_in_corpus AS (
  SELECT b.doc_id FROM first_in_batch b
  ANTI JOIN (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 <> 0) c
    ON c.fp = b.fp
),
survivors AS (
  SELECT n.doc_id FROM not_in_corpus n
  ANTI JOIN (SELECT new_doc FROM best
             WHERE jaccard_bp >= {_NEARDUP_DROP_BP}) d
    ON d.new_doc = n.doc_id
),
qual AS (
  SELECT doc_id, n_tok FROM (
    SELECT s.doc_id,
           len(toks2)::BIGINT AS n_tok,
           COALESCE(list_sum(list_transform(toks2, x -> length(x))), 0)
             AS char_sum
    FROM (SELECT d.doc_id,
                 list_filter(string_split(d.text, ' '), x -> x != '')
                   AS toks2
          FROM documents d JOIN survivors sv ON sv.doc_id = d.doc_id) s
  ) WHERE n_tok BETWEEN 5 AND 5000
      AND char_sum <= 12 * n_tok AND char_sum >= 2 * n_tok
),
admitted AS (
  SELECT q.doc_id, q.n_tok FROM qual q
  JOIN scored s ON s.doc_id = q.doc_id AND s.score >= 0
)
SELECT substr(md5('{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)),
              1, {N_SHARD_HEX}) AS shard,
       COUNT(*) AS n_added, CAST(SUM(n_tok) AS BIGINT) AS tokens_added
FROM admitted
GROUP BY 1
"""


QUERIES = [
    QuerySpec("shard_shuffle_manifest", shard_shuffle_manifest,
              SHARD_MANIFEST_SQL),
    QuerySpec("pipeline_incremental_refresh", pipeline_incremental_refresh,
              _refresh_sql()),
    QuerySpec("dsir_importance_resample", dsir_importance_resample,
              DSIR_SQL),
    QuerySpec("mixture_interleave_blocks", mixture_interleave_blocks,
              _mixture_sql()),
]
