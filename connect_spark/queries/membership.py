"""Scalable set-membership: a Bloom filter built AND probed as
DataFrame aggregations — the standard way a 100-TB ingest decides
"have we seen this document before?" without joining the new batch
against the full corpus.

Reference scope note: the reference engine ships `dedupe` (exact,
cache-backed — internal/impl/pure/processor_dedupe.go) whose state is
a key-value cache; this module is the probabilistic, constant-memory
form of the same question, part of the beyond-reference training-data
family (a batch-dedup front-end: Bloom says "definitely new" for the
overwhelming majority, and only maybe-hits go to the exact path).

Algorithm (engine-exact, md5-based like queries/textops.py):
- fingerprint fp = md5(lower(trim(text))) — the repo's exact-dedup key;
- k = 4 hash positions from disjoint 16-bit windows of one salted
  digest md5('bloom:' || fp) (independent bits of one md5, the same
  digest-splitting trick as the MinHash permutations);
- filter of m = 65536 bit positions packed 62 per int64 word (1058
  words; bits 62-63 stay clear so no engine's checked shift or sign
  bit is ever exercised): per corpus fp, explode its 4 (word,
  bitmask) pairs and bit_or-aggregate per word;
- probe: each candidate's 4 (word, mask) pairs left-join the filter
  (~1k rows, broadcast); member-flagged iff all 4 bits are set.

Spark shape at 100 TB: the build is one map-side-combined groupBy
with AT MOST m/64 groups (the shuffle carries <= 1024 rows per
partition regardless of corpus size); the probe never shuffles the
batch — it joins a broadcast table smaller than a parquet footer.
Sizing: false-positive rate = (1 - e^(-kn/m))^k; production sizes m
at ~10 bits per distinct fingerprint (fp ~ 0.8%) and shards the
filter by fp-prefix when m outgrows a broadcast (each shard is an
independent filter over a disjoint key range, probed after a
partition-pruning prefix filter — no all-to-all anywhere).

The registered query probes the full documents table against a
corpus of doc_id % 3 != 0 and reports per-lang: probed count,
bloom-flagged count, true-member count (exact fp join), the
false-positive remainder, and a flagged-id checksum.  The DuckDB
oracle rebuilds the identical filter (hex windows decoded with a
strpos polynomial), so the bit array matches word-for-word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

K_HASH = 4
M_BITS = 65536          # positions; packed 62 per int64 word (1058 words)
_SALT = "bloom:"


def _fp(col: str = "text"):
    return F.md5(F.lower(F.trim(F.col(col))))


def _positions(df: DataFrame) -> DataFrame:
    """Explode each fp row into K_HASH (word, mask) rows.  Position j
    is the j-th 16-bit window of md5('bloom:' || fp) — 16 bits index
    exactly m = 65536, so no modulo is needed."""
    h = F.md5(F.concat(F.lit(_SALT), F.col("fp")))
    df = df.withColumn("h", h).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(K_HASH - 1))).alias("j"),
    )
    pos = F.conv(
        F.substring("h", F.col("j") * 4 + 1, 4), 16, 10
    ).cast("long")
    return (
        df.withColumn("pos", pos)
        # 62 payload bits per word: bit 63 would overflow DuckDB's
        # checked shift and bit 62 the sign — the packing is layout,
        # not semantics, so the word just holds fewer positions
        .withColumn("word", (F.col("pos") / 62).cast("long"))
        .withColumn(
            "mask",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))"),
        )
        .drop("h", "pos")
    )


def bloom_membership_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _fp().alias("fp"))
    corpus_fp = docs.filter(F.col("doc_id") % 3 != 0).select("fp").distinct()

    # <= m/62 rows by construction (control-plane-sized at ANY corpus
    # size); eagerly materialized because the probe below references
    # it K_HASH times — without the checkpoint each reference would
    # replicate the whole corpus-distinct + position subtree (the
    # aliasing Project sits under the BroadcastExchange, so the
    # exchange-reuse rule cannot dedupe them)
    bloom = (
        _positions(corpus_fp)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("words"))
        .localCheckpoint(eager=True)
    )

    # no broadcast HINTS anywhere: the filter aggregate is <= m/62
    # rows by construction, so AQE's size stats broadcast it on their
    # own; `present` (distinct corpus fps) GROWS with sf — hinting it
    # would OOM the build side at 100 TB (the plan guard catches
    # exactly this), so it stays an equality shuffle join.
    #
    # Probe shape (r16, guide §2.4): the r15 probe exploded every doc
    # into K_HASH (word, mask) rows and re-grouped them by
    # (doc_id, lang, fp) to AND the bits — a Generate x4 plus a full
    # per-doc hash-agg exchange.  The K positions are a FIXED, tiny
    # fan-out, so the probe now carries them as K column pairs and
    # takes K broadcast joins against the <= m/62-row filter (one
    # BroadcastExchange, reused K-1 times): the doc stream stays
    # narrow end-to-end and the only remaining shuffles are the
    # membership join and the final per-lang aggregate.  flagged is
    # the same all-K-bits-set predicate; doc_id is unique per row
    # (table key), so dropping the regroup leaves the row multiset
    # identical — pinned by the oracle at every SF.
    p = docs.select("doc_id", "lang", "fp").withColumn(
        "h", F.md5(F.concat(F.lit(_SALT), F.col("fp"))))
    for j in range(K_HASH):
        p = p.withColumn(
            f"p{j}",
            F.conv(F.substring("h", j * 4 + 1, 4), 16, 10).cast("long"))
        p = p.withColumn(f"w{j}", (F.col(f"p{j}") / 62).cast("long"))
        p = p.withColumn(
            f"m{j}",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p{j} % 62 AS INT))"))
    bit_ok = []
    for j in range(K_HASH):
        p = p.join(
            bloom.select(F.col("word").alias(f"w{j}"),
                         F.col("words").alias(f"words{j}")),
            f"w{j}", "left")
        bit_ok.append(
            F.col(f"words{j}").isNotNull()
            & (F.col(f"words{j}").bitwiseAND(F.col(f"m{j}")) != 0))
    all_set = bit_ok[0]
    for c in bit_ok[1:]:
        all_set = all_set & c
    hits = p.select(
        "doc_id", "lang", "fp",
        F.when(all_set, F.lit(1)).otherwise(F.lit(0)).alias("flagged"))
    present = corpus_fp.withColumn("present", F.lit(1))
    joined = hits.join(present, "fp", "left").fillna(
        0, subset=["present"])
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("flagged").alias("n_flagged"),
        F.sum("present").alias("n_present"),
        F.sum(F.col("flagged") - F.col("present")).alias("n_false_pos"),
        F.sum(F.col("doc_id") * F.col("flagged")).alias("flagged_checksum"),
    )


def _hex16(expr: str, off: int) -> str:
    """DuckDB: decode 4 hex chars of `expr` starting at 1-based `off`
    into a BIGINT (the '0x'-literal cast idiom the KMV/CM/HLL oracles
    share)."""
    return f"CAST(('0x' || substr({expr}, {off}, 4)) AS BIGINT)"


def _bloom_sql() -> str:
    h = f"md5('{_SALT}' || fp)"
    pos_list = ", ".join(_hex16(h, 4 * j + 1) for j in range(K_HASH))
    return f"""
WITH d AS (
  SELECT doc_id, lang, md5(lower(trim(text))) AS fp FROM documents
), corpus AS (
  SELECT DISTINCT fp FROM d WHERE doc_id % 3 != 0
), cpos AS (
  SELECT fp, unnest([{pos_list}]) AS pos FROM corpus
), bloom AS (
  SELECT pos // 62 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS words
  FROM cpos GROUP BY pos // 62
), ppos AS (
  SELECT doc_id, lang, fp, unnest([{pos_list}]) AS pos FROM d
), hits AS (
  SELECT p.doc_id, p.lang, p.fp,
         CASE WHEN SUM(CASE WHEN b.words IS NOT NULL AND
                     (b.words & (CAST(1 AS BIGINT) << CAST(p.pos % 62 AS INT)))
                       != 0
                     THEN 1 ELSE 0 END) = {K_HASH}
              THEN 1 ELSE 0 END AS flagged
  FROM ppos p LEFT JOIN bloom b ON b.word = p.pos // 62
  GROUP BY p.doc_id, p.lang, p.fp
), joined AS (
  SELECT h.lang, h.doc_id, h.flagged,
         CASE WHEN c.fp IS NULL THEN 0 ELSE 1 END AS present
  FROM hits h LEFT JOIN corpus c ON c.fp = h.fp
)
SELECT lang, COUNT(*) AS n_probed,
       CAST(SUM(flagged) AS BIGINT) AS n_flagged,
       CAST(SUM(present) AS BIGINT) AS n_present,
       CAST(SUM(flagged - present) AS BIGINT) AS n_false_pos,
       CAST(SUM(doc_id * flagged) AS BIGINT) AS flagged_checksum
FROM joined GROUP BY lang
"""


BLOOM_SQL = _bloom_sql()


QUERIES = [
    QuerySpec("bloom_membership_probe", bloom_membership_probe, BLOOM_SQL,
              headline=True),
]
