"""Training-data pipeline operators, round 8: substring-level exact
dedup, Stupid-Backoff LM quality scoring, and temperature-rebalanced
domain sampling — three ops a 100-TB pretraining pipeline runs after
the document-level dedup family (queries/textops.py) and the rule
filters (queries/llmops.py).

Scale notes:
- `dedup_substring_spans`: the distributed approximation of
  suffix-array substring dedup ("all but one occurrence of any
  duplicated K-token window is removed").  Candidate generation is an
  equality aggregation on a 128-bit window hash (two independent
  xxhash64 streams) — the shuffle carries (hash, doc, pos), never the
  window text; span merging and text reconstruction are per-doc
  window functions.  No driver-side state at any corpus size.
- `quality_stupid_backoff`: Stupid Backoff was DESIGNED for this
  execution model — counts are map-side-combined aggregations, and
  scoring is equality joins against vocabulary-sized count tables
  (Heaps' law: sublinear in the corpus), which AQE broadcasts when
  they fit.  All scoring is integer math (ppm units) so the Spark
  and DuckDB results are bit-identical — no float summation order
  anywhere.
- `sample_temperature_rebalance`: pure Column algebra over one scan +
  a 5-row broadcast join; the per-doc keep/drop decision is a
  deterministic arithmetic hash, so the sample is reproducible across
  engines, retries and partitionings (no rand(), no seed plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

# K-token window for substring dedup.  The published recipe uses 50
# BPE tokens; the synthetic docs average ~50 words, so 10 keeps the
# operator exercised at every SF.  Purely a parameter — the plan shape
# is identical at any K.
_K = 10


def _toks(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup: remove every occurrence but the
    FIRST (min doc_id, then min position) of any K-token window that
    appears at least twice in the corpus, merge the removed windows
    into maximal spans per doc, and emit the rewritten text.

    This is the training-data operator usually built on a corpus-wide
    suffix array; the K-token-window formulation is its distributed
    closed form: duplicated windows of length >= K are exactly the
    substrings a suffix-array pass with threshold K finds, and the
    per-doc union of removed windows is the removed span set.

    Plan: one shuffle keyed by the 128-bit window hash (count + argmin
    occurrence per window), one join back to occurrences on the same
    key, then per-doc window functions (gaps-and-islands) and one
    reassembly aggregation keyed by doc_id.  At 100 TB every stage is
    an equality shuffle on a derived key — no cartesian, no driver
    state; collision odds at 2^128 are negligible by construction.
    """
    return substring_spans(load_table(spark, sf_dir, "documents"), _K)


def substring_spans(docs: DataFrame, k: int) -> DataFrame:
    """Core of `dedup_substring_spans` over any (doc_id, text) frame."""
    _K = k
    # t is consumed three times (windows, token positions, final
    # n_tokens) — at 100 TB you persist it; here the triple scan keeps
    # the query stateless for the driver
    t = (docs.select("doc_id", _toks().alias("toks"))
         .filter(F.size("toks") >= _K)
         .select("doc_id", "toks",
                 F.size("toks").cast("long").alias("n_tokens")))

    # (doc_id, pos, h1, h2): 1-based window start + 128-bit hash
    wins = t.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - _K + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice("toks", i, _K)).alias("w")),
        )).alias("o"),
    ).select(
        "doc_id", F.col("o.pos").alias("pos"),
        F.xxhash64("o.w").alias("h1"),
        F.xxhash64(F.lit(1), "o.w").alias("h2"))
    # wins feeds BOTH the per-window argmin and the occurrence join
    # back; without materialization the K-token concat_ws + double
    # xxhash explode (the heavy stage — each window materializes a
    # K-token string) runs twice.  Eager localCheckpoint stores the 4
    # narrow longs per occurrence instead (r15 A/B: 3/3 interleaved
    # wins, ~4.1s -> ~3.4s; contrast dedup_incremental where the
    # recomputed shingle explode is cheaper than storing it and the
    # same trade measured a LOSS — each site is measured, not
    # blanket).
    wins = wins.localCheckpoint(eager=True)

    per_win = wins.groupBy("h1", "h2").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("canon"))
    rem = (wins.join(per_win.filter(F.col("n_occ") >= 2), ["h1", "h2"])
           .filter(~((F.col("doc_id") == F.col("canon.doc_id"))
                     & (F.col("pos") == F.col("canon.pos"))))
           .select("doc_id", F.col("pos").alias("s"),
                   (F.col("pos") + _K - 1).alias("e")))

    # merge overlapping-or-adjacent removed windows into islands
    wd = Window.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    isl = (rem.withColumn(
        "ni", F.when(prev_max.isNull()
                     | (F.col("s") > prev_max + 1), 1).otherwise(0))
        .withColumn("iid", F.sum("ni").over(
            wd.rowsBetween(Window.unboundedPreceding, 0))))
    islands = isl.groupBy("doc_id", "iid").agg(
        F.min("s").alias("s"), F.max("e").alias("e"))
    stats = islands.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))

    # rewrite: tokens at positions covered by any island are dropped
    covered = islands.select(
        "doc_id", F.explode(F.sequence("s", "e")).alias("p"))
    tok_pos = t.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = (tok_pos.join(covered, ["doc_id", "p"], "left_anti")
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"])).alias("deduped_text")))

    return (stats
            .join(t.select("doc_id", "n_tokens"), "doc_id")
            .join(kept, "doc_id", "left")
            .select("doc_id", "n_tokens", "dup_tokens", "n_spans",
                    F.coalesce("deduped_text", F.lit(""))
                    .alias("deduped_text")))


_SUBSTRING_CTES = f"""t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), tt AS (
  SELECT doc_id, toks, len(toks) AS n_tokens FROM t
  WHERE len(toks) >= {_K}
), occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i:i+{_K}-1], ' ') AS w
  FROM tt, LATERAL unnest(generate_series(1, n_tokens - {_K} + 1)) g(i)
), marked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY w) AS n_occ
  FROM occ
), rem AS (
  SELECT doc_id, pos AS s, pos + {_K} - 1 AS e
  FROM marked WHERE n_occ >= 2 AND rn > 1
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM rem
), isl2 AS (
  SELECT doc_id, s, e,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS UNBOUNDED PRECEDING) AS iid
  FROM isl
), islands AS (
  SELECT doc_id, iid, MIN(s) AS s, MAX(e) AS e
  FROM isl2 GROUP BY doc_id, iid
), stats AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         SUM(e - s + 1) AS dup_tokens
  FROM islands GROUP BY doc_id
), cov AS (
  SELECT DISTINCT doc_id, g.p
  FROM islands, LATERAL unnest(generate_series(s, e)) g(p)
), tok_pos AS (
  SELECT doc_id, i AS p, toks[i] AS tok
  FROM tt, LATERAL unnest(generate_series(1, n_tokens)) g(i)
), kept AS (
  SELECT tp.doc_id,
         string_agg(tp.tok, ' ' ORDER BY tp.p) AS deduped_text
  FROM tok_pos tp
  ANTI JOIN cov c ON c.doc_id = tp.doc_id AND c.p = tp.p
  GROUP BY tp.doc_id
)"""

SUBSTRING_SQL = f"""
WITH {{_SUBSTRING_CTES}}
SELECT s.doc_id, tt.n_tokens,
       CAST(s.dup_tokens AS BIGINT) AS dup_tokens,
       CAST(s.n_spans AS BIGINT) AS n_spans,
       COALESCE(k.deduped_text, '') AS deduped_text
FROM stats s
JOIN tt USING (doc_id)
LEFT JOIN kept k ON k.doc_id = s.doc_id
""".format(_SUBSTRING_CTES=_SUBSTRING_CTES)


def quality_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter with a Stupid Backoff trigram
    model — the smoothing built for distributed count-based training
    ("Large Language Models in Machine Translation", Brants et al.,
    EMNLP 2007): no discounting, no normalization, just relative
    frequencies with a fixed 0.4 backoff factor, which is why the
    whole model is three groupBy counts.

    Train on the even-doc_id half of the corpus, score the odd half
    (training on the scored text itself would make every trigram seen
    and never exercise backoff).  Score per trigram, in exact ppm
    integer math (both engines compute identical BIGINTs — no float
    summation order anywhere):

        S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)        if trigram seen
                      = 0.4 * c(w2w3)/c(w2)      elif bigram seen
                      = 0.16 * c(w3)/N           elif unigram seen
                      = 0                        else (OOV)

    Plan: three map-side-combined count aggs over ONE pass of the
    train half; scoring is four equality left-joins against
    vocabulary-sized tables (Heaps' law — AQE broadcasts them when
    they fit) plus a one-row N broadcast; one final doc_id agg."""
    return stupid_backoff(load_table(spark, sf_dir, "documents"))


def stupid_backoff(docs: DataFrame) -> DataFrame:
    """Core of `quality_stupid_backoff` over any (doc_id, text) frame:
    trains on even doc_ids, scores odd ones."""
    toks = _toks()
    base = docs.select("doc_id", toks.alias("toks"))
    train = base.filter(F.col("doc_id") % 2 == 0)
    score = base.filter(F.col("doc_id") % 2 == 1).filter(
        F.size("toks") >= 3)

    uni = (train.select(F.explode("toks").alias("g"))
           .groupBy("g").agg(F.count(F.lit(1)).alias("c1")))
    n_tot = uni.agg(F.sum("c1").alias("n_tot"))

    def grams(n):
        return F.transform(
            F.sequence(F.lit(1), F.size("toks") - n + 1),
            lambda i: F.concat_ws(" ", F.slice("toks", i, n)))

    bi = (train.filter(F.size("toks") >= 2)
          .select(F.explode(grams(2)).alias("g"))
          .groupBy("g").agg(F.count(F.lit(1)).alias("c2")))
    tri = (train.filter(F.size("toks") >= 3)
           .select(F.explode(grams(3)).alias("g"))
           .groupBy("g").agg(F.count(F.lit(1)).alias("c3")))

    ex = score.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice("toks", i, 3)).alias("tri"),
                F.concat_ws(" ", F.slice("toks", i, 2)).alias("ctx2"),
                F.concat_ws(" ", F.slice("toks", i + 1, 2)).alias("la2"),
                F.get("toks", i).alias("w2"),       # 0-based get: i -> token i+1
                F.get("toks", i + 1).alias("w3")),
        )).alias("g"),
    ).select("doc_id", "g.tri", "g.ctx2", "g.la2", "g.w2", "g.w3")

    j = (ex
         .join(tri.withColumnRenamed("g", "tri"), "tri", "left")
         .join(bi.withColumnRenamed("g", "ctx2")
               .withColumnRenamed("c2", "c_ctx"), "ctx2", "left")
         .join(bi.withColumnRenamed("g", "la2")
               .withColumnRenamed("c2", "c_la2"), "la2", "left")
         .join(uni.withColumnRenamed("g", "w2")
               .withColumnRenamed("c1", "c_w2"), "w2", "left")
         .join(uni.withColumnRenamed("g", "w3")
               .withColumnRenamed("c1", "c_w3"), "w3", "left")
         .crossJoin(F.broadcast(n_tot)))

    scored = j.withColumn(
        "level",
        F.when(F.col("c3").isNotNull(), F.lit(0))
        .when(F.col("c_la2").isNotNull(), F.lit(1))
        .when(F.col("c_w3").isNotNull(), F.lit(2))
        .otherwise(F.lit(3)),
    ).withColumn(
        "score_ppm",
        F.when(F.col("level") == 0,
               F.expr(f"(c3 * {1_000_000}) div c_ctx"))
        .when(F.col("level") == 1,
              F.expr(f"((c_la2 * {1_000_000}) div c_w2) * 2 div 5"))
        .when(F.col("level") == 2,
              F.expr(f"((c_w3 * {1_000_000}) div n_tot) * 4 div 25"))
        .otherwise(F.lit(0)),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("score_ppm").alias("sum_score_ppm"),
        F.sum((F.col("level") == 0).cast("long")).alias("n_tri_hit"),
        F.sum((F.col("level") == 1).cast("long")).alias("n_bi_backoff"),
        F.sum((F.col("level") == 2).cast("long")).alias("n_uni_backoff"),
        F.sum((F.col("level") == 3).cast("long")).alias("n_oov"),
    )


STUPID_BACKOFF_SQL = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), train AS (
  SELECT * FROM base WHERE doc_id % 2 = 0
), uni AS (
  SELECT g, COUNT(*) AS c1 FROM (
    SELECT unnest(toks) AS g FROM train
  ) GROUP BY g
), n_tot AS (
  SELECT SUM(c1) AS n_tot FROM uni
), bi AS (
  SELECT g, COUNT(*) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i+1])) AS g
    FROM train WHERE len(toks) >= 2
  ) GROUP BY g
), tri AS (
  SELECT g, COUNT(*) AS c3 FROM (
    SELECT unnest(list_transform(range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
    FROM train WHERE len(toks) >= 3
  ) GROUP BY g
), ex AS (
  SELECT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tri,
         toks[i] || ' ' || toks[i+1] AS ctx2,
         toks[i+1] || ' ' || toks[i+2] AS la2,
         toks[i+1] AS w2, toks[i+2] AS w3
  FROM base, LATERAL unnest(generate_series(1, len(toks) - 2)) g(i)
  WHERE doc_id % 2 = 1 AND len(toks) >= 3
), scored AS (
  SELECT e.doc_id,
         CASE WHEN t.c3 IS NOT NULL THEN 0
              WHEN b2.c2 IS NOT NULL THEN 1
              WHEN u3.c1 IS NOT NULL THEN 2
              ELSE 3 END AS level,
         CASE WHEN t.c3 IS NOT NULL
                THEN (t.c3 * 1000000) // bc.c2
              WHEN b2.c2 IS NOT NULL
                THEN ((b2.c2 * 1000000) // u2.c1) * 2 // 5
              WHEN u3.c1 IS NOT NULL
                THEN ((u3.c1 * 1000000) // n.n_tot) * 4 // 25
              ELSE 0 END AS score_ppm
  FROM ex e
  LEFT JOIN tri t ON t.g = e.tri
  LEFT JOIN bi bc ON bc.g = e.ctx2
  LEFT JOIN bi b2 ON b2.g = e.la2
  LEFT JOIN uni u2 ON u2.g = e.w2
  LEFT JOIN uni u3 ON u3.g = e.w3
  CROSS JOIN n_tot n
)
SELECT doc_id,
       COUNT(*) AS n_trigrams,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm,
       CAST(SUM(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tri_hit,
       CAST(SUM(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bi_backoff,
       CAST(SUM(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_uni_backoff,
       CAST(SUM(CASE WHEN level = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM scored
GROUP BY doc_id
"""


def sample_temperature_rebalance(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Temperature-rebalanced domain sampling — the multilingual-
    pretraining recipe (sample language l with probability ∝ c_l^(1/T))
    in its per-domain-rate form: keep each doc of domain l with rate
    min(1, A/sqrt(c_l)), which downweights head domains by exactly the
    T=2 temperature exponent without any cross-domain normalization
    term (and therefore without any float-summation-order hazard).

    The keep/drop decision is a DETERMINISTIC arithmetic hash — one
    MINSTD/Lehmer step ((doc_id mod M) * 48271 mod M, M = 2^31-1,
    Park-Miller) compared against the rate — reproducible across
    engines, retries and partitionings, unlike rand(seed) which is
    partitioning-dependent in Spark.  The doc_id is reduced mod M
    BEFORE the multiply so the product never exceeds 2^31 * 48271 ~
    1.04e14: safe int64 at ANY id magnitude (a Knuth 2654435761
    multiply overflows int64 once ids pass ~3.5e9 — found by the 16x
    salted-replica scale run, where ids carry a 1e10 stride).  Every
    arithmetic op involved (integer multiply/mod, sqrt, divide,
    compare) is exact or correctly-rounded IEEE in both engines, so
    the sampled SET is bit-identical.

    Plan: one count agg over the lang column (a handful of groups —
    AQE broadcasts the tiny aggregate side on its own, no hint
    needed), one join back, one filter, one final agg — a single scan
    of the corpus regardless of size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    rate = F.least(F.lit(1.0), F.lit(8.0) / F.sqrt(F.col("c")))
    m = F.lit(2147483647).cast("long")
    u = (((F.col("doc_id") % m) * F.lit(48271).cast("long")) % m) \
        / F.lit(2147483647.0)
    return (docs.join(counts, "lang")
            .withColumn("keep", (u < rate).cast("int"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("keep").alias("n_sampled"),
                 F.sum(F.col("keep") * F.col("n_chars"))
                 .alias("sampled_chars")))


TEMPERATURE_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN
              (((d.doc_id % 2147483647) * 48271) % 2147483647)
                / 2147483647.0
              < LEAST(1.0, 8.0 / sqrt(c.c))
            THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN
              (((d.doc_id % 2147483647) * 48271) % 2147483647)
                / 2147483647.0
              < LEAST(1.0, 8.0 / sqrt(c.c))
            THEN d.n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
FROM documents d JOIN counts c USING (lang)
GROUP BY d.lang
"""




def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-corpus endgame — the round-8 dataprep
    operators running as ONE pipeline, the way a real 100-TB data
    build chains them:

      1. substring dedup REWRITE: every doc's text with duplicated
         K-token spans removed (all-but-first occurrence),
      2. quality gate: 5 <= tokens <= 5000 and mean word length in
         [2, 12] — integer compares only (char_sum vs k*n_tok), no
         float thresholds,
      3. temperature-rebalanced sampling per lang over the quality
         survivors (rates derive from SURVIVOR counts — the stage
         order matters and the oracle pins it),
      4. greedy sequential packing into 512-token bins per lang
         (cumulative-sum bucketing, the pack_sequences contract).

    Output: one row per lang with the stage-by-stage funnel
    (n_docs -> n_quality -> n_sampled) plus bin count and packed
    token total.  The funnel rides ONE lang-partitioned pass: the
    quality gate and the keep decision are flags, the survivor count
    feeding the sampling rate is an unordered window aggregate over
    the same partition the ordered packing window already needs, and
    every funnel stat comes from a single final groupBy — the r14
    form re-evaluated the substring-dedup pipeline in four separate
    branches (plan audit r15: 50 parquet scans / 42 exchanges / 96
    join nodes collapsed to 14 / 12 / 24; opt guide §2.4 "compute
    shared subtrees once").  Flag semantics are exact: keep =
    is_quality AND u < rate(c) where c counts quality survivors per
    lang, and the packing cumsum sums n_tok over kept predecessors
    only — identical rows to filtering first.  At 100 TB the packing
    window runs per (lang, shard) exactly like pack_sequences.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = substring_spans(docs, _K).select("doc_id", "deduped_text")
    rew = (docs.join(spans, "doc_id", "left")
           .select("doc_id", "lang",
                   F.coalesce("deduped_text", F.col("text"))
                   .alias("text")))
    t = rew.select(
        "doc_id", "lang", _toks().alias("toks")
    ).select(
        "doc_id", "lang",
        F.size("toks").cast("long").alias("n_tok"),
        F.aggregate(F.transform("toks", lambda x: F.length(x)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("char_sum"))
    is_q = ((F.col("n_tok") >= 5) & (F.col("n_tok") <= 5000)
            & (F.col("char_sum") <= 12 * F.col("n_tok"))
            & (F.col("char_sum") >= 2 * F.col("n_tok")))
    flag = t.withColumn("is_q", is_q)
    wl = Window.partitionBy("lang")
    wd = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0)
    c = F.sum(F.col("is_q").cast("long")).over(wl)
    m = F.lit(2147483647).cast("long")
    u = (((F.col("doc_id") % m) * F.lit(48271).cast("long")) % m) \
        / F.lit(2147483647.0)
    rate = F.least(F.lit(1.0), F.lit(8.0) / F.sqrt(c))
    staged = flag.withColumn("keep", F.col("is_q") & (u < rate))
    packed = staged.withColumn(
        "cum", F.sum(F.when(F.col("keep"), F.col("n_tok"))).over(wd))
    bin_ = F.expr("(cum - n_tok) div 512")
    return (packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_q").cast("long")).alias("n_quality"),
        F.sum(F.col("keep").cast("long")).alias("n_sampled"),
        F.coalesce(F.max(F.when(F.col("keep"), bin_)) + 1, F.lit(0))
        .alias("n_bins"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_tok"))),
                   F.lit(0)).alias("packed_tokens")))


PIPELINE_PRETRAIN_SQL = f"""
WITH {{_SUBSTRING_CTES}},
rew AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN s.doc_id IS NOT NULL
              THEN COALESCE(k2.deduped_text, '')
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN stats s ON s.doc_id = d.doc_id
  LEFT JOIN kept k2 ON k2.doc_id = d.doc_id
), t3 AS (
  SELECT doc_id, lang,
         len(toks2) AS n_tok,
         COALESCE(list_sum(list_transform(toks2, x -> length(x))), 0)
           AS char_sum
  FROM (SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x != '')
                 AS toks2
        FROM rew)
), quality AS (
  SELECT * FROM t3
  WHERE n_tok BETWEEN 5 AND 5000
    AND char_sum <= 12 * n_tok AND char_sum >= 2 * n_tok
), counts AS (
  SELECT lang, COUNT(*) AS c FROM quality GROUP BY lang
), samp AS (
  SELECT q.* FROM quality q JOIN counts c USING (lang)
  WHERE (((q.doc_id % 2147483647) * 48271) % 2147483647)
          / 2147483647.0
        < LEAST(1.0, 8.0 / sqrt(c.c))
), packed AS (
  SELECT lang, doc_id, n_tok,
         (SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tok) // 512
           AS bin
  FROM samp
), base AS (
  SELECT lang, COUNT(*) AS n_docs FROM rew GROUP BY lang
), cq AS (
  SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang
), pb AS (
  SELECT lang, COUNT(*) AS n_sampled,
         MAX(bin) + 1 AS n_bins,
         SUM(n_tok) AS packed_tokens
  FROM packed GROUP BY lang
)
SELECT b.lang, b.n_docs,
       CAST(COALESCE(cq.n_quality, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(pb.n_sampled, 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(pb.n_bins, 0) AS BIGINT) AS n_bins,
       CAST(COALESCE(pb.packed_tokens, 0) AS BIGINT) AS packed_tokens
FROM base b
LEFT JOIN cq ON cq.lang = b.lang
LEFT JOIN pb ON pb.lang = b.lang
""".format(_SUBSTRING_CTES=_SUBSTRING_CTES)


def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (the SemDeDup recipe shape): resolve embedding
    near-dup PAIRS (sign-band LSH candidates -> exact cosine >= 0.4,
    queries/vectors.py) into connected components and keep ONE vector
    per semantic cluster (the min vec_id) plus every vector that never
    near-dupped — turning pair detection into the pruned corpus the
    paper's clustering stage produces.

    Scale: pair generation is the measured-linear LSH pipeline;
    component resolution is O(log diameter) rounds of equality joins
    (operators/cluster.py); the final keep is a left join of the
    corpus against the cluster table, which holds only docs that
    appeared in a pair (AQE broadcasts it at real scale)."""
    from connect_spark.operators.cluster import resolve_clusters
    from connect_spark.queries.vectors import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(spark, sf_dir)
    clusters = resolve_clusters(pairs, "va", "vb").select(
        F.col("doc_id").alias("vec_id"), "cluster_id",
        "is_representative", "cluster_size")
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label")
    return (vecs.join(clusters, "vec_id", "left")
            .filter(F.coalesce("is_representative", F.lit(1)) == 1)
            .select(
                "vec_id", "label",
                F.when(F.col("cluster_id").isNotNull(),
                       "representative").otherwise("unique")
                .alias("kept_reason"),
                F.coalesce("cluster_size", F.lit(1))
                .cast("long").alias("cluster_size")))


def _semantic_keep_sql() -> str:
    from connect_spark.queries.vectors import NEARDUP_SQL
    return f"""
WITH RECURSIVE pairs AS (
  {NEARDUP_SQL}
), edges AS (
  SELECT va AS a, vb AS b FROM pairs
  UNION
  SELECT vb AS a, va AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS node FROM edges
), reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
), comp AS (
  SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
), sz AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT v.vec_id, v.label,
       CASE WHEN c.node IS NOT NULL THEN 'representative'
            ELSE 'unique' END AS kept_reason,
       CAST(COALESCE(sz.cluster_size, 1) AS BIGINT) AS cluster_size
FROM embeddings v
LEFT JOIN comp c ON c.node = v.vec_id
LEFT JOIN sz ON sz.cluster_id = c.cluster_id
WHERE c.node IS NULL OR c.node = c.cluster_id
"""


def quality_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    every scored document by its language-model score and cut each
    language's pool into head / middle / tail terciles — the buckets
    CCNet materializes so a trainer can choose its quality slice.
    Composes on quality_stupid_backoff: the per-doc score is the
    integer mean micro-nat-ish ppm (sum_score_ppm div n_trigrams), so
    ordering is exact; ntile(3) over (score desc, doc_id) is a total
    order both engines split identically (SQL-standard larger-groups-
    first).  One window per language over the scored pool — the same
    per-lang rank shape as mixture_interleave; at 100 TB the
    two-pass prefix-sum rank replaces the window, per the
    queries/datamix.py scale note."""
    from pyspark.sql import Window

    scored = quality_stupid_backoff(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = scored.join(docs, "doc_id").withColumn(
        "mean_ppm", F.expr("sum_score_ppm div n_trigrams"))
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_ppm").desc(), F.col("doc_id"))
    bucketed = joined.withColumn("bucket", F.ntile(3).over(w))
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mean_ppm").alias("sum_mean_ppm"),
        F.max("mean_ppm").alias("best_ppm"),
        F.min("mean_ppm").alias("worst_ppm"),
    )


PPL_BUCKETS_SQL = f"""
WITH scored_docs AS ({STUPID_BACKOFF_SQL}
), joined AS (
  SELECT s.doc_id, d.lang, s.sum_score_ppm // s.n_trigrams AS mean_ppm
  FROM scored_docs s JOIN documents d ON d.doc_id = s.doc_id
), bucketed AS (
  SELECT lang, mean_ppm,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY mean_ppm DESC, doc_id) AS bucket
  FROM joined
)
SELECT lang, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
       CAST(SUM(mean_ppm) AS BIGINT) AS sum_mean_ppm,
       CAST(MAX(mean_ppm) AS BIGINT) AS best_ppm,
       CAST(MIN(mean_ppm) AS BIGINT) AS worst_ppm
FROM bucketed GROUP BY lang, bucket
"""


def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card / datasheet rollup every corpus release ships:
    per language, in ONE scan — document and token and char volumes,
    source diversity, the exact-duplicate rate (docs minus distinct
    fingerprints), and the short-doc fraction in basis points.  All
    integer outputs; at 100 TB this is a single map-side-combined
    groupBy over a handful of language groups, the cheapest query in
    the training-data family and the one run most often."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    enriched = docs.select(
        "lang", "source",
        F.md5(F.lower(F.trim("text"))).alias("fp"),
        F.size(toks).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_char"),
    )
    return enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("token_total"),
        F.sum("n_char").alias("char_total"),
        F.countDistinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
        F.expr("CAST(sum(CASE WHEN n_tok < 10 THEN 1 ELSE 0 END) "
               "* 10000 div count(1) AS BIGINT)").alias("short_bp"),
    )


DATASET_CARD_SQL = """
WITH d AS (
  SELECT lang, source, md5(lower(trim(text))) AS fp,
         len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
           AS n_tok,
         length(text)::BIGINT AS n_char  -- chars, matching Spark length()
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS token_total,
       CAST(SUM(n_char) AS BIGINT) AS char_total,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
       CAST(SUM(CASE WHEN n_tok < 10 THEN 1 ELSE 0 END) * 10000
            // COUNT(*) AS BIGINT) AS short_bp
FROM d GROUP BY lang
"""


QUERIES = [
    QuerySpec("dataset_card_stats", dataset_card_stats,
              DATASET_CARD_SQL),
    QuerySpec("dedup_substring_spans", dedup_substring_spans,
              SUBSTRING_SQL),
    QuerySpec("pipeline_pretrain_corpus", pipeline_pretrain_corpus,
              PIPELINE_PRETRAIN_SQL),
    QuerySpec("dedup_semantic_keep", dedup_semantic_keep,
              _semantic_keep_sql()),
    QuerySpec("quality_ppl_buckets", quality_ppl_buckets,
              PPL_BUCKETS_SQL),
    QuerySpec("quality_stupid_backoff", quality_stupid_backoff,
              STUPID_BACKOFF_SQL),
    QuerySpec("sample_temperature_rebalance",
              sample_temperature_rebalance, TEMPERATURE_SQL),
]
