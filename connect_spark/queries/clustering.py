"""Distributed clustering over the embedding table: Lloyd's k-means
re-expressed as DataFrame iterations, the missing primitive under
SemDeDup-style semantic curation (cluster first, then dedup within
clusters) and IVF index training (queries/vectors.py's `ann_ivf_*`
consume FIXED centroids; this module is where those centroids come
from).

Reference scope note: the reference engine (redpanda-data/connect) has
no clustering processor — its nearest analogue is the embedding
pipelines around `internal/impl/openai/openai_embeddings_processor.go`
that produce vectors for an external store to index.  This module is
part of the beyond-reference training-data family the brief asks for.

Design for engine-exact cross-checking (the repo's oracle discipline):

- **Quantized k-means.** Coordinates are quantized once up front to
  integers q_i = floor(x_i * 1000) (int16-range codes — quantized
  k-means is standard practice at scale, cf. SQ8 in
  `ann_topk_quantized`).  Every distance is then EXACT int64 math:
  d2 = sum((q_i - c_i)^2) <= 64 * 2000^2 ~ 2.6e8, no float
  summation-order anywhere in the hot path.
- **Integer centroids.** The update step is an element-wise
  floor-mean: m_i = floor(sum(q_i) / n).  Integer sums are
  order-independent; the one division is IEEE-exact-enough to share
  across engines because sum and n are integers exactly representable
  in double and a correctly-rounded quotient can only land within one
  ulp of an integer when the true quotient IS that integer (the gap
  to the nearest other integer is >= 1/n >> ulp), so floor() agrees
  bit-for-bit between Spark and DuckDB.
- **Deterministic everything.** Init centroids are the K lowest
  vec_ids (k-means|| adds randomness correctness can't pin);
  assignment ties break by centroid id; empty clusters keep their
  previous centroid.

Spark shape (MLlib's own KMeans loop, declaratively):
- one scan derives the quantized vectors;
- per iteration: broadcast the K x 64 centroid table, min-by-(d2, cid)
  assignment via a vec_id window, posexplode + groupBy(cid, pos) for
  the sums, and a K*64-row collect (control-plane-sized: 512 longs)
  to rebuild the next centroid table on the driver — exactly the
  centers-to-driver step MLlib performs each Lloyd round;
- the returned DataFrame is the final assignment's per-cluster
  rollup, so the driver's collect re-runs only the last assignment.

At 100 TB: the per-iteration shuffle carries (cid, pos, partial-sum)
after map-side combine — K*64 groups regardless of corpus size; the
corpus-side work is embarrassingly parallel scoring against a
broadcast table.  Production would persist the quantized vectors once
(they are 4-8x smaller than the float input) instead of re-deriving
them per iteration; at this test scale the re-scan is cheaper than
the cache churn, and the plan is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

K = 8            # clusters
ITERS = 3        # Lloyd update rounds (a final assignment follows)
DIMS = 64
Q_SCALE = 1000   # quantization grid: q = floor(x * 1000)

_CENT_SCHEMA = T.StructType([
    T.StructField("cid", T.LongType()),
    T.StructField("cq", T.ArrayType(T.LongType())),
])


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings quantized to the integer grid (array<long>)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * Q_SCALE).cast("long"),
        ).alias("q"),
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Min-(d2, cid) assignment against a broadcast centroid table.
    d2 is exact int64; ties break by centroid id (deterministic)."""
    d2 = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        vecs.join(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "cid", "d2")
    )


def _update(spark: SparkSession, assigned: DataFrame,
            prev: list[Row]) -> DataFrame:
    """Floor-mean centroid update; empty clusters keep the previous
    centroid.  The collect is K*DIMS longs — control-plane-sized,
    the same centers-to-driver step MLlib's Lloyd loop performs."""
    sums = (
        assigned.select("cid", F.posexplode("q").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in sums:
        import math

        by_cid.setdefault(r["cid"], {})[r["pos"]] = int(
            math.floor(r["s"] / r["n"]))
    rows = []
    for p in prev:
        m = by_cid.get(p["cid"])
        cq = [m[i] for i in range(DIMS)] if m else list(p["cq"])
        rows.append(Row(cid=p["cid"], cq=cq))
    return spark.createDataFrame(rows, _CENT_SCHEMA)


def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd k-means, 3 update rounds + final assignment, over
    integer-quantized embeddings.  Output pins the EXACT final
    partition: per cluster the member count, the sum of member
    vec_ids (any reassignment of any vector changes it), and the
    exact integer inertia under the final centroids."""
    vecs = _qvecs(spark, sf_dir)
    cents = vecs.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
    prev = cents.collect()
    cur = spark.createDataFrame(prev, _CENT_SCHEMA)
    for _ in range(ITERS):
        assigned = _assign(vecs, cur)
        cur = _update(spark, assigned, prev)
        prev = cur.collect()
        cur = spark.createDataFrame(prev, _CENT_SCHEMA)
    final = _assign(vecs, cur)
    return final.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("vec_id").alias("vec_id_checksum"),
        F.sum("d2").alias("inertia"),
    )


def _kmeans_sql() -> str:
    """Unrolled Lloyd SQL: the same quantize / assign / floor-mean /
    coalesce-empty chain, one CTE pair per iteration."""
    d2 = ("list_sum(list_transform(range({d}), i -> "
          "(v.q[i+1] - c.cq[i+1]) * (v.q[i+1] - c.cq[i+1])))").format(d=DIMS)
    parts = [f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {Q_SCALE}) AS BIGINT)) AS q
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < {K}
)"""]
    for t in range(1, ITERS + 1):
        parts.append(f""", a{t} AS (
  SELECT vec_id, q, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn FROM (
      SELECT v.vec_id, v.q, c.cid, {d2} AS d2
      FROM qv v, c{t - 1} c))
  WHERE rn = 1
), s{t} AS (
  SELECT cid, pos,
         CAST(floor(CAST(SUM(q[pos + 1]) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS m
  FROM a{t}, (SELECT unnest(range({DIMS})) AS pos)
  GROUP BY cid, pos
), c{t} AS (
  SELECT prev.cid, coalesce(nc.cq, prev.cq) AS cq
  FROM c{t - 1} prev LEFT JOIN (
    SELECT cid, list(m ORDER BY pos) AS cq FROM s{t} GROUP BY cid) nc
  ON nc.cid = prev.cid
)""")
    parts.append(f""", afinal AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn FROM (
      SELECT v.vec_id, c.cid, {d2} AS d2
      FROM qv v, c{ITERS} c))
  WHERE rn = 1
)
SELECT cid AS cluster_id, COUNT(*) AS n_vectors,
       CAST(SUM(vec_id) AS BIGINT) AS vec_id_checksum,
       CAST(SUM(d2) AS BIGINT) AS inertia
FROM afinal GROUP BY cid""")
    return "".join(parts)


KMEANS_SQL = _kmeans_sql()


QUERIES = [
    QuerySpec("kmeans_lloyd_clusters", kmeans_lloyd_clusters, KMEANS_SQL),
]
