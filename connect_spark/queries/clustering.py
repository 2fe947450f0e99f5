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
- one scan derives the quantized vectors (fanned out past the
  unsplittable test file — catalog.fanout_scan);
- per iteration: the K x 64 centroid rows ride the task closure and
  assignment is ONE numpy matrix op per Arrow batch (mapInPandas —
  a pure map stage, no join, no exchange; opt guide §4.2), then
  posexplode + groupBy(cid, pos) for the sums and a K*64-row collect
  (control-plane-sized: 512 longs) to rebuild the next centroid rows
  on the driver — exactly the centers-to-driver step MLlib performs
  each Lloyd round;
- the returned DataFrame is the final assignment's per-cluster
  rollup, so the driver's collect re-runs only the last assignment.

At 100 TB: the per-iteration shuffle carries (cid, pos, partial-sum)
after map-side combine — K*64 groups regardless of corpus size; the
corpus-side work is embarrassingly parallel scoring against the
closure-shipped centroid matrix.  Production would persist the
quantized vectors once (they are 4-8x smaller than the float input)
instead of re-deriving them per iteration; at this test scale the
re-scan is cheaper than the cache churn, and the plan is identical
either way.
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
    """Embeddings quantized to the integer grid (array<long>).  NOT
    fanned out: with the numpy mapInPandas assignment one batch of
    the whole (tiny) test corpus beats 32 near-empty Arrow batches,
    and at scale the scan splits on its own (measured r15: np alone
    1.49s, np+fanout 2.61s, broadcast-join baseline 3.0s)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * Q_SCALE).cast("long"),
        ).alias("q"),
    )


def _assign(vecs: DataFrame, rows: list[Row]) -> DataFrame:
    """Min-(d2, cid) assignment against the (driver-local, K×DIMS)
    centroid rows, evaluated as ONE numpy matrix op per Arrow batch
    (opt guide §4.2: batch the math into vectorized native code).
    Replaces the broadcast-join + groupBy-min formulation, which
    expanded every vector into K scored rows, paid a per-row
    interpreted zip_with/aggregate (higher-order functions are
    CodegenFallback), and shuffled N rows back through a hash
    aggregate — the numpy form is a pure map stage with zero
    exchange.  Semantics are bit-identical: all math is int64 (no
    float anywhere), and ``argmin`` returns the FIRST minimum, which
    with the centroid matrix sorted by cid is exactly the
    lexicographic min-(d2, cid) tie-break the join formulation (and
    the oracle's row_number ORDER BY d2, cid) pins."""
    rows = sorted(rows, key=lambda r: r["cid"])
    cmat = [list(map(int, r["cq"])) for r in rows]
    cids = [int(r["cid"]) for r in rows]

    def assign_batches(batches):
        import numpy as np

        cm = np.asarray(cmat, dtype=np.int64)        # K x DIMS
        cid_arr = np.asarray(cids, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.asarray(
                [np.asarray(x, dtype=np.int64) for x in pdf["q"]],
                dtype=np.int64)
            d2 = ((q[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            j = d2.argmin(axis=1)                    # first min = min cid
            yield pdf.assign(cid=cid_arr[j],
                             d2=d2[np.arange(len(j)), j])

    return vecs.select("vec_id", "q").mapInPandas(
        assign_batches, schema="vec_id long, q array<long>, cid long, d2 long")


def _round_partials(vecs: DataFrame, rows: list[Row]) -> DataFrame:
    """One Lloyd round's assignment + per-TASK partial centroid sums
    in a single numpy pass (the treeAggregate shape MLlib's own loop
    uses, guide §4.2): each task folds its batches into one K×DIMS
    int64 sum matrix + K counts and emits K rows.  Replaces the
    posexplode(q) + groupBy(cid, pos) update, which pushed N×DIMS
    rows through the JVM hash aggregate per round (8M probes at
    sf0.1) — the partial frame is K rows per task at ANY corpus
    size.  Assignment semantics identical to `_assign` (int64 math,
    argmin first-minimum = lexicographic (d2, cid) tie-break)."""
    rows = sorted(rows, key=lambda r: r["cid"])
    cmat = [list(map(int, r["cq"])) for r in rows]
    cids = [int(r["cid"]) for r in rows]

    def part_batches(batches):
        import numpy as np
        import pandas as pd

        cm = np.asarray(cmat, dtype=np.int64)
        cid_arr = np.asarray(cids, dtype=np.int64)
        k, d = cm.shape
        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        got = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            got = True
            q = np.asarray(
                [np.asarray(x, dtype=np.int64) for x in pdf["q"]],
                dtype=np.int64)
            d2 = ((q[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            j = d2.argmin(axis=1)                    # first min = min cid
            np.add.at(sums, j, q)
            counts += np.bincount(j, minlength=k)
        if got:
            yield pd.DataFrame(
                {"cid": cid_arr, "s": list(sums), "n": counts})

    return vecs.select("q").mapInPandas(
        part_batches, schema="cid long, s array<long>, n long")


def _update(vecs: DataFrame, prev: list[Row]) -> list[Row]:
    """Floor-mean centroid update; empty clusters keep the previous
    centroid.  The collect is K*DIMS longs — control-plane-sized,
    the same centers-to-driver step MLlib's Lloyd loop performs.
    Returns driver-local rows (the caller builds the next broadcast
    table from them — no extra collect round trip).  The per-(cid,
    pos) reduce over task partials is a tiny Spark agg (K×DIMS×tasks
    rows), not a driver fold, so the driver stays bounded at any
    executor count; every (cid, pos) group carries the same per-cid
    n, so n can be read from any group."""
    import math

    sums = (
        _round_partials(vecs, prev)
        .select("cid", "n", F.posexplode("s").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.sum("x").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in sums:
        if r["n"] > 0:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = int(
                math.floor(r["s"] / r["n"]))
    rows = []
    for p in prev:
        m = by_cid.get(p["cid"])
        cq = [m[i] for i in range(DIMS)] if m else list(p["cq"])
        rows.append(Row(cid=p["cid"], cq=cq))
    return rows


def _final_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lloyd loop: ITERS assignment/update rounds, then the final
    assignment under the settled centroids (vec_id, q, cid, d2)."""
    return _assign(_qvecs(spark, sf_dir),
                   _trained_centroids(spark, sf_dir))


def _trained_centroids(spark: SparkSession, sf_dir: str) -> list[Row]:
    """The settled centroid rows after ITERS Lloyd rounds (K×DIMS
    longs, driver-local — the same centers-to-driver state MLlib's
    loop keeps between rounds)."""
    vecs = _qvecs(spark, sf_dir)
    prev = vecs.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")).collect()
    for _ in range(ITERS):
        prev = _update(vecs, prev)
    return prev


def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd k-means, 3 update rounds + final assignment, over
    integer-quantized embeddings.  Output pins the EXACT final
    partition: per cluster the member count, the sum of member
    vec_ids (any reassignment of any vector changes it), and the
    exact integer inertia under the final centroids."""
    final = _final_assignment(spark, sf_dir)
    return final.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("vec_id").alias("vec_id_checksum"),
        F.sum("d2").alias("inertia"),
    )


# SemDeDup threshold: cosine 0.4 (this corpus's near-dup tail, cf.
# SCALE.md round 8).  Tested as integers: cos(a,b) > 2/5  <=>
# dot > 0 AND 25*dot^2 > 4*|a|^2*|b|^2 — dot <= 64*526^2 ~ 1.8e7,
# so 25*dot^2 <= 8e15 stays in int64 at ANY corpus size (the bound
# depends on dims and value range, not row count).
_SEM_TAU_NUM2 = 4
_SEM_TAU_DEN2 = 25


def _semdedup_marked(final: DataFrame) -> DataFrame:
    """Per-member drop flags for SemDeDup: ``(cid, vec_id,
    is_dropped)`` where a member is dropped iff some lower-vec_id
    cluster-mate exceeds the cosine threshold.

    r15 shape: ONE applyInPandas over cid groups running an int64
    numpy Gram matmul per cluster (opt guide §4.2).  Replaces the
    a⋈b self-join on cid whose per-pair dot was an interpreted
    64-element zip_with/aggregate (higher-order functions are
    CodegenFallback) and whose two join branches each recomputed the
    assignment mapInPandas subtree.  One exchange (the cid
    partitioning) instead of join + distinct + left-join, and the
    pairwise work runs at memory bandwidth.  Semantics are
    bit-identical: all math is int64 (dot <= 64*2000^2 so
    25*dot^2 < 2^63 at ANY corpus size — bound depends on dims and
    value range, not rows), and the strict-upper-triangle `any`
    after a vec_id sort is exactly "exists a_id < b_id above
    threshold".  Per-cluster memory is |c|^2 ints — the same
    executor-sized-cluster contract the join formulation already
    required (at 100 TB you raise K so |c| stays bounded)."""
    def mark(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id", ignore_index=True)
        q = np.asarray(
            [np.asarray(x, dtype=np.int64) for x in pdf["q"]],
            dtype=np.int64)
        g = q @ q.T
        n2 = np.diagonal(g).copy()
        sim = (g > 0) & (_SEM_TAU_DEN2 * g * g
                         > _SEM_TAU_NUM2 * np.outer(n2, n2))
        dropped = np.triu(sim, 1).any(axis=0)
        return pd.DataFrame({
            "cid": pdf["cid"],
            "vec_id": pdf["vec_id"],
            "is_dropped": dropped.astype("int32"),
        })

    return (final.select("cid", "vec_id", "q")
            .groupBy("cid")
            .applyInPandas(mark,
                           schema="cid long, vec_id long, is_dropped int"))


def kmeans_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, the paper shape (Abbas et al. 2023): k-means first,
    then pairwise similarity ONLY within clusters, dropping every
    vector that has a more-senior (lower vec_id) cluster-mate above
    the cosine threshold.  The cluster step bounds the quadratic
    blowup by construction — pair count is sum over clusters of
    |c|^2, not corpus^2, and at 100 TB you raise K so |c| stays
    executor-sized (the within-cluster pairwise runs per cid group).
    Contrast with dedup_semantic_keep (queries/dataprep.py), which
    generates candidates via LSH bands instead; this variant has no
    probabilistic recall gap inside a cluster.

    All similarity tests are exact integer cross-multiplications
    (no float cosine anywhere), so the oracle reproduces the keep
    set bit-for-bit (see _semdedup_marked for the r15 numpy form)."""
    marked = _semdedup_marked(_final_assignment(spark, sf_dir))
    return marked.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("is_dropped").alias("n_dropped"),
        F.sum(F.col("vec_id") * (1 - F.col("is_dropped")))
        .alias("kept_checksum"),
    )


def _lloyd_ctes() -> str:
    """Unrolled Lloyd SQL prefix: the same quantize / assign /
    floor-mean / coalesce-empty chain, one CTE pair per iteration,
    ending in `afinal(vec_id, q, cid, d2)`."""
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
  SELECT vec_id, q, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn FROM (
      SELECT v.vec_id, v.q, c.cid, {d2} AS d2
      FROM qv v, c{ITERS} c))
  WHERE rn = 1
)""")
    return "".join(parts)


KMEANS_SQL = _lloyd_ctes() + """
SELECT cid AS cluster_id, COUNT(*) AS n_vectors,
       CAST(SUM(vec_id) AS BIGINT) AS vec_id_checksum,
       CAST(SUM(d2) AS BIGINT) AS inertia
FROM afinal GROUP BY cid"""


SEMDEDUP_SQL = _lloyd_ctes() + f"""
, members AS (
  SELECT vec_id, cid, q,
         list_sum(list_transform(q, x -> x * x)) AS n2
  FROM afinal
), pairs AS (
  SELECT b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(64),
              i -> a.q[i + 1] * b.q[i + 1])) AS BIGINT) AS dot,
         CAST(a.n2 AS BIGINT) AS a_n2, CAST(b.n2 AS BIGINT) AS b_n2
  FROM members a JOIN members b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
), dropped AS (
  SELECT DISTINCT b_id AS vec_id FROM pairs
  WHERE dot > 0
    AND {_SEM_TAU_DEN2} * dot * dot > {_SEM_TAU_NUM2} * a_n2 * b_n2
), marked AS (
  SELECT m.cid, m.vec_id,
         CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dropped
  FROM members m LEFT JOIN dropped d ON d.vec_id = m.vec_id
)
SELECT cid AS cluster_id, COUNT(*) AS n_members,
       CAST(SUM(is_dropped) AS BIGINT) AS n_dropped,
       CAST(SUM(vec_id * (1 - is_dropped)) AS BIGINT) AS kept_checksum
FROM marked GROUP BY cid"""


# --- IVF probe over TRAINED centroids ---------------------------------

N_QUERY = 10      # vec_id < 10 are the query set (queries/vectors.py)
N_PROBE = 2
TOP_K = 5


def ann_ivf_kmeans_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search over k-means-TRAINED cells — the composition
    the two families exist for: `ann_ivf_probe` (queries/vectors.py)
    prunes against fixed seed centroids; this variant builds the index
    from the Lloyd-settled centroids, the way a real IVF index is
    trained (train k-means on a sample, partition the corpus by cell,
    probe the nprobe nearest cells).  Everything stays in the
    quantized integer space: cell choice and the final ranking are
    exact int64 L2 distances (ties by id), so the result is
    engine-exact with no float cosine anywhere.

    At 100 TB: the corpus is written partitioned by trained cell
    (partition pruning skips the other cells), queries broadcast
    against the K-row centroid table, and the probe scan touches
    nprobe/K of the data — identical plan shape to ann_ivf_probe with
    strictly better cell balance (Lloyd equalizes cell populations;
    seed cells are as skewed as the data)."""
    cent_rows = _trained_centroids(spark, sf_dir)
    cents = spark.createDataFrame(cent_rows, _CENT_SCHEMA)
    vecs = _qvecs(spark, sf_dir)
    corpus = vecs.filter(F.col("vec_id") >= N_QUERY)
    queries = vecs.filter(F.col("vec_id") < N_QUERY)

    assign = _assign(corpus, cent_rows).select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("nq"),
        "cid")

    d2c = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    pw = Window.partitionBy("vec_id").orderBy("d2c", "cid")
    probe = (
        queries.join(F.broadcast(cents))
        .withColumn("d2c", d2c)
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"),
                F.col("q").alias("qv"), "cid")
    )
    d2n = F.aggregate(
        F.zip_with("qv", "nq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    rw = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        probe.join(assign, "cid")
        .withColumn("d2", d2n)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "d2")
    )


IVF_KMEANS_SQL = _lloyd_ctes() + f"""
, assign AS (
  SELECT vec_id AS neighbor_id, q AS nq, cid
  FROM afinal WHERE vec_id >= {N_QUERY}
), probe AS (
  SELECT vec_id AS query_id, q AS qv, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2c, cid) AS rn FROM (
      SELECT v.vec_id, v.q, c.cid,
             list_sum(list_transform(range({DIMS}),
                 i -> (v.q[i+1] - c.cq[i+1]) * (v.q[i+1] - c.cq[i+1])))
               AS d2c
      FROM qv v, c{ITERS} c WHERE v.vec_id < {N_QUERY}))
  WHERE rn <= {N_PROBE}
)
SELECT query_id, neighbor_id, rank, d2 FROM (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM (
    SELECT p.query_id, a.neighbor_id,
           CAST(list_sum(list_transform(range({DIMS}),
               i -> (p.qv[i+1] - a.nq[i+1]) * (p.qv[i+1] - a.nq[i+1])))
             AS BIGINT) AS d2
    FROM probe p JOIN assign a ON a.cid = p.cid))
WHERE rank <= {TOP_K}
"""


def contamination_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: flag every corpus vector
    whose cosine to ANY eval vector exceeds the threshold — the
    embedding-space complement of the 13-gram lexical check
    (queries/llmops.py `contamination_13gram`), catching paraphrased
    benchmark leakage that n-grams miss.  The eval set is the fixed
    query prefix (vec_id < 10 — O(1) in sf, broadcastable by
    convention); the corpus is scanned once; the threshold test is
    the same exact integer cross-multiplication as
    kmeans_semdedup_keep, so flags are engine-exact.  Output is the
    per-eval-vector contamination census plus an id checksum that
    pins the exact flagged set."""
    vecs = _qvecs(spark, sf_dir)
    n2 = F.aggregate(F.transform("q", lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, x: acc + x)
    evals = vecs.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("eval_id"), F.col("q").alias("eq"),
        n2.alias("en2"))
    corpus = vecs.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("doc_id"), F.col("q").alias("dq"),
        n2.alias("dn2"))
    dot = F.aggregate(F.zip_with("eq", "dq", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    hits = (
        corpus.join(F.broadcast(evals))
        .withColumn("dot", dot)
        .filter((F.col("dot") > 0)
                & (_SEM_TAU_DEN2 * F.col("dot") * F.col("dot")
                   > _SEM_TAU_NUM2 * F.col("en2") * F.col("dn2")))
    )
    return hits.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.sum("doc_id").alias("contaminated_checksum"),
        F.min("doc_id").alias("first_doc"),
    )


CONTAMINATION_EMB_SQL = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {Q_SCALE}) AS BIGINT)) AS q
  FROM embeddings
), n AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
  FROM qv
), pairs AS (
  SELECT e.vec_id AS eval_id, d.vec_id AS doc_id,
         CAST(list_sum(list_transform(range({DIMS}),
              i -> e.q[i+1] * d.q[i+1])) AS BIGINT) AS dot,
         e.n2 AS en2, d.n2 AS dn2
  FROM n e JOIN n d ON e.vec_id < {N_QUERY} AND d.vec_id >= {N_QUERY}
), hits AS (
  SELECT eval_id, doc_id FROM pairs
  WHERE dot > 0
    AND {_SEM_TAU_DEN2} * dot * dot > {_SEM_TAU_NUM2} * en2 * dn2
)
SELECT eval_id, COUNT(*) AS n_contaminated,
       CAST(SUM(doc_id) AS BIGINT) AS contaminated_checksum,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM hits GROUP BY eval_id
"""


def pipeline_semantic_curation(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The composed semantic-curation flow a pretraining build runs:
    k-means clusters → SemDeDup keep/drop inside each cluster → the
    curated corpus joined back to its documents (vec_id IS doc_id in
    this dataset) → the per-language curation report (kept/dropped
    volumes, kept tokens, id checksum).  Everything downstream of the
    Lloyd loop is one Catalyst plan; the drop rule is the exact
    integer test of kmeans_semdedup_keep, so the report is
    engine-exact row-for-row."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("long").alias("n_tok"))
    marked = (_semdedup_marked(_final_assignment(spark, sf_dir))
              .select("vec_id", "is_dropped")
              .join(docs, "vec_id"))
    keep = 1 - F.col("is_dropped")
    return marked.groupBy("lang").agg(
        F.sum(keep).alias("n_kept"),
        F.sum("is_dropped").alias("n_dropped"),
        F.sum(F.col("n_tok") * keep).alias("tokens_kept"),
        F.sum(F.col("vec_id") * keep).alias("kept_checksum"),
    )


SEMANTIC_CURATION_SQL = _lloyd_ctes() + f"""
, members AS (
  SELECT vec_id, cid, q,
         list_sum(list_transform(q, x -> x * x)) AS n2
  FROM afinal
), pairs AS (
  SELECT b.vec_id AS b_id,
         CAST(list_sum(list_transform(range({DIMS}),
              i -> a.q[i + 1] * b.q[i + 1])) AS BIGINT) AS dot,
         CAST(a.n2 AS BIGINT) AS a_n2, CAST(b.n2 AS BIGINT) AS b_n2
  FROM members a JOIN members b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
), dropped AS (
  SELECT DISTINCT b_id AS vec_id FROM pairs
  WHERE dot > 0
    AND {_SEM_TAU_DEN2} * dot * dot > {_SEM_TAU_NUM2} * a_n2 * b_n2
), marked AS (
  SELECT m.vec_id,
         CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END AS is_dropped,
         d.lang,
         len(list_filter(string_split(d.text, ' '), x -> x != ''))::BIGINT
           AS n_tok
  FROM members m
  LEFT JOIN dropped dr ON dr.vec_id = m.vec_id
  JOIN documents d ON d.doc_id = m.vec_id
)
SELECT lang,
       CAST(SUM(1 - is_dropped) AS BIGINT) AS n_kept,
       CAST(SUM(is_dropped) AS BIGINT) AS n_dropped,
       CAST(SUM(n_tok * (1 - is_dropped)) AS BIGINT) AS tokens_kept,
       CAST(SUM(vec_id * (1 - is_dropped)) AS BIGINT) AS kept_checksum
FROM marked GROUP BY lang
"""


QUERIES = [
    QuerySpec("kmeans_lloyd_clusters", kmeans_lloyd_clusters, KMEANS_SQL,
              headline=True),
    QuerySpec("kmeans_semdedup_keep", kmeans_semdedup_keep, SEMDEDUP_SQL),
    QuerySpec("ann_ivf_kmeans_probe", ann_ivf_kmeans_probe,
              IVF_KMEANS_SQL),
    QuerySpec("contamination_embedding", contamination_embedding,
              CONTAMINATION_EMB_SQL),
    QuerySpec("pipeline_semantic_curation", pipeline_semantic_curation,
              SEMANTIC_CURATION_SQL),
]
