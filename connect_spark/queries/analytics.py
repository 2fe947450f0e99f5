"""Analytics additions: ordered funnel and a KMV distinct sketch.

The KMV (k-minimum-values) sketch is the "novel sketch" custom-
operator case from the brief: approximate distinct counting that —
unlike HLL — is DETERMINISTIC and engine-reproducible because it is
pure order statistics over md5 hashes, so the DuckDB oracle verifies
it exactly. Estimate: (k-1) / kth_smallest_hash_fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

K_MINVALUES = 64


def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: signup → (first view after signup) →
    (first purchase after that view). One shuffle (groupBy user) via
    conditional min aggregations — no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    t = F.col("ts")
    typed = lambda kind: F.when(F.col("event_type") == kind, t)  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        F.min(typed("signup")).alias("t_signup"),
        F.min(typed("view")).alias("t_first_view"),
        F.min(typed("purchase")).alias("t_first_purchase"),
    )
    # strict funnel on first occurrences: signup < view < purchase
    out = per_user.select(
        "user_id",
        F.col("t_signup").isNotNull().cast("int").alias("did_signup"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_first_view").isNotNull()
            & (F.col("t_first_view") > F.col("t_signup"))
        ).cast("int").alias("funnel_view"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_first_view").isNotNull()
            & (F.col("t_first_view") > F.col("t_signup"))
            & F.col("t_first_purchase").isNotNull()
            & (F.col("t_first_purchase") > F.col("t_first_view"))
        ).cast("int").alias("funnel_purchase"),
    )
    return out


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_first_purchase
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(t_signup IS NOT NULL AS INT) AS did_signup,
       CAST(t_signup IS NOT NULL AND t_first_view IS NOT NULL
            AND t_first_view > t_signup AS INT) AS funnel_view,
       CAST(t_signup IS NOT NULL AND t_first_view IS NOT NULL
            AND t_first_view > t_signup
            AND t_first_purchase IS NOT NULL
            AND t_first_purchase > t_first_view AS INT) AS funnel_purchase
FROM per_user
"""


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event_type: keep the K smallest
    md5 hashes of the key, estimate = (K-1)/frac(kth). Deterministic —
    the oracle reproduces the identical estimate. Shuffle carries at
    most K hashes per group (collect_set pre-deduped map-side)."""
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    grouped = ev.groupBy("event_type").agg(
        F.slice(F.sort_array(F.collect_set(h)), 1, K_MINVALUES).alias("kmv"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    kth = F.element_at("kmv", K_MINVALUES)
    # fraction of the hash space: first 15 hex digits / 16^15
    frac = F.conv(F.substring(kth, 1, 15), 16, 10).cast("double") / float(
        16**15
    )
    est = F.when(
        F.size("kmv") < K_MINVALUES, F.size("kmv").cast("double")
    ).otherwise((K_MINVALUES - 1) / frac)
    return grouped.select(
        "event_type",
        "exact_distinct",
        F.floor(est).cast("bigint").alias("kmv_estimate"),
    )


KMV_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
), kmv AS (
  SELECT event_type, list_sort(list(h))[1:{K_MINVALUES}] AS kmv,
         count(*) AS exact_distinct
  FROM hashes GROUP BY event_type
)
SELECT event_type, exact_distinct,
       CAST(floor(CASE WHEN len(kmv) < {K_MINVALUES}
                       THEN len(kmv) * 1.0
                       ELSE ({K_MINVALUES} - 1) /
                            (CAST(('0x' || substr(kmv[{K_MINVALUES}], 1, 15)) AS UBIGINT)
                             / CAST({16**15} AS DOUBLE))
                  END) AS BIGINT) AS kmv_estimate
FROM kmv
"""


# --- exact percentiles (p50/p95/p99) per event type ---

def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles over integer cents: both
    engines interpolate (1-f)*a + f*b on exact ints, so the doubles
    agree bit-for-bit (verified at sf0.1) — no rounding games. One
    shuffle; at scale swap in a KLL/t-digest sketch for one-pass
    approximate quantiles (the KMV pattern above shows the
    deterministic-sketch recipe)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        ev.withColumn("cents", cents)
        .groupBy("event_type")
        .agg(
            F.percentile("cents", 0.5).alias("p50_cents"),
            F.percentile("cents", 0.95).alias("p95_cents"),
            F.percentile("cents", 0.99).alias("p99_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


PERCENTILES_SQL = """
SELECT event_type,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.95) AS p95_cents,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.99) AS p99_cents,
       count(*) AS n
FROM events
GROUP BY 1
"""


# --- value histogram (fixed-width binning) ---

def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type: bucket index is
    floor(value/10) — identical IEEE division in both engines, so the
    binning itself is verified, not just the counts."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 10).cast("bigint")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


HISTOGRAM_SQL = """
SELECT event_type,
       CAST(floor(value / 10) AS BIGINT) AS bucket,
       count(*) AS n
FROM events
GROUP BY 1, 2
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the standard product-analytics matrix: each
    user joins the cohort of their FIRST active week; cells count
    distinct users active k weeks after their cohort week.  Two
    map-side-combined aggregations (per-user min, then per-cell
    distinct) — both shuffles keyed by user_id then by the
    (cohort, offset) cell; at 100 TB the per-user reduction shrinks
    the stream to |users| before the matrix agg sees it."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / (7 * 86400)))
        .cast("bigint").alias("week"),
    ).distinct()
    first = weekly.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"))
    return (
        weekly.join(first, "user_id")
        .withColumn("week_offset",
                    (F.col("week") - F.col("cohort_week")))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / (7 * 86400)) AS BIGINT) AS week
  FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY 1
)
SELECT cohort_week,
       week - cohort_week AS week_offset,
       COUNT(DISTINCT w.user_id) AS n_users
FROM weekly w JOIN first USING (user_id)
GROUP BY 1, 2
"""


def anomaly_event_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hours whose event count sits more
    than 3 population-σ above that event type's hourly mean.  The
    3σ test runs in EXACT integer arithmetic over counts —
    (x·n − Σx)² > 9·(n·Σx² − (Σx)²) is algebraically (x − μ)² > 9σ²
    with no floating point, so both engines flag identical hours.
    Two aggregations (hour cells, then per-type moments) and one
    broadcastable join of the tiny stats table back onto the cells."""
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = hours.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
    )
    j = hours.join(stats, "event_type")
    dev = F.col("cnt") * F.col("n") - F.col("sx")
    var_n2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        j.filter((dev > 0) & (dev * dev > 9 * var_n2))
        .select(
            "event_type",
            F.col("hour").cast("string").alias("hour"),
            "cnt",
        )
    )


ANOMALY_SQL = """
WITH hours AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS sx,
         SUM(cnt * cnt) AS sxx
  FROM hours GROUP BY 1
)
SELECT h.event_type,
       CAST(h.hour AS VARCHAR) AS hour,
       h.cnt
FROM hours h JOIN stats s USING (event_type)
WHERE (h.cnt * s.n - s.sx) > 0
  AND (h.cnt * s.n - s.sx) * (h.cnt * s.n - s.sx)
      > 9 * (s.n * s.sxx - s.sx * s.sx)
"""


QUERIES = [
    QuerySpec("retention_cohorts", retention_cohorts, RETENTION_SQL),
    QuerySpec("anomaly_event_spikes", anomaly_event_spikes,
              ANOMALY_SQL),
    QuerySpec("funnel_signup_view_purchase", funnel_signup_view_purchase, FUNNEL_SQL),
    QuerySpec("sketch_kmv_distinct", sketch_kmv_distinct, KMV_SQL),
    QuerySpec("percentiles_by_type", percentiles_by_type, PERCENTILES_SQL),
    QuerySpec("histogram_values", histogram_values, HISTOGRAM_SQL),
]
