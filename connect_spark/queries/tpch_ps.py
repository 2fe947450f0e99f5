"""TPC-H q2/q11/q16/q20 shapes — the four queries round 3 declared
unreachable because the driver dataset has no partsupp table.

Closed by SYNTHESIZING partsupp deterministically from (part,
supplier) with pure integer arithmetic, identically on both engines
(Spark Column algebra here, a CTE in the DuckDB oracle), so the full
operator structure of each query — correlated min subquery, having
over a scalar-subquery fraction, count-distinct with NOT-IN
exclusion, nested IN with a half-sum threshold — runs end to end and
value-hashes.

partsupp(p, i) for i in 0..3 (4 distinct suppliers per part):
    ps_suppkey    = (p_partkey + i*(M//4 + 1)) % M,
                    M = max(s_suppkey) + 1 (keys are dense 0-based)
    ps_availqty   = ((p_partkey*31 + ps_suppkey*7) % 9999) + 1
    ps_supplycost = round(((p_partkey*17 + ps_suppkey*3) % 99900)
                          / 100.0 + 1.0, 2)

Scale: partsupp is 4×|part| rows built with a 1-row broadcast (the
max-suppkey aggregate) and a 4-element explode — no shuffle; the
queries then join/aggregate with the same AQE-owned strategies as the
rest of the suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    smax = supp.agg(F.max("s_suppkey").alias("_smax"))
    base = part.crossJoin(F.broadcast(smax)).select(
        F.col("p_partkey"), F.col("_smax"),
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_i"),
    )
    # keys are dense 0-based: modulus = smax + 1 (the supplier count)
    m = F.col("_smax") + 1
    suppkey = (
        F.col("p_partkey") + F.col("_i") * (m / 4).cast("bigint")
        + F.col("_i")
    ) % m
    # NOTE: i*(S//4 + 1) == i*(S//4) + i — written that way so both
    # engines do identical integer ops
    out = base.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.cast("bigint").alias("ps_suppkey"),
    )
    return out.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 9999 + 1)
        .cast("bigint")
        .alias("ps_availqty"),
        F.round(
            ((F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 3) % 99900)
            / 100.0
            + 1.0,
            2,
        ).alias("ps_supplycost"),
    )


_PS_CTE = """
WITH smax AS (SELECT max(s_suppkey) + 1 AS m FROM supplier),
ps0 AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * (m // 4) + i) % m AS ps_suppkey
  FROM part, smax, unnest(range(4)) AS t(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey * 31 + ps_suppkey * 7) % 9999) + 1 AS ps_availqty,
         round(((ps_partkey * 17 + ps_suppkey * 3) % 99900) / 100.0 + 1.0, 2)
           AS ps_supplycost
  FROM ps0
)
"""


# --- Q2: minimum-cost supplier --------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for ECONOMY parts, the supplier(s) in region
    ASIA whose cost equals the minimum cost for that part among ASIA
    suppliers (correlated min subquery → per-part window), top 20 by
    account balance."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    asia_ps = (
        ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("ps_partkey")
    ranked = asia_ps.withColumn(
        "_min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("_min_cost"))
    out = (
        ranked.join(
            part.select("p_partkey"),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )
    return out


Q2_SQL = _PS_CTE + """
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       ps.ps_supplycost AS ps_supplycost
FROM partsupp ps
JOIN supplier ON ps.ps_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN part     ON ps.ps_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND ps.ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'ASIA'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


# --- Q11: important stock -------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part stock value for one nation's suppliers,
    HAVING value > 0.01% of that nation's total (scalar-subquery
    fraction via a 1-row broadcast crossJoin)."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    nat_ps = ps.join(
        supp.select("s_suppkey", "s_nationkey"),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.round(F.sum(value), 2).alias("stock_value")
    )
    total = per_part.agg(
        (F.sum("stock_value") * 0.0001).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("_threshold"))
        .select("ps_partkey", "stock_value")
    )


Q11_SQL = _PS_CTE + """
, per_part AS (
  SELECT ps_partkey,
         round(sum(ps_supplycost * ps_availqty), 2) AS stock_value
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY ps_partkey
)
SELECT ps_partkey, stock_value
FROM per_part
WHERE stock_value > (SELECT sum(stock_value) * 0.0001 FROM per_part)
"""


# --- Q16: parts/supplier relationship -------------------------------


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size) for
    parts NOT of one brand, excluding suppliers whose name matches a
    complaint pattern (NOT IN → anti join)."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%3%"))
        .select("s_suppkey")
    )
    out = (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            complainers,
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )
    return out


Q16_SQL = _PS_CTE + """
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%'
  )
GROUP BY p_brand, p_type, p_size
"""


# --- Q20: potential part promotion (excess stock) -------------------


def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one nation holding availqty > half the
    year's shipped quantity of that (part, supplier) for parts named
    like a pattern — nested IN subqueries become semi joins on the
    half-sum aggregate."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"),
        F.col("l_suppkey").alias("sh_suppkey"),
    ).agg((F.sum("l_quantity") * 0.5).alias("half_qty"))
    excess = (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sh_partkey"))
            & (F.col("ps_suppkey") == F.col("sh_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    return (
        supp.join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = _PS_CTE + """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
    )
    AND ps_availqty > (
      SELECT 0.5 * sum(l_quantity) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    )
  )
ORDER BY s_name
"""


QUERIES = [
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL),
    QuerySpec("q16_parts_supplier", q16_parts_supplier, Q16_SQL),
    QuerySpec("q20_excess_stock", q20_excess_stock, Q20_SQL),
]
