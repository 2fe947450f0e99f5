"""Extended TPC-H coverage (q4/q5/q7/q8/q9/q12/q13/q15/q17/q18/q19/q22
shapes) on the driver's TPC-H-ish tables.

The synthetic schema lacks partsupp and a few attribute columns
(l_shipmode, l_commitdate, l_receiptdate, p_container, c_phone,
o_comment), so queries whose predicate depends on a missing column are
re-shaped onto an available one with the SAME operator structure
(semi/anti joins, scalar subqueries, disjunctive pushdown, having
filters, top-1-with-ties); q2/q11/q16/q20 (partsupp-central) are out of
reach of this dataset.

Plan notes for 100 TB: nation/region are always broadcast; the fact ⋈
fact joins (lineitem ⋈ orders) shuffle on orderkey and AQE picks SMJ;
every date filter sits directly on the scan (PushedFilters); ratio
outputs follow the parity rule — round both sums to 2 decimals FIRST,
then derive floor-scaled integers, so Spark and DuckDB divide identical
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Q4: order priority checking (EXISTS semi join) -----------------

def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) — the
    hardest TPC-H join structure: a fact self-correlation with BOTH an
    EXISTS and a NOT-EXISTS branch.  The dataset lacks
    commit/receipt dates, so 'late' re-shapes onto l_returnflag='R'
    with the SAME operator structure: suppliers of one nation whose
    RETURNED lineitems sit in finished multi-supplier orders where
    (EXISTS) another supplier participated but (NOT EXISTS) no other
    supplier also returned.  Plan: the EXISTS is a left-semi and the
    NOT EXISTS a left-anti, both equality joins on l_orderkey — no
    correlated per-row subquery survives into the physical plan, and
    at 100 TB all three lineitem branches shuffle on the same
    orderkey key so AQE coalesces them into co-partitioned SMJs."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    late = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey")
    others = li.select("l_orderkey", "l_suppkey").distinct()
    late_d = late.distinct()
    l1 = late.alias("l1")
    # EXISTS: another supplier in the same order
    with_other = l1.join(
        others.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier also returned in that order
    sole_blame = with_other.join(
        late_d.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey"))
    one_nation = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_name")
    )
    return (
        sole_blame.join(finished, "l_orderkey")
        .join(one_nation,
              F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter that have at least one
    returned lineitem (the dataset's analogue of the late-commit
    EXISTS), counted per priority. Left-semi join keeps only the
    orderkey column moving."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(
            returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- Q5: local supplier volume (5-way join through region) ----------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from orders where the lineitem's supplier and
    the customer share a nation, per nation of one region and one
    year. nation/region broadcast; customer/orders/lineitem/supplier
    shuffle on their keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- Q7: volume shipping between two nations ------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations per direction and
    ship year. The two nation lookups are independent broadcasts of
    the same dim."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_1"
    )
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share --------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue in AMERICA
    per order year, as ppm of rounded sums (parity rule)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(part.select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = base.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)),
            2,
        ).alias("nation_revenue"),
        F.round(F.sum(vol), 2).alias("total_revenue"),
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        F.floor(
            F.col("nation_revenue") * 1000000.0 / F.col("total_revenue")
        ).cast("bigint").alias("share_ppm"),
    )


Q8_SQL = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         round(sum(CASE WHEN n2.n_name = 'NATION_3'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END), 2) AS nation_revenue,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY year(o_orderdate)
)
SELECT o_year, nation_revenue, total_revenue,
       CAST(floor(nation_revenue * 1000000.0 / total_revenue) AS BIGINT)
         AS share_ppm
FROM agg
"""


# --- Q9: product type profit (no partsupp → revenue variant) --------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (partsupp's supplycost is absent, so profit
    degrades to discounted revenue): per supplier nation and order
    year over parts named like widget."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part.select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # sum EXACT decimals of the per-row double product (the
            # product itself is bit-identical across engines; decimal
            # summation removes the last-ulp order dependence that put
            # this sum on a .xx5 rounding midpoint at sf0.01)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)")
                ).cast("double"),
                2,
            ).alias("sum_profit")
        )
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q12: shipping mode / priority classes --------------------------

def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode is absent → l_linestatus carries
    the grouping role): per linestatus of 1996 shipments, how many
    orders were high- vs low-priority (conditional aggregation over a
    fact ⋈ fact join)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


# --- Q13: customer order-count distribution -------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including
    zero-order customers (left outer join + double aggregation)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    )
    per_cust = (
        cust.join(
            orders.select("o_custkey", "o_orderkey"),
            cust["c_custkey"] == orders["o_custkey"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- Q15: top supplier (view + max-with-ties) -----------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue over one
    quarter — the revenue view aggregates first (map-side partials,
    one small shuffle), then a broadcast of the 1-row max filters it."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.join(F.broadcast(mx),
                     F.col("total_revenue") == F.col("_mx"))
        .join(supp.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --- Q17: small-quantity-order revenue (correlated avg) -------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (p_container absent → brand filter only): revenue
    from lineitems below 20% of their part's average quantity. The
    correlated subquery becomes a per-part aggregate joined back —
    one extra small shuffle instead of a rescan per row."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    # part is sf-scaled even after the brand filter: no forced
    # broadcast; AQE picks broadcast at small sf, SMJ at scale.
    brand_lines = li.join(
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = brand_lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_lines.join(
            avg_qty, F.col("l_partkey") == F.col("a_partkey")
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
       count(*) AS n_lines
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#12'
  AND l1.l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                             WHERE l2.l_partkey = l1.l_partkey)
"""


# --- Q18: large volume customers ------------------------------------

def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose single order exceeds a quantity
    threshold (groupBy + having + 3-way join back)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Q19: disjunctive predicate revenue -----------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (container/shipmode absent → brand+size+qty
    bands): revenue under an OR of conjunctive band predicates — the
    disjunction sits in ONE join condition so Catalyst can push the
    part-side conjuncts down."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(
        part.select("p_partkey", "p_brand", "p_size"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    band1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    band2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    )
    return joined.filter(band1 | band2).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 20)
"""


# --- Q22: global sales opportunity (anti join + scalar subquery) ----

def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (c_phone absent → nation key is the country
    code): wealthy customers (acctbal above the positive average) who
    placed no orders recently (every synthetic customer has SOME order,
    so the canonical 'no orders at all' is the dated window instead) —
    scalar-subquery broadcast + anti join, per country."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey AS cntrycode,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


QUERIES = [
    QuerySpec("q21_suppliers_kept_waiting", q21_suppliers_kept_waiting,
              Q21_SQL),
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL,
              headline=True),
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL),
    QuerySpec("q12_priority_classes", q12_priority_classes, Q12_SQL),
    QuerySpec("q13_customer_distribution", q13_customer_distribution, Q13_SQL),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL),
    QuerySpec("q17_small_quantity", q17_small_quantity, Q17_SQL),
    QuerySpec("q18_large_volume", q18_large_volume, Q18_SQL,
              headline=True),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL),
    QuerySpec("q22_sales_opportunity", q22_sales_opportunity, Q22_SQL),
]
