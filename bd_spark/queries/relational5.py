"""Fifth tranche: the remaining TPC-H patterns (Q2/Q8/Q9/Q11/Q15/
Q20/Q21), adapted to the driver testdata's columns — the synthetic
schema has no ``partsupp`` table and no commit/receipt dates, so the
part-supplier cost relation is derived from ``lineitem`` (unit price
= extendedprice / quantity) and "late" is shipdate more than 60 days
after the order date.

With these seven, every TPC-H query family is implemented: 1, 3-14,
16-19, 22 live in the earlier tranches; this module closes 2, 8, 9,
11, 15, 20, 21.

Scale notes (100 TB):
- Dimension chains (supplier → nation → region, filtered part) are
  broadcast; the only shuffles are on the fact table's own keys
  (partkey / suppkey / orderkey), all uniformly distributed.
- Q2's "min per group with ties" uses a window min over the already
  aggregated (part, supplier) costs — the window input is one row
  per (part, supplier), orders of magnitude smaller than lineitem.
- Q21's EXISTS / NOT EXISTS become left-semi / left-anti joins that
  all shuffle on the same key (l_orderkey), so AQE can reuse the
  exchange and skew-split any hot order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bd_spark.catalog import table


# ------------------------------------------ q2: min-cost supplier
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern (min-cost supplier per part, with ties).

    The classic correlated ``= (SELECT min(ps_supplycost) ...)``
    becomes: aggregate unit cost per (part, supplier) over EUROPE
    suppliers, then a window min per part and an equality filter —
    ties (multiple suppliers at the min) survive, exactly like the
    correlated form. The window runs on the aggregated relation
    (|parts| × |suppliers-per-part| rows), not on lineitem.
    """
    li = table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supp = table(spark, "supplier", sf_dir)
    nat = table(spark, "nation", sf_dir)
    reg = table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        table(spark, "part", sf_dir)
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_name")
    )
    cost = (
        li.join(F.broadcast(euro_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 9
            ).alias("unit_cost")
        )
    )
    best = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    return (
        cost.withColumn("best_cost", best)
        .where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(euro_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 9) AS unit_cost
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 15
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM cost
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE unit_cost = (
  SELECT min(c2.unit_cost) FROM cost c2 WHERE c2.l_partkey = cost.l_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


# ------------------------------------------ q8: national market share
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 pattern: NATION_3 suppliers' share of the EUROPE
    customers' ECONOMY-part volume, per order year. Filtered part is
    the most selective dimension and is broadcast first so the
    lineitem scan shrinks before the orders/customer shuffles."""
    li = table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    parts = (
        table(spark, "part", sf_dir)
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n2 = table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    orders = table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n1 = table(spark, "nation", sf_dir)
    reg = table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    euro_cust = cust.join(
        F.broadcast(
            n1.join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        ),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select("c_custkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    all_nations = (
        li.join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(euro_cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("o_year", vol.alias("volume"), "supp_nation")
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    ) / F.sum("volume")
    return (
        all_nations.groupBy("o_year")
        .agg(F.round(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
)
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------ q9: product-type profit
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern: profit per supplier nation per year over
    parts matching a name fragment. The synthetic schema has no
    ps_supplycost, so cost is proxied as 60% of the part's retail
    price per unit. One shuffle on orderkey (for the order year) and
    one for the final small groupBy; part/supplier/nation broadcast."""
    li = table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    parts = (
        table(spark, "part", sf_dir)
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    orders = table(spark, "orders", sf_dir).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("n_name").alias("nation"), "o_year", amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.6 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ------------------------------------------ q11: important parts
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: parts whose traded value through NATION_7
    suppliers exceeds 0.1% of that nation's total. The global-total
    scalar subquery becomes a 1-row aggregate cross-joined
    (broadcast) onto the per-part values — the per-part relation is
    computed once, cached by Catalyst's reused-exchange, and the
    threshold comparison is map-side."""
    li = table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = table(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_7")
    nation_li = li.join(
        F.broadcast(
            supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        ),
        F.col("s_suppkey") == F.col("l_suppkey"),
    )
    per_part = nation_li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    total = per_part.agg((F.sum("raw_value") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("raw_value") > F.col("threshold"))
        .select("partkey", F.round("raw_value", 2).alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


Q11_SQL = """
WITH val AS (
  SELECT l_partkey, sum(l_extendedprice) AS raw_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, round(raw_value, 2) AS value
FROM val
WHERE raw_value > (SELECT sum(raw_value) * 0.001 FROM val)
ORDER BY value DESC, partkey
"""


# ------------------------------------------ q15: top supplier
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 pattern: supplier(s) with the maximum revenue over
    1997 Q1. Revenue is rounded to cents BEFORE the max comparison on
    both engines, so the equality is exact despite double summation
    order. The max is a 1-row broadcast; ties survive."""
    li = table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    best = (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .select("supplier_no", "total_revenue")
    )
    supp = table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        supp.join(F.broadcast(best), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------------ q20: part promotion
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern: suppliers in two nations who moved more
    than 40 units of any 'small…' part during 1997. The nested IN
    chain becomes: filtered-part broadcast → (supplier, part) agg
    with HAVING → distinct suppkeys → left-semi into the supplier
    dimension. Every shuffle key is uniform; the semi-join side is
    tiny and broadcast."""
    li = table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    parts = (
        table(spark, "part", sf_dir)
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    movers = (
        li.join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, "supplier", sf_dir)
    nat = table(spark, "nation", sf_dir).where(
        F.col("n_name").isin("NATION_2", "NATION_4")
    )
    return (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(movers), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_2', 'NATION_4')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40
  )
ORDER BY s_name
"""


# ------------------------------------------ q21: waiting suppliers
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern: suppliers who were the SOLE late supplier
    on a finished multi-supplier order ("late" = shipped >60 days
    after the order date; the synthetic schema has no receipt /
    commit dates). EXISTS → left-semi (another supplier on the same
    order), NOT EXISTS → left-anti (another LATE supplier on the
    same order). All three joins shuffle on l_orderkey, so the
    exchange is reusable and AQE can skew-split hot orders."""
    orders = (
        table(spark, "orders", sf_dir)
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = (
        late.join(
            others,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q15_top_supplier": q15_top_supplier,
    "q20_part_promotion": q20_part_promotion,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_part_promotion": Q20_SQL,
    "q21_waiting_supplier": Q21_SQL,
}
