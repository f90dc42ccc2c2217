"""Second tranche of relational queries: conditional aggregation,
broadcast-ratio, HAVING-subquery, disjunctive predicate pushdown,
decorrelated min, and CUBE grouping sets — each with a DuckDB oracle.

Scale notes mirror relational.py: part/supplier always broadcast,
orders⋈lineitem shuffles on the order key, every aggregate is
algebraic (map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bd_spark.catalog import table


# ----------------------------------------------- q12: conditional agg
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: join + CASE-conditional counts per group."""
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


# ----------------------------------------------- q14: broadcast ratio
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 pattern: promo revenue share. part broadcasts; the
    whole query is one scan + one tiny reduction."""
    part = table(spark, "part", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# ----------------------------------------------- q18: HAVING subquery
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern: semi-join against a HAVING aggregate.

    The big-orders set is computed once from lineitem (map-side
    partials on l_orderkey) and left-semi-joined — no row explosion.
    """
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ----------------------------------------------- q19: disjunctive pushdown
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 pattern: OR-of-ANDs over join columns. Catalyst
    extracts the common l_quantity bounds for scan pushdown; part
    broadcasts."""
    part = table(spark, "part", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(c1 | c2 | c3)
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# ----------------------------------------------- q2-style decorrelated min
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: per-part minimum price, decorrelated as a
    window-min + filter instead of a correlated subquery (one shuffle
    on l_partkey; no re-scan per part)."""
    li = table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_partkey")
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            F.min("l_extendedprice").over(w).alias("min_price"),
        )
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.min("min_price"), 2).alias("min_price"),
            F.max("l_suppkey").alias("best_suppkey"),
        )
    )


Q_MIN_PRICE_SQL = """
WITH m AS (
  SELECT l_partkey, min(l_extendedprice) AS mp FROM lineitem GROUP BY l_partkey
)
SELECT m.l_partkey,
       round(min(m.mp), 2) AS min_price,
       max(l.l_suppkey) AS best_suppkey
FROM m JOIN lineitem l ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.mp
GROUP BY m.l_partkey
"""


# ----------------------------------------------- cube grouping sets
def q_part_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (brand, size-bucket): all four grouping sets in one
    pass (Spark expands to a single Expand+Agg, not four scans)."""
    part = table(spark, "part", sf_dir)
    return (
        part.withColumn("size_bucket", F.floor(F.col("p_size") / 10).cast("int"))
        .cube("p_brand", "size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("retail_total"),
        )
    )


Q_PART_CUBE_SQL = """
SELECT p_brand, CAST(floor(p_size / 10) AS INTEGER) AS size_bucket,
       count(*) AS n_parts, round(sum(p_retailprice), 2) AS retail_total
FROM part
GROUP BY CUBE (p_brand, CAST(floor(p_size / 10) AS INTEGER))
"""


# ----------------------------------------------- approximate aggregates
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates for 100 TB interactive profiling:
    HyperLogLog++ distinct counts and quantile sketches in one pass.

    No oracle_sql twin on purpose: sketch outputs are
    implementation-defined, so the driver records the weaker
    rows-only check (per the contract); the companion test bounds the
    estimates against exact values instead.
    """
    li = table(spark, "lineitem", sf_dir)
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        q.getItem(0).alias("price_p50"),
        q.getItem(1).alias("price_p95"),
        q.getItem(2).alias("price_p99"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-valued twin of q_approx_stats, hash-comparable to DuckDB:
    exact distinct counts plus exact continuous quantiles per return
    flag. Gates the profiling surface the sketches approximate; the
    sketch query itself stays a bounds-asserted capability test
    (tests/test_relational.py::test_approx_stats_bounds). Exact
    distinct = two-phase shuffle; percentiles are a single sort-based
    agg per group — both algebraic enough for 100 TB, just costlier
    than the one-pass sketches."""
    from bd_spark.catalog import rebalance

    # one-row-group local file = single-task scan (rebalance is a
    # cluster no-op, §2.5); countDistinct and percentile SPLIT into
    # two aggs joined on the 3-row group key: together they plan an
    # Expand (x2 rows through the exchange) and drag the hash-agg
    # branch into the percentile's sort/object agg — measured 2.6 s
    # combined vs 1.5 s split at sf0.1
    li = rebalance(
        table(spark, "lineitem", sf_dir).select(
            "l_returnflag", "l_orderkey", "l_extendedprice"
        )
    )
    q = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    counts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.round(q.getItem(0), 4).alias("price_p50"),
        F.round(q.getItem(1), 4).alias("price_p95"),
        F.round(q.getItem(2), 4).alias("price_p99"),
    )
    return counts.join(pcts, "l_returnflag").select(
        "l_returnflag", "n_orders", "price_p50", "price_p95",
        "price_p99", "n_lines",
    )


Q_PROFILE_STATS_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS price_p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive": q19_disjunctive,
    "q_min_price_supplier": q_min_price_supplier,
    "q_part_cube": q_part_cube,
    "q_approx_stats": q_approx_stats,
    "q_profile_stats": q_profile_stats,
}

ORACLES = {
    "q12_priority_shipping": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "q_min_price_supplier": Q_MIN_PRICE_SQL,
    "q_part_cube": Q_PART_CUBE_SQL,
    "q_profile_stats": Q_PROFILE_STATS_SQL,
}
