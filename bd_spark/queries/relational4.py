"""Fourth tranche: the correlated-subquery TPC-H patterns (Q4/Q13/
Q17/Q22), adapted to the driver testdata's columns (no partsupp /
commitdate / phone in the synthetic schema).

The DataFrame side expresses each correlated subquery the way
Catalyst decorrelates it anyway (pre-aggregate + join); the DuckDB
oracles keep the classic correlated form, so the gate doubles as an
engine-equivalence check for decorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.catalog import table


# --------------------------------------------- q4: priority with EXISTS
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern: orders counted per priority when EXISTS a
    line item shipped more than 60 days after the order date. The
    correlated EXISTS (its condition references both tables) is a
    left-semi join with an inequality residual — one shuffle on
    orderkey; at scale AQE picks the join side."""
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------- q13: customer distribution
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 pattern: distribution of orders-per-customer,
    including zero-order customers (left outer join, then two
    aggregation levels; the second groupBy is tiny)."""
    cust = table(spark, "customer", sf_dir).select("c_custkey")
    orders = table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------- q17: small-quantity revenue
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: revenue from line items whose quantity is
    below 20% of the average quantity for that part (one brand). The
    correlated scalar subquery becomes a per-part aggregate joined
    back — computed only over the brand's parts, which is exactly the
    pruning Catalyst's decorrelation would apply."""
    li = table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        table(spark, "part", sf_dir)
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li_b = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thr = li_b.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    return (
        li_b.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


# --------------------------------------------- q22: idle rich customers
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern: customers with above-average (positive)
    balance and no urgent orders, rolled up per nation. The scalar
    subquery is a broadcast 1-row cross join; NOT EXISTS is a
    left-anti join (the priority filter pushes to the orders scan)."""
    cust = table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    urgent = (
        table(spark, "orders", sf_dir)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
