"""Headline relational queries over the driver's star schema.

Every query here is a pair: a Spark DataFrame program and a DuckDB
oracle SQL string producing identical (column-name-aliased) results.
These exercise the relational surface the reference lacks entirely
(SURVEY.md §2.6 — joins, aggregations, windows, sorts, set ops) which
this engine supplies natively via Catalyst.

Scale notes (100 TB design):
  - dimension joins (region/nation/supplier/part) are explicitly
    broadcast — zero shuffle on the build side;
  - fact-fact joins (orders⋈lineitem) shuffle on the join key and are
    AQE-coalesced/skew-split at runtime;
  - aggregates use partial (map-side) aggregation automatically since
    every agg here is algebraic (sum/count/avg/min/max);
  - double-typed aggregates are rounded in BOTH engines because float
    summation order is nondeterministic in any distributed engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bd_spark.catalog import table


# ---------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: scan-heavy group-aggregate over lineitem.

    Plan shape to verify at scale: parquet scan with projection pushdown
    (only 7 of 11 columns read), partial hash agg -> exchange on
    (l_returnflag, l_linestatus) [tiny cardinality] -> final agg.
    """
    li = table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: 3-way join + agg + top-N.

    customer is the small side -> broadcast; orders⋈lineitem shuffles on
    o_orderkey. Top-10 with deterministic tie-break on o_orderkey.
    """
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .where(F.col("o_orderdate") < F.lit("1997-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON o_custkey  = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: 6-way join, revenue by nation.

    region/nation/supplier broadcast (tiny at every SF); the only
    shuffles are the orders⋈lineitem key exchange and the final tiny
    group-by on n_name.
    """
    region = table(spark, "region", sf_dir)
    nation = table(spark, "nation", sf_dir)
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    supp = table(spark, "supplier", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------- q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure filter+agg — the predicate-pushdown
    showcase. All three predicates reach the parquet scan as
    PushedFilters; only 4 columns are read."""
    li = table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


# ---------------------------------------------------------------- q10
def q10_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: revenue per customer, top-20."""
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    nation = table(spark, "nation", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(max(c_acctbal), 2)                          AS acctbal
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------------ window
def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by totalprice.
    Deterministic tie-break on o_orderkey. Shuffle on o_custkey only."""
    orders = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rk",
        )
    )


Q_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) t
WHERE rk <= 3
"""


# ------------------------------------------------------- aggregation
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over order status x priority (grouping sets —
    absent in the reference, free in Spark)."""
    orders = table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


Q_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ----------------------------------------------------------- events
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event aggregation with distinct users."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.to_date(F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q_EVENTS_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CAST(ts AS DATE), event_type
"""


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured navigation: extract ``.k`` from the JSON props
    column (the jq Index op over a relational stream, FIXTURES.md §5)
    and aggregate. Stays fully JVM-side via get_json_object."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q_EVENTS_PROPS_SQL = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
       count(*)                                                         AS n
FROM events
GROUP BY event_type
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via window lag: new session when gap > 30 min.
    The canonical stateful-stream op expressed as a batch window — the
    streaming twin lives in bd_spark.streaming."""
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval comparison keeps this agnostic to TIMESTAMP vs
    # TIMESTAMP_NTZ (casting a NTZ column to BIGINT is illegal)
    prev = F.lag("ts").over(w)
    sess = F.sum(
        F.when(
            prev.isNull()
            | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0)
    ).over(w)
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.round(F.sum("session_value"), 2).alias("total_value"),
            F.sum("n_events").alias("n_events"),
        )
    )


Q_EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_sess AS (
  SELECT user_id, session_id, count(*) AS n_events,
         round(sum(value), 2) AS session_value
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       round(sum(session_value), 2) AS total_value,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_sess GROUP BY user_id
"""


# ---------------------------------------------------------- set ops
def q_setop_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: users who both clicked and purchased (INTERSECT)."""
    ev = table(spark, "events", sf_dir)
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


Q_SETOP_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


# ------------------------------------------------------ semi / anti
def q_semi_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins: customers with orders but no
    high-priority orders."""
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


Q_SEMI_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_top_customers": q10_top_customers,
    "q_window_top_orders": q_window_top_orders,
    "q_orders_rollup": q_orders_rollup,
    "q_events_daily": q_events_daily,
    "q_events_props": q_events_props,
    "q_events_sessionize": q_events_sessionize,
    "q_setop_active_buyers": q_setop_active_buyers,
    "q_semi_anti_orders": q_semi_anti_orders,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_top_customers": Q10_SQL,
    "q_window_top_orders": Q_WINDOW_SQL,
    "q_orders_rollup": Q_ROLLUP_SQL,
    "q_events_daily": Q_EVENTS_DAILY_SQL,
    "q_events_props": Q_EVENTS_PROPS_SQL,
    "q_events_sessionize": Q_EVENTS_SESSIONIZE_SQL,
    "q_setop_active_buyers": Q_SETOP_SQL,
    "q_semi_anti_orders": Q_SEMI_ANTI_SQL,
}
