"""Third tranche: nation-pair volume (q7 pattern), exact-distinct
variety (q16 pattern), and event funnel analysis."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.catalog import table


# --------------------------------------------- q7: nation-pair volume
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 pattern: revenue between two nations by direction and
    year. Both nation joins broadcast; the only large shuffle is
    orders⋈lineitem."""
    nation = table(spark, "nation", sf_dir)
    cust = table(spark, "customer", sf_dir)
    supp = table(spark, "supplier", sf_dir)
    orders = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    pair = (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2") | (
        F.col("cust_nation") == "NATION_2"
    ) & (F.col("supp_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q7_SQL = """
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# --------------------------------------------- q16: exact-distinct variety
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: exact distinct supplier count per
    (brand, type). Exact distinct = two-phase shuffle (dedup on the
    full key, then count) — the pattern approx_count_distinct avoids;
    both belong in the surface."""
    part = table(spark, "part", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
        .limit(50)
    )


Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 50
"""


# --------------------------------------------- funnel analysis
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per user, does a purchase follow the
    FIRST signup within 24h? One pass: conditional min aggregations
    per user, no self-join of the event table."""
    ev = table(spark, "events", sf_dir)
    first_signup = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).alias("first_signup")
    per_user = ev.groupBy("user_id").agg(
        first_signup,
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchases"),
    )
    converted = F.exists(
        "purchases",
        lambda p: (p > F.col("first_signup"))
        & (p <= F.col("first_signup") + F.expr("INTERVAL 24 HOURS")),
    )
    return (
        per_user.where(F.col("first_signup").isNotNull())
        .select(
            "user_id",
            "first_signup",
            F.coalesce(converted, F.lit(False)).alias("converted_24h"),
        )
    )


Q_FUNNEL_SQL = """
WITH s AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
  FROM events GROUP BY user_id
)
SELECT s.user_id, s.first_signup,
       coalesce(bool_or(e.ts > s.first_signup
                        AND e.ts <= s.first_signup + INTERVAL 24 HOURS), false)
         AS converted_24h
FROM s LEFT JOIN events e
  ON e.user_id = s.user_id AND e.event_type = 'purchase'
WHERE s.first_signup IS NOT NULL
GROUP BY s.user_id, s.first_signup
"""


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q16_supplier_variety": q16_supplier_variety,
    "q_events_funnel": q_events_funnel,
}

ORACLES = {
    "q7_nation_volume": Q7_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q_events_funnel": Q_FUNNEL_SQL,
}
