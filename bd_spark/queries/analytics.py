"""Analytics patterns beyond the TPC-H families: RANGE-frame rolling
windows and cohort retention — the two everyday BI shapes the earlier
tranches didn't exercise (q_window_top_orders ranks, q_events_daily
buckets; neither uses a sliding frame or a self-derived cohort dim).

Scale notes (100 TB):
- The rolling window runs over the DAILY aggregate, not events: the
  groupBy shrinks the input to one row per day (map-side combinable)
  before any window sort, so the unpartitioned window sees ~365 rows
  per year regardless of event volume.
- Retention joins events against a per-user first-seen aggregate on
  the uniform user_id key — one shuffle each side, no window at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bd_spark.catalog import table


# ------------------------------------------ rolling revenue window
def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average (RANGE frame over days) and running total
    (ROWS frame) of daily revenue. The RANGE frame orders by epoch-day
    so date gaps widen the frame correctly (a ROWS 6-preceding frame
    would silently span gaps)."""
    ev = table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(F.round(F.sum("value"), 2).alias("revenue"))
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w_range = Window.orderBy(epoch_day).rangeBetween(-6, 0)
    w_rows = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("avg7", F.round(F.avg("revenue").over(w_range), 6))
        .withColumn("cum", F.round(F.sum("revenue").over(w_rows), 2))
        .orderBy("day")
    )


Q_ROLLING_REVENUE_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS revenue
  FROM events GROUP BY 1
)
SELECT day, revenue,
       round(avg(revenue) OVER (
         ORDER BY day
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ), 6) AS avg7,
       round(sum(revenue) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS cum
FROM daily
ORDER BY day
"""


# ------------------------------------------ cohort retention
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day,
    counted on each later active day (offset 0..7). Two aggregations
    and one equi-join on user_id — no window, no self-join on the
    fact table."""
    ev = table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    act = ev.distinct()
    off = F.datediff(F.col("day"), F.col("cohort"))
    return (
        act.join(firstseen, "user_id")
        .where(off <= 7)
        .groupBy("cohort", off.alias("offset_days"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort", "offset_days")
    )


Q_EVENTS_RETENTION_SQL = """
WITH firstseen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort, datediff('day', cohort, day) AS offset_days,
       count(*) AS n_users
FROM act JOIN firstseen USING (user_id)
WHERE datediff('day', cohort, day) <= 7
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ------------------------------------------------- pivot / crosstab
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily × event-type revenue crosstab via DataFrame PIVOT with an
    EXPLICIT value list: the plan is a (day, type) measure aggregate
    feeding a pivotfirst aggregate on day — both map-side combinable
    on uniform keys. Explicit values matter twice at 100 TB: omitting
    them costs an eager distinct-scan JOB to discover the columns and
    makes the output schema data-dependent downstream."""
    ev = table(spark, "events", sf_dir)
    out = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum("value"), 6))
    )
    return out


Q_PIVOT_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS day,
       round(sum(CASE WHEN event_type = 'click' THEN value END), 6)
         AS click,
       round(sum(CASE WHEN event_type = 'error' THEN value END), 6)
         AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6)
         AS purchase,
       round(sum(CASE WHEN event_type = 'signup' THEN value END), 6)
         AS signup,
       round(sum(CASE WHEN event_type = 'view' THEN value END), 6)
         AS view
FROM events
GROUP BY 1
"""


# --------------------------------------------- rank-family windows
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-function family in one window: ntile quartiles,
    percent_rank, cume_dist, and dense_rank over order totalprice
    within each order priority — one shuffle on the partition key,
    deterministic tie-break on o_orderkey so every engine agrees
    bit-for-bit."""
    orders = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


Q_WINDOW_RANKS_SQL = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       dense_rank() OVER w AS drank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
"""


QUERIES = {
    "q_rolling_revenue": q_rolling_revenue,
    "q_events_retention": q_events_retention,
    "q_pivot_daily": q_pivot_daily,
    "q_window_ranks": q_window_ranks,
}

ORACLES = {
    "q_rolling_revenue": Q_ROLLING_REVENUE_SQL,
    "q_events_retention": Q_EVENTS_RETENTION_SQL,
    "q_pivot_daily": Q_PIVOT_DAILY_SQL,
    "q_window_ranks": Q_WINDOW_RANKS_SQL,
}
