"""Temporal join queries: as-of join and range join over the event
stream, with DuckDB oracle twins (DuckDB has native ASOF JOIN — a
strong independent check of our union-sort formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.catalog import table
from bd_spark.operators.joins import asof_join, range_join_count


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the user's most recent order at event time
    (backward as-of join on user key).

    Output sticks to the matched TIMESTAMP (not the order key):
    o_orderdate ties within a customer would make any value column
    nondeterministic in both engines.
    """
    events = table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    j = asof_join(
        events, orders, on="user_id", left_time="ts",
        right_time="o_orderdate", right_cols=[], direction="backward",
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("_asof_time").alias("last_order_ts"),
        F.floor(
            (F.unix_timestamp("ts") - F.unix_timestamp("_asof_time")) / 86400
        ).alias("days_since"),
    )


Q_ASOF_LAST_ORDER_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderdate AS last_order_ts,
       CAST(floor(epoch(e.ts - o.o_orderdate) / 86400) AS BIGINT) AS days_since
FROM events e
ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_range_prev_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count/sum of the same user's events in the preceding
    hour — an equi-key + time-range join (shuffles on user_id only;
    the range predicate is a residual filter, never a cartesian
    explosion)."""
    events = table(spark, "events", sf_dir)
    left = events.select("event_id", "user_id", "ts")
    right = events.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    pred = (
        (F.col("p_event_id") != F.col("event_id"))
        & (F.col("p_ts") <= F.col("ts"))
        & (F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    )
    return range_join_count(
        left,
        right,
        on=[("user_id", "p_user")],
        range_pred=pred,
        aggs=[
            F.count("p_event_id").alias("n_prev_1h"),
            F.round(F.coalesce(F.sum("p_value"), F.lit(0.0)), 6).alias("prev_value"),
        ],
        left_keep=["event_id", "user_id", "ts"],
    )


Q_RANGE_PREV_EVENTS_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       count(p.event_id) AS n_prev_1h,
       round(coalesce(sum(p.value), 0.0), 6) AS prev_value
FROM events e
LEFT JOIN events p
  ON p.user_id = e.user_id
 AND p.event_id <> e.event_id
 AND p.ts <= e.ts
 AND p.ts >= e.ts - INTERVAL 1 HOUR
GROUP BY e.event_id, e.user_id, e.ts
"""


QUERIES = {
    "q_asof_last_order": q_asof_last_order,
    "q_range_prev_events": q_range_prev_events,
}

ORACLES = {
    "q_asof_last_order": Q_ASOF_LAST_ORDER_SQL,
    "q_range_prev_events": Q_RANGE_PREV_EVENTS_SQL,
}
