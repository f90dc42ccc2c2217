"""Streaming queries for the driver gate: each runs REAL Structured
Streaming (readStream → watermark/window/state → memory sink) to
completion with Trigger.AvailableNow, returns the sink table, and
hash-matches a batch DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bd_spark.streaming import (
    read_events_stream,
    run_to_memory,
    sessionized_stats,
    user_running_totals_builtin,
    windowed_event_stats,
)


def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows per event type over the event stream.
    (approx_count_distinct is dropped here: the oracle gate needs
    exact-valued columns.)"""
    stream = windowed_event_stats(read_events_stream(spark, sf_dir)).drop(
        "approx_users"
    )
    return run_to_memory(stream, "complete")


Q_STREAM_WINDOWED_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based per-user session windows (30 min) on the stream."""
    stream = sessionized_stats(read_events_stream(spark, sf_dir), gap="30 minutes")
    return run_to_memory(stream, "complete")


# Spark session_window semantics: a new session starts when the gap to
# the previous event is >= 30 min; session_end = last event + gap.
Q_STREAM_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
  ) AS sid
  FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM s GROUP BY user_id, sid
"""


def q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals on the stream via the built-in
    streaming aggregation (JVM-side state; the custom
    applyInPandasWithState operator is pytest-gated separately —
    per-group pandas overhead doesn't belong on the headline path)."""
    stream = user_running_totals_builtin(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, "update")


Q_STREAM_RUNNING_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY user_id
"""


QUERIES = {
    "q_stream_windowed": q_stream_windowed,
    "q_stream_sessions": q_stream_sessions,
    "q_stream_running_totals": q_stream_running_totals,
}

ORACLES = {
    "q_stream_windowed": Q_STREAM_WINDOWED_SQL,
    "q_stream_sessions": Q_STREAM_SESSIONS_SQL,
    "q_stream_running_totals": Q_STREAM_RUNNING_TOTALS_SQL,
}
