"""asof_join / range_join_count unit semantics on synthetic data where
every row has a different match (unlike the testdata, where all events
postdate all orders)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bd_spark.operators.joins import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:03"), 100),
            ("A", _ts("2024-01-01 10:00:07"), 200),
            ("B", _ts("2024-01-01 10:00:01"), 300),  # before any B quote
            ("B", _ts("2024-01-01 10:00:05"), 400),  # exactly at a quote
        ],
        "sym string, t timestamp, qty long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:01"), 1.0),
            ("A", _ts("2024-01-01 10:00:06"), 2.0),
            ("B", _ts("2024-01-01 10:00:05"), 3.0),
            ("B", _ts("2024-01-01 10:00:09"), 4.0),
        ],
        "sym string, t timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t")
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {
        ("A", 100): 1.0,  # latest quote <= 10:00:03 is 10:00:01
        ("A", 200): 2.0,  # 10:00:06
        ("B", 300): None,  # no quote yet
        ("B", 400): 3.0,  # simultaneous quote matches
    }


def test_asof_forward(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        direction="forward",
    )
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {
        ("A", 100): 2.0,  # next quote >= 10:00:03 is 10:00:06
        ("A", 200): None,  # no quote after 10:00:07 for A
        ("B", 300): 3.0,
        ("B", 400): 3.0,  # simultaneous
    }


def test_asof_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        tolerance=F.expr("INTERVAL 2 SECONDS"),
    )
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {
        ("A", 100): 1.0,  # 2s back: still in tolerance
        ("A", 200): 2.0,  # 1s back
        ("B", 300): None,
        ("B", 400): 3.0,  # 0s back
    }


def test_asof_row_count_preserved(spark):
    """An as-of join is 1:1 — it must never duplicate left rows, even
    with many candidate matches."""
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t")
    assert out.count() == trades.count()
