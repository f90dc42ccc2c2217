"""Smoke + shape tests for the relational query surface (sf0.001)."""

from __future__ import annotations

import pytest

from bd_spark.queries import relational


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable non-empty schema


def test_q1_shape(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    rows = {(r.l_returnflag, r.l_linestatus) for r in df.collect()}
    assert len(rows) >= 3  # A/F, N/O, R/F at minimum
    assert all(c in df.columns for c in ("sum_qty", "avg_disc", "count_order"))


def test_q3_is_top10_sorted(spark, sf_dir):
    rows = relational.q3_shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_every_query_has_oracle():
    assert set(relational.ORACLES) == set(relational.QUERIES)
