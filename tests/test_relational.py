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


def test_approx_stats_bounds(spark, sf_dir):
    """Sketch estimates stay within their error bounds of exact values."""
    from bd_spark.catalog import table
    from bd_spark.queries.relational2 import q_approx_stats
    from pyspark.sql import functions as F

    got = {r.l_returnflag: r for r in q_approx_stats(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: r
        for r in table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        g = got[k]
        assert g.n_lines == e.n_lines  # exact column stays exact
        assert abs(g.approx_orders - e.orders) / e.orders < 0.1
        assert abs(g.price_p50 - e.median) / e.median < 0.05
        assert g.price_p50 <= g.price_p95 <= g.price_p99
