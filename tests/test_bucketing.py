"""Bucketed tables make the orderkey join and aggregation
exchange-free, and results match the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bd_spark.catalog import table
from bd_spark.operators.bucketing import bucketed, is_exchange_free, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        table(spark, "lineitem", sf_dir), "t_lineitem_b", ["l_orderkey"], 8
    )
    write_bucketed(
        table(spark, "orders", sf_dir), "t_orders_b", ["o_orderkey"], 8
    )
    # at test SF both sides fit under the broadcast threshold, which
    # would bypass the bucketed SortMergeJoin we are asserting on; at
    # real fact-fact scale neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_join_is_exchange_free(spark, sf_dir, bucketed_tables):
    li, orders = bucketed(spark, "t_lineitem_b"), bucketed(spark, "t_orders_b")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    assert is_exchange_free(j)

    plain = (
        table(spark, "lineitem", sf_dir)
        .join(
            table(spark, "orders", sf_dir),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_quantity", "o_totalprice")
    )
    assert j.count() == plain.count()


def test_bucketed_agg_is_exchange_free(spark, bucketed_tables):
    g = (
        bucketed(spark, "t_lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert is_exchange_free(g)
    assert g.count() > 0


def test_write_bucketed_survives_orphaned_warehouse_dir(spark, sf_dir):
    """r7 VERDICT wrong #4: a killed writer leaves
    spark-warehouse/<table> on disk with NO metastore entry;
    saveAsTable then threw LOCATION_ALREADY_EXISTS. write_bucketed
    must clear the stale location and succeed."""
    import os

    from bd_spark.catalog import table

    name = "t_orphan_regression"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    loc = os.path.join(warehouse, name)
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "orphan.parquet"), "w") as f:
        f.write("stale")
    try:
        region = table(spark, "region", sf_dir)
        write_bucketed(region, name, ["r_regionkey"], 2)
        assert bucketed(spark, name).count() == region.count()
        # and plain re-write over a LIVE table still works
        write_bucketed(region, name, ["r_regionkey"], 2)
        assert bucketed(spark, name).count() == region.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
