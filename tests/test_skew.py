"""Salted join / salted collect_set equal their unsalted twins on a
deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from bd_spark.operators.skew import salted_collect_set, salted_join


def _skewed(spark):
    # 10k rows of one hot key + a tail of 100 normal keys
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("payload")
    )
    return hot.union(tail)


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k5", 2), ("k42", 3), ("absent", 4)], "k string, v int"
    )
    got = salted_join(big, small, "k", salt=8)
    plain = big.join(small, "k")
    assert got.count() == plain.count() == 10_002
    assert got.groupBy("k").count().orderBy("k").collect() == (
        plain.groupBy("k").count().orderBy("k").collect()
    )


def test_salted_join_left(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("k5", 2)], "k string, v int")
    got = salted_join(big, small, "k", salt=4, how="left")
    assert got.count() == big.count()
    assert got.where("v IS NOT NULL").count() == 1


def test_salted_collect_set_matches_plain(spark):
    df = _skewed(spark).withColumn("payload", F.col("payload") % 50)
    got = {r.k: r.values for r in salted_collect_set(df, "k", "payload").collect()}
    plain = {
        r.k: r.values
        for r in df.groupBy("k")
        .agg(F.array_sort(F.collect_set("payload")).alias("values"))
        .collect()
    }
    assert got == plain
