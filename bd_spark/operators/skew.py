"""Explicit skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (enabled in bd_spark.session) handles most
runtime skew, but two cases still need explicit salting at 100 TB:

  1. a HOT KEY whose single value exceeds what one task can hold even
     after AQE splits (AQE splits the partition, but every split of
     the build side must still be joined against the full probe side
     of that key);
  2. non-algebraic aggregations (collect_list/collect_set) where
     map-side partial aggregation cannot shrink the hot key's data.

``salted_join`` replicates the small side SALT times and scatters the
big side uniformly, so the hot key spreads across SALT tasks.
``salted_collect_set`` aggregates in two stages: per-(key, salt)
partials, then a cheap merge of SALT partial sets per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` has skewed join-key frequencies.

    big rows scatter via a uniform hash salt; small rows replicate
    across all SALT salts (explode of a literal range — cost is
    |small| * salt, which is why this is for small/medium build
    sides).  Result equals ``big.join(small, on, how)`` row-for-row.
    """
    salted_big = big.withColumn(
        "_salt", (F.xxhash64(F.col(on)) % salt + salt) % salt
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def salted_collect_set(df: DataFrame, key: str, value: str,
                       salt: int = 16) -> DataFrame:
    """collect_set per key, salted: stage 1 collects per (key, salt)
    partition-bounded partial sets; stage 2 merges SALT small arrays
    per key.  No single task ever materializes a hot key's full value
    list from raw rows."""
    partial = (
        df.withColumn("_salt", (F.xxhash64(F.col(value)) % salt + salt) % salt)
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias("values")
        )
    )
