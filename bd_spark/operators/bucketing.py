"""Bucketed storage for co-located (exchange-free) joins and aggs.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Spark's
bucketed tables pre-hash-partition data on disk so a join or groupBy
on the bucket key reads co-located partitions and skips the exchange
entirely. The reference has no storage layer at all (SURVEY.md §1.4);
this is the Spark-native answer to "big-data indexing" on its roadmap
(reference README.md:7-16).

Typical flow:

    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 32)
    write_bucketed(orders,   "orders_b",   ["o_orderkey"], 32)
    j = bucketed(spark, "lineitem_b").join(
        bucketed(spark, "orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # physical plan: two bucketed scans -> SortMergeJoin, NO Exchange

Bucket counts must match on both sides; pick a count that keeps
(table_size / buckets) within executor memory at the target SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, keys: list[str],
                   num_buckets: int, sort_by: list[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets by the join key lets SortMergeJoin skip its
    sort as well — the join becomes a pure merge of pre-sorted runs.

    Idempotent against ORPHANED warehouse dirs (r7 VERDICT wrong #4):
    mode("overwrite") only replaces a table the METASTORE knows about;
    a killed writer can leave `spark-warehouse/<name>` on disk with no
    metastore entry, and the next saveAsTable throws
    LOCATION_ALREADY_EXISTS. Drop any stale entry, then clear the
    default MANAGED location only on that specific failure (r9,
    ADVICE r8: an unconditional rmtree could delete data an EXTERNAL
    table deliberately left behind, and a qualified/path-shaped name
    could resolve outside the warehouse) — and only for a plain
    unqualified identifier.
    """
    import re
    import shutil

    from pyspark.errors import PySparkException

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    w = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    w = w.sortBy(*(sort_by or keys))
    try:
        w.format("parquet").saveAsTable(name)
        return
    except PySparkException as ex:  # SparkRuntimeException in 4.x
        if "LOCATION_ALREADY_EXISTS" not in str(ex) or not re.fullmatch(
            r"[A-Za-z0-9_]+", name
        ):
            raise
    # orphaned managed dir: clear it and retry once
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    if warehouse and warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        shutil.rmtree(
            os.path.join(warehouse, name.lower()), ignore_errors=True
        )
    w.format("parquet").saveAsTable(name)


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def is_exchange_free(df: DataFrame) -> bool:
    """True when the physical plan contains no shuffle Exchange —
    the assertion that bucketing did its job."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return "Exchange" not in plan
