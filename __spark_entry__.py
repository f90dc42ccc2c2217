"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented query/operator (SURVEY.md §2 + the
LLM-pipeline operators).
``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 analogue."""
    from bd_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bd_spark.queries import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    from bd_spark.queries import registry

    return registry.all_oracles()
