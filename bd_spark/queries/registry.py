"""Central registry of (query, oracle) pairs exposed to the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bd_spark.queries import relational, relational2, relational3, temporal

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational2.QUERIES)
    out.update(relational3.QUERIES)
    out.update(temporal.QUERIES)
    try:
        from bd_spark.queries import pipeline

        out.update(pipeline.QUERIES)
    except ImportError:
        pass
    try:
        from bd_spark.queries import jsonq_queries

        out.update(jsonq_queries.QUERIES)
    except ImportError:
        pass
    try:
        from bd_spark.queries import streaming_queries

        out.update(streaming_queries.QUERIES)
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    from bd_spark.queries import relational, relational2, relational3, temporal

    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(relational2.ORACLES)
    out.update(relational3.ORACLES)
    out.update(temporal.ORACLES)
    try:
        from bd_spark.queries import pipeline

        out.update(pipeline.ORACLES)
    except ImportError:
        pass
    try:
        from bd_spark.queries import jsonq_queries

        out.update(jsonq_queries.ORACLES)
    except ImportError:
        pass
    try:
        from bd_spark.queries import streaming_queries

        out.update(streaming_queries.ORACLES)
    except ImportError:
        pass
    return out
