"""Central registry of (query, oracle) pairs exposed to the driver.

Imports are deliberately UNGUARDED: every module here is a required
part of the engine, and a silent `except ImportError` once hid a
broken streaming export (three queries quietly vanished from the
driver gate). A broken import should fail the whole gate loudly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from bd_spark.queries import (
        jsonq_queries,
        pipeline,
        relational,
        relational2,
        relational3,
        relational4,
        streaming_queries,
        temporal,
    )

    return [
        relational,
        relational2,
        relational3,
        relational4,
        temporal,
        pipeline,
        jsonq_queries,
        streaming_queries,
    ]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
