"""Oracle gate for the EXTRA query tranche (registry.EXTRA).

The driver's correctness gate covers the 50 registry.GATE queries;
the operator-redundant TPC-H variants in EXTRA get the SAME
DuckDB-differential check here (row count + column names +
order-insensitive value hash), so every implemented query keeps a
hard correctness gate every run.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from bd_spark.catalog import TABLES
from bd_spark.queries import registry


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_results(spark, sf_dir):
    """Run every EXTRA query's Spark side ONCE, 8 in flight (plan
    build + collect release the GIL; compiler._ENV is thread-local).
    The DuckDB side stays serial in the per-name test — duckdb
    connections are not thread-safe and the SQL is cheap at sf0.001
    (VERDICT r5 next #8)."""
    from concurrent.futures import ThreadPoolExecutor

    qs = registry.extra_queries()

    def run(name):
        try:
            sdf = qs[name](spark, sf_dir)
            return (
                sdf.columns,
                _table_hash(sdf.columns, [tuple(r) for r in sdf.collect()]),
            )
        except Exception as e:  # noqa: BLE001 — asserted per-case
            return ("__raised__", f"{type(e).__name__}: {e}")

    with ThreadPoolExecutor(max_workers=8) as ex:
        return dict(zip(registry.EXTRA, ex.map(run, registry.EXTRA)))


@pytest.mark.parametrize("name", registry.EXTRA)
def test_extra_query_matches_oracle(spark_results, duck, name):
    scols, shash = spark_results[name]
    assert scols != "__raised__", shash
    sql = registry.extra_oracles()[name]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    on, oh = _table_hash(ocols, res.fetchall())
    assert sorted(scols) == sorted(ocols)
    assert shash == (on, oh)


def test_gate_is_exactly_fifty():
    assert len(registry.GATE) == 50
    assert len(set(registry.GATE)) == 50
    assert not set(registry.GATE) & set(registry.EXTRA)
    # every EXTRA query has an oracle — nothing ships unverified
    assert set(registry.extra_oracles()) == set(registry.EXTRA)
