"""Table catalog over the driver's parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
"""

from __future__ import annotations

import os
import uuid
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any scale factor the
# driver generates (region=5, nation=25, supplier/part grow slowly).
BROADCAST_TABLES = {"region", "nation", "supplier", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _fix_time_types(df)


# Runtime-settable SQL confs the engine's semantics depend on. Callers
# (the driver harness included) build their own SparkSessions without
# them, so every entry point sets them on the session it is handed:
#   - ansi off: jq semantics degrade type mismatches to null, never
#     throw (reference json.rs:914,938,1014); Spark 4 defaults ANSI on.
#   - LAST_WIN: object union `+` is rhs-wins (reference json.rs:963-995).
#   - UTC: oracle SQL (DuckDB) compares timestamps in UTC.
_SESSION_CONFS = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.session.timeZone": "UTC",
}

TIME_COLUMNS = ("ts", "o_orderdate", "l_shipdate")


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _SESSION_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf made static in this build; best-effort


# Back-compat alias (older call sites / tests)
_ensure_nanos_conf = ensure_session_confs


def _fix_time_types(df: DataFrame) -> DataFrame:
    """Normalize time columns to session-TZ TIMESTAMP regardless of how
    the testdata stored them. The driver's parquet stores
    ``timestamp[us]`` WITHOUT timezone → Spark reads TIMESTAMP_NTZ,
    which ``withWatermark`` rejects and which cannot cast to BIGINT.
    With the session TZ pinned to UTC (``_SESSION_CONFS``) the
    NTZ→TIMESTAMP cast is value-preserving, so DuckDB oracles agree."""
    from pyspark.sql import functions as F

    fixes = {}
    for field in df.schema.fields:
        if field.name in TIME_COLUMNS and field.dataType.simpleString() == "timestamp_ntz":
            fixes[field.name] = F.col(field.name).cast("timestamp")
    return df.withColumns(fixes) if fixes else df


# rebalance() decision memo: the partition-count probe converts the
# plan to an RDD (full physical planning, measured ~1.2 s driver-side
# per call).  The decision is a pure function of the logical plan, so
# cache it per (session, schema, Catalyst semanticHash) — rebuilt
# queries (bench reruns, repeated operator calls over the same
# source) skip the probe entirely.  Bounded FIFO.
_REBALANCE_MEMO: dict[tuple, bool] = {}
_REBALANCE_MEMO_MAX = 256

# Session identity for cache keys: NOT id(session) — CPython can
# reuse a dead session's id for a new one, resurrecting cache entries
# bound to the stopped session (ADVICE r4). A WeakKeyDictionary hands
# each live session a unique token; a GC'd session's token can never
# be handed out again.
_SESSION_TOKENS = weakref.WeakKeyDictionary()


def session_token(spark: SparkSession) -> str:
    tok = _SESSION_TOKENS.get(spark)
    if tok is None:
        tok = uuid.uuid4().hex
        _SESSION_TOKENS[spark] = tok
    return tok


def rebalance(df: DataFrame) -> DataFrame:
    """Ensure at least one partition per core before CPU-dense
    row-local compute (minhash/simhash signatures, n-gram sets, jq
    variant evaluation). Locally a small table is ONE parquet file =
    ONE input split, which would serialize the whole operator on a
    single core (measured 7 s single-core vs 0.4 s rebalanced for
    minhash signatures at sf0.1). On a real cluster input splits
    already exceed cores and this is a no-op — no shuffle added.
    (AQE-coalesced post-shuffle frames also qualify: AQE sizes
    partitions by shuffle bytes, not by the CPU density of what
    follows, so a small-but-expensive frame still needs the spread.)
    """
    try:
        p = df.sparkSession.sparkContext.defaultParallelism
        key = None
        try:
            key = (
                session_token(df.sparkSession),
                df.schema.simpleString(),
                df._jdf.queryExecution().logical().semanticHash(),
            )
        except Exception:  # noqa: BLE001 — memo is best-effort
            pass
        if key is not None and key in _REBALANCE_MEMO:
            needs = _REBALANCE_MEMO[key]
        else:
            needs = df.rdd.getNumPartitions() < p
            if key is not None:
                if len(_REBALANCE_MEMO) >= _REBALANCE_MEMO_MAX:
                    _REBALANCE_MEMO.pop(next(iter(_REBALANCE_MEMO)))
                _REBALANCE_MEMO[key] = needs
        if needs:
            return df.repartition(p)
    except Exception:
        pass
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so spark.sql() can see them."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
