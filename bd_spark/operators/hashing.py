"""Portable deterministic hashing primitives.

Every hash here is computable bit-for-bit in BOTH Spark SQL and
DuckDB SQL, so that every dedup/similarity operator can ship a DuckDB
oracle (the driver's correctness gate) without a Python reference
implementation leaking into the data path.

Core primitive: ``H60(s)`` = first 15 hex chars of md5(s) as a 60-bit
integer.

  Spark : CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

MinHash permutations are universal hashes ``(a*h + b) mod P31`` with
P31 = 2^31 - 1 (Mersenne prime).  Keeping h, a, b < 2^31 bounds the
product below 2^62, so the arithmetic never overflows BIGINT in
either engine (DuckDB raises on overflow; Spark would silently wrap).

Scale note: all of these are row-local scalar expressions — they run
inside whole-stage codegen, shuffle nothing, and cost O(bytes) per
row regardless of cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: keeps universal-hash products < 2^62.
P31 = 2_147_483_647

# Knuth multiplicative constant / LCG constants for derived coefficients.
_KNUTH = 2_654_435_761
_LCG_A = 1_103_515_245
_LCG_C = 12_345


def minhash_coefficients(k: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) pairs for k universal hash permutations.

    Pure integer arithmetic so the exact same literals can be pasted
    into the DuckDB oracle SQL.  a is forced odd and non-zero.
    """
    a = [((2 * j + 1) * _KNUTH) % P31 or 1 for j in range(k)]
    b = [(_LCG_A * (j + 1) + _LCG_C) % P31 for j in range(k)]
    return a, b


def lit_longs(vals) -> Column:
    """Literal BIGINT array via ONE SQL-parsed expression — per-element
    ``F.lit`` costs a Py4J round-trip each (see similarity._lit_vec)."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in vals) + ")")


def h60(col: Column) -> Column:
    """60-bit md5-derived hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql_duckdb(expr: str) -> str:
    """The DuckDB-side twin of :func:`h60` as a SQL fragment."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h31(col: Column) -> Column:
    """h60 reduced mod P31 — the input domain of minhash permutations."""
    return h60(col) % F.lit(P31)


def h31_sql_duckdb(expr: str) -> str:
    return f"({h60_sql_duckdb(expr)} % {P31})"
