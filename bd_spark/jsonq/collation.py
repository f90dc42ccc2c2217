"""JSON collation: a total order over JSON values and an
order-preserving binary sort key.

"JSON collation" is an unchecked roadmap item of the reference
(README.md:7-16); nothing implements it there. Order (jq-style,
matching the comparison operators' type ranking in vexpr):

    null < false < true < number < string < array < object

numbers numerically (int/float unified), strings by Unicode
codepoint, arrays lexicographically element-wise, objects by their
sorted key list first and then by values in key order.

``collation_key`` renders a value to bytes such that
``memcmp(key(a), key(b))`` == ``compare(a, b)`` — so a distributed
sort of documents is just ``orderBy(binary_key)``: Spark range-
partitions on the key, no comparator UDF in the sort path (the key
is computed once per row in an Arrow batch).

Encoding (FoundationDB-tuple-style): a type tag byte, then
  - number: IEEE754 big-endian with the sign-flip trick (negative →
    all bits flipped, positive → sign bit set) — memcmp-ordered;
  - string/bytes segments escape embedded 0x00 as 0x00 0xFF and
    terminate with 0x00 0x01 (escape > terminator keeps prefixes
    ordered before extensions);
  - array: concatenated element keys + terminator;
  - object: key-array segment then value-array segment.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_NULL, _T_FALSE, _T_TRUE, _T_NUM, _T_STR, _T_ARR, _T_OBJ = range(1, 8)
_TERM = b"\x00\x01"
_ESC = b"\x00\xff"


def _num_bytes(x: float) -> bytes:
    x = float(x)
    if x == 0:
        x = 0.0  # -0.0 compares equal to 0.0, so it must key equal too
    bits = struct.unpack(">Q", struct.pack(">d", x))[0]
    if bits & (1 << 63):
        bits ^= (1 << 64) - 1  # negative: flip everything
    else:
        bits |= 1 << 63  # positive: set sign bit
    return struct.pack(">Q", bits)


def _str_segment(s: str) -> bytes:
    return s.encode("utf-8").replace(b"\x00", _ESC) + _TERM


def collation_key(value: object) -> bytes:
    """Order-preserving binary key; memcmp(keys) == json_compare."""
    if value is None:
        return bytes([_T_NULL])
    if value is True:
        return bytes([_T_TRUE])
    if value is False:
        return bytes([_T_FALSE])
    if isinstance(value, (int, float)):
        return bytes([_T_NUM]) + _num_bytes(value)
    if isinstance(value, str):
        return bytes([_T_STR]) + _str_segment(value)
    if isinstance(value, list):
        return (
            bytes([_T_ARR])
            + b"".join(collation_key(x) for x in value)
            + _TERM
        )
    if isinstance(value, dict):
        keys = sorted(value)
        return (
            bytes([_T_OBJ])
            + b"".join(bytes([_T_STR]) + _str_segment(k) for k in keys)
            + _TERM
            + b"".join(collation_key(value[k]) for k in keys)
            + _TERM
        )
    raise TypeError(f"not a JSON value: {type(value)}")


def json_compare(a: object, b: object) -> int:
    """Reference three-way comparator (the spec the key must match)."""
    ra, rb = _rank(a), _rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra == _T_NUM:
        fa, fb = float(a), float(b)
        return -1 if fa < fb else (1 if fa > fb else 0)
    if ra == _T_STR:
        return -1 if a < b else (1 if a > b else 0)
    if ra == _T_ARR:
        for x, y in zip(a, b):
            c = json_compare(x, y)
            if c:
                return c
        return (len(a) > len(b)) - (len(a) < len(b))
    if ra == _T_OBJ:
        ka, kb = sorted(a), sorted(b)
        c = json_compare(ka, kb)
        if c:
            return c
        for k in ka:
            c = json_compare(a[k], b[k])
            if c:
                return c
        return 0
    return 0  # null / booleans: equal within their rank


def _rank(v: object) -> int:
    if v is None:
        return _T_NULL
    if v is False:
        return _T_FALSE
    if v is True:
        return _T_TRUE
    if isinstance(v, (int, float)):
        return _T_NUM
    if isinstance(v, str):
        return _T_STR
    if isinstance(v, list):
        return _T_ARR
    if isinstance(v, dict):
        return _T_OBJ
    raise TypeError(f"not a JSON value: {type(v)}")


def collation_key_col(v: Column) -> Column:
    """Binary collation key of a variant column (Arrow-batched)."""
    import json

    @F.pandas_udf("binary")
    def key_udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda t: collation_key(json.loads(t)) if t is not None else b"\x00"
        )

    return key_udf(F.to_json(v))


def sort_documents(stream: DataFrame, v_col: str = "v") -> DataFrame:
    """Document stream sorted by JSON collation order (nulls/errors
    first via the \\x00 key). The sort itself is a plain binary
    orderBy: range partitioning + per-partition sort, no Python in
    the comparator."""
    return (
        stream.withColumn("_ckey", collation_key_col(F.col(v_col)))
        .orderBy("_ckey")
        .drop("_ckey")
    )
