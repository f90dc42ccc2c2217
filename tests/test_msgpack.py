"""MsgPack source tests: spec-v5 format-byte vectors, round-trips,
the concatenated-stream reader, and the Spark document-stream bridge
(including a jq query over msgpack-decoded docs) — the msgpack twin
of tests/test_cbor.py."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bd_spark.jsonq.runtime import JsonQ
from bd_spark.sources import msgpack

# (hex, decoded-as-JSON-model) — msgpack spec v5 formats
VECTORS = [
    ("00", 0),
    ("7f", 127),
    ("e0", -32),
    ("ff", -1),
    ("cc80", 128),
    ("cdffff", 65535),
    ("ce00010000", 65536),
    ("cf0000000100000000", 1 << 32),
    ("cf ffffffffffffffff".replace(" ", ""), (1 << 64) - 1),
    ("d0 80".replace(" ", ""), -128),
    ("d1 8000".replace(" ", ""), -32768),
    ("d2 80000000".replace(" ", ""), -(1 << 31)),
    ("d3 8000000000000000".replace(" ", ""), -(1 << 63)),
    ("c0", None),
    ("c2", False),
    ("c3", True),
    ("cb3ff199999999999a", 1.1),
    ("ca3f800000", 1.0),  # float32
    ("a0", ""),
    ("a161", "a"),
    ("a449455446", "IETF"),
    ("d9 05 68656c6c6f".replace(" ", ""), "hello"),
    ("90", []),
    ("93010203", [1, 2, 3]),
    ("dc 0003 010203".replace(" ", ""), [1, 2, 3]),  # array16
    ("80", {}),
    ("82a16101a162a163", {"a": 1, "b": "c"}),
    ("de 0001 a16101".replace(" ", ""), {"a": 1}),  # map16
    ("81 01 02".replace(" ", ""), {"1": 2}),  # int key stringifies
    # bin -> base64url (01 02 03 04)
    ("c4 04 01020304".replace(" ", ""), "AQIDBA"),
    # ext / fixext -> null (no JSON form)
    ("d4 01 aa".replace(" ", ""), None),
    ("c7 02 05 beef".replace(" ", ""), None),
    # nested
    ("92 93 01 02 03 81 a178 c0".replace(" ", ""), [[1, 2, 3], {"x": None}]),
]


@pytest.mark.parametrize("hx,expected", VECTORS)
def test_spec_vectors(hx, expected):
    assert msgpack.decode(bytes.fromhex(hx)) == expected


def test_decode_errors():
    for bad in ["c1", "cc", "cdff", "a2 61".replace(" ", ""), "91",
                "81a161", "d9", "dc00"]:
        with pytest.raises(msgpack.MsgPackError):
            msgpack.decode(bytes.fromhex(bad))
    with pytest.raises(msgpack.MsgPackError):
        msgpack.decode(bytes.fromhex("c0c0"))  # trailing bytes


def test_nonfinite_floats_become_null():
    import struct

    for x in (float("nan"), float("inf"), float("-inf")):
        assert msgpack.decode(b"\xcb" + struct.pack(">d", x)) is None


_JSONISH = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(_JSONISH)
def test_round_trip(value):
    assert msgpack.decode(msgpack.encode(value)) == value


def test_decode_all_stream():
    buf = msgpack.encode({"a": 1}) + msgpack.encode([2, 3]) + msgpack.encode("x")
    assert msgpack.decode_all(buf) == [{"a": 1}, [2, 3], "x"]


def test_stream_from_binary_column(spark):
    rows = [
        (0, bytearray(msgpack.encode({"k": 1, "tags": ["a", "b"]}))),
        (1, bytearray(msgpack.encode([10, 20]))),
        (2, bytearray(b"\xc1")),            # reserved byte -> err row
        (3, None),                           # null payload -> err row
    ]
    df = spark.createDataFrame(rows, "seq long, blob binary")
    out = msgpack.stream_from_binary_column(df, "blob").orderBy("seq")
    got = out.select("seq", F.to_json("v").alias("j"), "err").collect()
    assert json.loads(got[0].j) == {"k": 1, "tags": ["a", "b"]}
    assert json.loads(got[1].j) == [10, 20]
    assert got[2].err and "decode error" in got[2].err
    assert got[3].err and "null input" in got[3].err


def test_multi_document_burst(spark):
    blob = b"".join(msgpack.encode({"i": i}) for i in range(3))
    df = spark.createDataFrame([(7, bytearray(blob))], "seq long, blob binary")
    out = msgpack.stream_from_binary_column(df, "blob", multi=True).orderBy(
        "seq", "ord"
    )
    got = out.select("ord", F.to_json("v").alias("j")).collect()
    assert [r.ord for r in got] == [[0], [1], [2]]
    assert [json.loads(r.j)["i"] for r in got] == [0, 1, 2]


def test_jq_over_msgpack_stream(spark):
    docs = [{"user": {"name": f"u{i}", "score": i * 10}} for i in range(4)]
    df = spark.createDataFrame(
        [(i, bytearray(msgpack.encode(d))) for i, d in enumerate(docs)],
        "seq long, blob binary",
    )
    stream = msgpack.stream_from_binary_column(df, "blob")
    out = JsonQ(spark).run(".user.score", stream)
    vals = [json.loads(r.j) for r in out.select(F.to_json("v").alias("j")).collect()]
    assert vals == [0, 10, 20, 30]
