"""CBOR source tests: RFC 8949 Appendix A vectors, round-trips, the
multi-document sequence reader, and the Spark document-stream bridge
(including a jq query over CBOR-decoded docs)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bd_spark.jsonq.runtime import JsonQ
from bd_spark.sources import cbor

# (hex, decoded-as-JSON-model) — from RFC 8949 Appendix A
RFC_VECTORS = [
    ("00", 0),
    ("01", 1),
    ("0a", 10),
    ("17", 23),
    ("1818", 24),
    ("18ff", 255),
    ("190100", 256),
    ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("20", -1),
    ("29", -10),
    ("3863", -100),
    ("3903e7", -1000),
    ("f4", False),
    ("f5", True),
    ("f6", None),
    ("f7", None),  # undefined -> null
    ("fb3ff199999999999a", 1.1),
    ("f93c00", 1.0),  # half-precision
    ("fa47c35000", 100000.0),  # single-precision
    ("60", ""),
    ("6161", "a"),
    ("6449455446", "IETF"),
    ("62225c", "\"\\"),
    ("62c3bc", "ü"),
    ("80", []),
    ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("98190102030405060708090a0b0c0d0e0f101112131415161718181819",
     list(range(1, 26))),
    ("a0", {}),
    ("a201020304", {"1": 2, "3": 4}),  # int keys stringify
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("826161a161626163", ["a", {"b": "c"}]),
    # indefinite lengths
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("7f657374726561646d696e67ff", "streaming"),
    # tags unwrap to content
    ("c11a514b67b0", 1363896240),
    # byte string -> base64url (RFC 8949 §6.1): h'01020304'
    ("4401020304", "AQIDBA"),
]


@pytest.mark.parametrize("hx,expected", RFC_VECTORS)
def test_rfc8949_vectors(hx, expected):
    assert cbor.decode(bytes.fromhex(hx)) == expected


def test_decode_errors():
    for bad in ["18", "1a0000", "62c3", "81", "a161", "5f00ff", "ff"]:
        with pytest.raises(cbor.CborError):
            cbor.decode(bytes.fromhex(bad))
    with pytest.raises(cbor.CborError):
        cbor.decode(bytes.fromhex("0001"))  # trailing bytes


def test_nonfinite_floats_become_null():
    assert cbor.decode(bytes.fromhex("f97e00")) is None  # NaN
    assert cbor.decode(bytes.fromhex("f97c00")) is None  # Infinity
    assert cbor.decode(bytes.fromhex("f9fc00")) is None  # -Infinity


@pytest.mark.parametrize("value", [
    0, 1, -1, 23, 24, 255, 65536, -100000, 1.5, -2.25,
    "", "hello", "ü水", True, False, None,
    [1, [2, "x"], {"k": None}], {"a": 1, "b": [True, 2.5], "c": {"d": "e"}},
])
def test_round_trip(value):
    assert cbor.decode(cbor.encode(value)) == value


def test_decode_all_sequence():
    buf = cbor.encode(1) + cbor.encode({"a": 2}) + cbor.encode([3])
    assert cbor.decode_all(buf) == [1, {"a": 2}, [3]]
    assert cbor.decode_all(b"") == []


def test_stream_from_binary_column(spark):
    rows = [
        (0, cbor.encode({"k": 1, "s": "x"})),
        (1, cbor.encode({"k": 2, "s": "y"})),
        (2, b"\x18"),  # truncated -> in-band error
        (3, None),
    ]
    df = spark.createDataFrame(rows, "seq long, payload binary")
    stream = cbor.stream_from_binary_column(df, "payload")
    got = {r.seq: (r.j, r.err) for r in stream.select(
        "seq", F.to_json("v").alias("j"), "err").collect()}
    assert json.loads(got[0][0]) == {"k": 1, "s": "x"} and got[0][1] is None
    assert json.loads(got[1][0]) == {"k": 2, "s": "y"} and got[1][1] is None
    assert got[2][1].startswith("decode error:")
    assert got[3][1] == "decode error: null input"


def test_multi_document_burst(spark):
    payload = cbor.encode({"n": 1}) + cbor.encode({"n": 2})
    df = spark.createDataFrame([(7, payload)], "seq long, payload binary")
    stream = cbor.stream_from_binary_column(df, "payload", multi=True)
    rows = stream.orderBy("seq", "ord").select(
        "seq", "ord", F.to_json("v").alias("j")).collect()
    assert [(r.seq, list(r.ord), json.loads(r.j)) for r in rows] == [
        (7, [0], {"n": 1}), (7, [1], {"n": 2}),
    ]


def test_jq_over_cbor_stream(spark):
    """The whole point: a bd/jq query runs unchanged over CBOR input."""
    rows = [(i, cbor.encode({"k": i * 10, "tag": "t"})) for i in range(4)]
    df = spark.createDataFrame(rows, "seq long, payload binary")
    stream = cbor.stream_from_binary_column(df, "payload")
    out = JsonQ(spark).run("{id: .k, big: (.k > 15)}", stream)
    got = sorted(
        (r.id, r.big)
        for r in out.select(
            F.try_variant_get("v", "$.id", "long").alias("id"),
            F.try_variant_get("v", "$.big", "boolean").alias("big"),
        ).collect()
    )
    assert got == [(0, False), (10, False), (20, True), (30, True)]
