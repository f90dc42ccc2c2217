"""RFC 6901 JSON Pointer resolution over variant columns, including
the RFC's own example document (§5)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bd_spark.jsonq.pointer import json_pointer, parse_pointer

# the example document from RFC 6901 §5
RFC_DOC = {
    "foo": ["bar", "baz"],
    "": 0,
    "a/b": 1,
    "c%d": 2,
    "e^f": 3,
    "g|h": 4,
    "i\\j": 5,
    "k\"l": 6,
    " ": 7,
    "m~n": 8,
}

RFC_CASES = [
    ("", RFC_DOC),
    ("/foo", ["bar", "baz"]),
    ("/foo/0", "bar"),
    ("/", 0),
    ("/a~1b", 1),
    ("/c%d", 2),
    ("/e^f", 3),
    ("/g|h", 4),
    ("/i\\j", 5),
    ("/k\"l", 6),
    ("/ ", 7),
    ("/m~0n", 8),
]


@pytest.mark.parametrize("pointer,expect", RFC_CASES, ids=[c[0] for c in RFC_CASES])
def test_rfc6901_examples(spark, pointer, expect):
    df = spark.createDataFrame([(json.dumps(RFC_DOC),)], "t string").select(
        F.parse_json("t").alias("v")
    )
    got = df.select(F.to_json(json_pointer(F.col("v"), pointer)).alias("j")).collect()[0].j
    assert json.loads(got) == expect


def test_missing_resolves_null(spark):
    df = spark.createDataFrame([('{"a": [1]}',)], "t string").select(
        F.parse_json("t").alias("v")
    )
    for p in ["/b", "/a/5", "/a/x", "/a/0/deep", "/a/-"]:
        got = df.select(F.to_json(json_pointer(F.col("v"), p)).alias("j")).collect()[0].j
        assert got is None, p


def test_parse_pointer_rejects_fragment():
    with pytest.raises(ValueError):
        parse_pointer("a/b")
