"""RFC 6902 JSON Patch: the RFC's own Appendix A examples (pure
Python) plus the Spark column path."""

from __future__ import annotations

import json

import pytest

from bd_spark.jsonq.patch import PatchError, apply_patch

# (doc, patch, expected) — RFC 6902 Appendix A (selected, verbatim)
RFC_CASES = [
    # A.1 add object member
    ({"foo": "bar"}, [{"op": "add", "path": "/baz", "value": "qux"}],
     {"baz": "qux", "foo": "bar"}),
    # A.2 add array element
    ({"foo": ["bar", "baz"]}, [{"op": "add", "path": "/foo/1", "value": "qux"}],
     {"foo": ["bar", "qux", "baz"]}),
    # A.3 remove object member
    ({"baz": "qux", "foo": "bar"}, [{"op": "remove", "path": "/baz"}],
     {"foo": "bar"}),
    # A.4 remove array element
    ({"foo": ["bar", "qux", "baz"]}, [{"op": "remove", "path": "/foo/1"}],
     {"foo": ["bar", "baz"]}),
    # A.5 replace value
    ({"baz": "qux", "foo": "bar"},
     [{"op": "replace", "path": "/baz", "value": "boo"}],
     {"baz": "boo", "foo": "bar"}),
    # A.6 move value
    ({"foo": {"bar": "baz", "waldo": "fred"}, "qux": {"corge": "grault"}},
     [{"op": "move", "from": "/foo/waldo", "path": "/qux/thud"}],
     {"foo": {"bar": "baz"}, "qux": {"corge": "grault", "thud": "fred"}}),
    # A.7 move array element
    ({"foo": ["all", "grass", "cows", "eat"]},
     [{"op": "move", "from": "/foo/1", "path": "/foo/3"}],
     {"foo": ["all", "cows", "eat", "grass"]}),
    # A.10 add nested member object
    ({"foo": "bar"}, [{"op": "add", "path": "/child", "value": {"grandchild": {}}}],
     {"foo": "bar", "child": {"grandchild": {}}}),
    # A.16 add array value
    ({"foo": ["bar"]}, [{"op": "add", "path": "/foo/-", "value": ["abc", "def"]}],
     {"foo": ["bar", ["abc", "def"]]}),
]


@pytest.mark.parametrize("doc,patch,expect", RFC_CASES)
def test_rfc6902_appendix_a(doc, patch, expect):
    assert apply_patch(doc, patch) == expect


def test_rfc6902_failures():
    # A.9 test fail; A.12 add to nonexistent target; A.13 bad index
    with pytest.raises(PatchError):
        apply_patch({"baz": "qux"},
                    [{"op": "test", "path": "/baz", "value": "bar"}])
    with pytest.raises(PatchError):
        apply_patch({"foo": "bar"},
                    [{"op": "add", "path": "/baz/bat", "value": "qux"}])
    with pytest.raises(PatchError):
        apply_patch({"name": "x"}, [{"op": "remove", "path": "/nope"}])


def test_test_op_is_json_typed():
    """`test` equality is JSON-typed: true != 1, 1.0 == 1, nested too
    (ADVICE r01: Python's True == 1 must not leak through)."""
    with pytest.raises(PatchError):
        apply_patch({"a": 1}, [{"op": "test", "path": "/a", "value": True}])
    with pytest.raises(PatchError):
        apply_patch({"a": [True]}, [{"op": "test", "path": "/a", "value": [1]}])
    assert apply_patch({"a": 1}, [{"op": "test", "path": "/a", "value": 1.0}]) == {"a": 1}
    assert apply_patch({"a": {"b": [1, "x"]}},
                       [{"op": "test", "path": "/a", "value": {"b": [1, "x"]}}]) == {"a": {"b": [1, "x"]}}


def test_json_patch_column(spark):
    from pyspark.sql import functions as F

    from bd_spark.jsonq.patch import json_patch

    df = spark.createDataFrame(
        [('{"a": 1, "b": [1, 2]}',), ('{"a": 2}',), (None,)], "t string"
    ).select(F.parse_json("t").alias("v"))
    patched = df.select(
        F.to_json(
            json_patch(
                F.col("v"),
                [
                    {"op": "add", "path": "/c", "value": 9},
                    {"op": "remove", "path": "/b/0"},
                ],
            )
        ).alias("j")
    ).collect()
    got = [json.loads(r.j) if r.j is not None else None for r in patched]
    # doc without /b fails the remove -> whole patch yields null
    assert got == [{"a": 1, "b": [2], "c": 9}, None, None]
