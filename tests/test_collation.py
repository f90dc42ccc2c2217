"""JSON collation: the binary key's memcmp order must equal the
reference comparator on random value pairs (hypothesis), and
sort_documents orders a stream accordingly."""

from __future__ import annotations

import functools
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from bd_spark.jsonq.collation import collation_key, json_compare, sort_documents

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=12),
    lambda ch: st.lists(ch, max_size=4)
    | st.dictionaries(st.text(max_size=6), ch, max_size=4),
    max_leaves=12,
)


def _sign(x: int) -> int:
    return (x > 0) - (x < 0)


@settings(max_examples=400)
@given(json_values, json_values)
def test_key_order_matches_comparator(a, b):
    ka, kb = collation_key(a), collation_key(b)
    assert _sign((ka > kb) - (ka < kb)) == _sign(json_compare(a, b))


def test_type_rank_order():
    ordering = [None, False, True, -1e9, 0, 3.5, "", "a", [], [1], {}, {"a": 1}]
    keys = [collation_key(v) for v in ordering]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)


def test_prefix_array_sorts_first():
    assert collation_key([1]) < collation_key([1, 0])
    assert collation_key("ab") < collation_key("ab\x00")  # embedded NUL extends


def test_sort_documents(spark):
    from bd_spark.jsonq.runtime import JsonQ

    docs = ['{"z": 1}', "3", "null", '"x"', "[1,2]", "true", "2.5", "false"]
    stream = JsonQ(spark).stream_from_texts(docs)
    out = [
        json.loads(r.j)
        for r in sort_documents(stream).selectExpr("to_json(v) AS j").collect()
    ]
    expect = sorted(
        (json.loads(d) for d in docs),
        key=functools.cmp_to_key(json_compare),
    )
    assert out == expect
