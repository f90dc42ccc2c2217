"""RFC 6902 JSON Patch over variant columns.

An unchecked roadmap item of the reference (README.md:7-16 "rfc6902
patch"); implemented here as a pure-Python patch engine applied per
document through an Arrow-batched pandas UDF (patching is inherently
tree surgery — not expressible as Catalyst expressions — but the
patch itself is a literal, so one UDF handles any document batch).

Failure semantics: RFC 6902 §5 says a failed op aborts the whole
patch; per the engine's error-as-data convention a failed patch
yields null (callers keep the original via coalesce if desired).
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from bd_spark.jsonq.pointer import parse_pointer


class PatchError(ValueError):
    pass


def _resolve_parent(doc: Any, tokens: list[str]) -> tuple[Any, str]:
    """Walk to the parent of the pointer target; return (parent, last)."""
    if not tokens:
        raise PatchError("pointer targets the document root")
    cur = doc
    for tok in tokens[:-1]:
        cur = _step(cur, tok)
    return cur, tokens[-1]


def _step(cur: Any, tok: str) -> Any:
    if isinstance(cur, dict):
        if tok not in cur:
            raise PatchError(f"missing member {tok!r}")
        return cur[tok]
    if isinstance(cur, list):
        if not tok.isdigit():
            raise PatchError(f"bad array index {tok!r}")
        i = int(tok)
        if i >= len(cur):
            raise PatchError(f"index {i} out of range")
        return cur[i]
    raise PatchError(f"cannot index {type(cur).__name__}")


def _get(doc: Any, tokens: list[str]) -> Any:
    cur = doc
    for tok in tokens:
        cur = _step(cur, tok)
    return cur


def _add(doc: Any, tokens: list[str], value: Any) -> Any:
    if not tokens:
        return value  # whole-document replace (RFC 6902 §4.1)
    parent, last = _resolve_parent(doc, tokens)
    if isinstance(parent, dict):
        parent[last] = value
    elif isinstance(parent, list):
        if last == "-":
            parent.append(value)
        elif last.isdigit() and int(last) <= len(parent):
            parent.insert(int(last), value)
        else:
            raise PatchError(f"bad array add index {last!r}")
    else:
        raise PatchError(f"cannot add into {type(parent).__name__}")
    return doc


def _remove(doc: Any, tokens: list[str]) -> Any:
    parent, last = _resolve_parent(doc, tokens)
    if isinstance(parent, dict):
        if last not in parent:
            raise PatchError(f"missing member {last!r}")
        del parent[last]
    elif isinstance(parent, list):
        if not (last.isdigit() and int(last) < len(parent)):
            raise PatchError(f"bad array remove index {last!r}")
        del parent[int(last)]
    else:
        raise PatchError(f"cannot remove from {type(parent).__name__}")
    return doc


def _json_eq(a: Any, b: Any) -> bool:
    """RFC 6902 §4.6 equality: JSON-typed, so booleans never equal
    numbers (Python's True == 1 would otherwise make `test` of value
    true succeed against document value 1)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_json_eq(a[k], b[k]) for k in a)
    return type(a) is type(b) and a == b


def apply_patch(doc: Any, ops: list[dict]) -> Any:
    """Apply an RFC 6902 op list to a Python value tree; raises
    PatchError on any failed op (whole patch aborts)."""
    for op in ops:
        kind = op.get("op")
        tokens = parse_pointer(op.get("path", ""))
        if kind == "add":
            doc = _add(doc, tokens, op["value"])
        elif kind == "remove":
            doc = _remove(doc, tokens)
        elif kind == "replace":
            _get(doc, tokens)  # must exist (RFC 6902 §4.3)
            doc = _remove(doc, tokens) if tokens else doc
            doc = _add(doc, tokens, op["value"])
        elif kind == "move":
            src = parse_pointer(op["from"])
            if src == tokens[: len(src)] and src != tokens:
                raise PatchError("cannot move into own child")
            val = _get(doc, src)
            doc = _remove(doc, src)
            doc = _add(doc, tokens, val)
        elif kind == "copy":
            val = json.loads(json.dumps(_get(doc, parse_pointer(op["from"]))))
            doc = _add(doc, tokens, val)
        elif kind == "test":
            if not _json_eq(_get(doc, tokens), op["value"]):
                raise PatchError(f"test failed at {op['path']!r}")
        else:
            raise PatchError(f"unknown op {kind!r}")
    return doc


def json_patch(v: Column, ops: list[dict]) -> Column:
    """Apply a literal RFC 6902 patch to every document in a variant
    column; a failed patch yields null (error-as-data)."""
    ops_json = json.dumps(ops)

    @F.pandas_udf("string")
    def patch_udf(col: pd.Series) -> pd.Series:
        parsed_ops = json.loads(ops_json)

        def one(text: str | None) -> str | None:
            if text is None:
                return None
            try:
                return json.dumps(
                    apply_patch(json.loads(text), parsed_ops),
                    ensure_ascii=False,
                )
            except (PatchError, KeyError):
                return None

        return col.map(one)

    return F.try_parse_json(patch_udf(F.to_json(v)))
