"""RFC 6901 JSON Pointer over VARIANT columns.

The reference ships the RFC text (docs/rfc6901-jsonpointer.txt) as a
roadmap signal but implements nothing; here a literal pointer compiles
to a chain of variant navigations — pure Catalyst expressions, no UDF.

Semantics (RFC 6901 §4):
  - ``""``      → the whole document
  - ``/a/b``    → object member lookup per token
  - ``/a/0``    → array index when the target is an array and the
                  token is all-digits (no negative / leading-zero
                  index tokens per the RFC; ``-`` is end-of-array,
                  which resolves to nothing on read)
  - escapes ``~1`` → ``/`` and ``~0`` → ``~`` (in that order)
  - a missing member/index resolves to NULL (engine convention:
    errors degrade to null, reference json.rs:914-style)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bd_spark.jsonq.vexpr import as_array, as_map, vtype


def unescape_token(tok: str) -> str:
    return tok.replace("~1", "/").replace("~0", "~")


def parse_pointer(pointer: str) -> list[str]:
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise ValueError(f"JSON Pointer must start with '/': {pointer!r}")
    return [unescape_token(t) for t in pointer.split("/")[1:]]


def _is_index(tok: str) -> bool:
    # RFC 6901: "0" or digits without leading zero
    return tok.isdigit() and (tok == "0" or not tok.startswith("0"))


def json_pointer(v: Column, pointer: str) -> Column:
    """Resolve a literal RFC 6901 pointer against a variant column."""
    for tok in parse_pointer(pointer):
        t = vtype(v)
        obj_hit = F.element_at(as_map(v), tok)
        if _is_index(tok):
            arr_hit = F.element_at(as_array(v), int(tok) + 1)
            v = F.when(t == "object", obj_hit).when(t == "array", arr_hit)
        else:
            v = F.when(t == "object", obj_hit)
    return v
