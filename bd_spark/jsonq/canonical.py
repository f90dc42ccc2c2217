"""Reference-parity canonical JSON serializer.

Reproduces the reference's `Json: Display` output (json.rs:568-609):
  - object keys sorted (json.rs:501-507)
  - floats in Rust `{:e}` scientific notation (json.rs:577):
    10.2 -> "1.02e1", 0.2 -> "2e-1", 100.0 -> "1e2"
  - escape table (json.rs.lookup:37-90): `"` `\\` and control chars
    escaped; `/` NOT escaped; non-ASCII emitted literally

Used by the golden-corpus conformance tests (testdata/
test_simple.jsons.ref.jsons) and the canonical text sink. DuckDB
oracle checks use value equality, so this stays out of the hot path
(SURVEY.md §4.3).
"""

from __future__ import annotations

from decimal import Decimal

_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def format_float(x: float) -> str:
    """Rust `{:e}` format: shortest mantissa that round-trips,
    exponent without sign-padding. Negative zero normalizes to 0e0
    (golden corpus testdata/test_simple.jsons.ref.jsons:31,35).

    Built from ``repr(x)`` — CPython's repr IS the shortest decimal
    that round-trips (same digits the old try-precisions loop found),
    re-normalized to one leading digit via Decimal.as_tuple. ~2-3x
    faster than the loop (it ran up to 17 formatted round-trip
    probes per float), which dominated the canonical sink's Python
    slow path; equivalence is property-tested against the loop."""
    if x == 0.0:
        return "0e0"
    sign, digits, exp = Decimal(repr(x)).normalize().as_tuple()
    mant = str(digits[0])
    if len(digits) > 1:
        mant += "." + "".join(map(str, digits[1:]))
    return f"{'-' if sign else ''}{mant}e{exp + len(digits) - 1}"


def _format_float_probing(x: float) -> str:
    """The original try-increasing-precisions formatter — kept ONLY
    as the test oracle for format_float's equivalence property."""
    if x == 0.0:
        return "0e0"
    for prec in range(1, 18):
        s = f"{x:.{prec}e}"
        if float(s) == x:
            break
    mant, exp = s.split("e")
    mant = mant.rstrip("0").rstrip(".")
    if mant in ("", "-"):
        mant += "0"
    return f"{mant}e{int(exp)}"


def escape_string(s: str) -> str:
    out = []
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return '"' + "".join(out) + '"'


def canonicalize(value: object) -> str:
    """Python value tree -> reference canonical text."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return format_float(value)
    if isinstance(value, str):
        return escape_string(value)
    if isinstance(value, list):
        return "[" + ",".join(canonicalize(x) for x in value) + "]"
    if isinstance(value, dict):
        items = sorted(value.items())  # key-sorted, dup impossible here
        return "{" + ",".join(f"{escape_string(k)}:{canonicalize(v)}" for k, v in items) + "}"
    raise TypeError(f"not a JSON value: {type(value)}")
