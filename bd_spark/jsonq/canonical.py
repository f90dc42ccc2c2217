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
    (golden corpus testdata/test_simple.jsons.ref.jsons:31,35)."""
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
