"""Lenient, incremental JSON document parser (reference parity).

Implements the RFC 8259 grammar with the reference parser's documented
leniencies (/root/reference/src/json.rs:163-427, SURVEY.md §3C):

  - numbers may carry a leading ``+``, bare fractions (``.2``), and
    leading zeros (``00``, ``001``) — json.rs:226-249;
  - commas in arrays/objects are effectively optional —
    json.rs:385-388, 423-425 skip-if-present;
  - full ``\\uXXXX`` escapes including UTF-16 surrogate pairs —
    json.rs:251-365;
  - duplicate object keys are last-write-wins and objects are
    key-sorted (handled at serialization; json.rs:501-507);
  - negative zero normalizes to ``0``/``0e0`` (golden corpus
    testdata/test_simple.jsons.ref.jsons:31,35).

``iter_documents`` reproduces the ``Jsons`` incremental multi-document
reader (json.rs:123-160): whitespace-separated concatenated values
from a stream, parsing as soon as a complete value is buffered.

This is the *driver-side / per-file parity* path. The scalable path
for well-formed JSON-Lines is ``spark.read.text`` + ``try_parse_json``
(bd_spark.sources.jsons) which stays entirely JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

_WS = " \t\n\r"
_NUM_CHARS = "+-0123456789.eE"
_LITERALS = {"null": None, "true": True, "false": False}


class JsonParseError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} at byte {pos}")
        self.pos = pos


class Incomplete(ValueError):
    """Buffer ends before the value does — read more input."""


def _skip_ws(text: str, pos: int) -> int:
    while pos < len(text) and text[pos] in _WS:
        pos += 1
    return pos


def parse_value(text: str, pos: int = 0) -> tuple[object, int]:
    """Parse one JSON value starting at ``pos``; return (value, end).

    Raises ``Incomplete`` if the text ends mid-value (incremental
    callers buffer more and retry) and ``JsonParseError`` on a
    malformed document.
    """
    pos = _skip_ws(text, pos)
    if pos >= len(text):
        raise Incomplete("empty")
    ch = text[pos]
    if ch == "{":
        return _parse_object(text, pos)
    if ch == "[":
        return _parse_array(text, pos)
    if ch == '"':
        return _parse_string(text, pos)
    if ch in "-+0123456789.":
        return _parse_number(text, pos)
    for lit, val in _LITERALS.items():
        if text.startswith(lit, pos):
            return val, pos + len(lit)
        # a prefix of a literal at end-of-buffer may complete later
        if lit.startswith(text[pos : pos + len(lit)]) and len(text) - pos < len(lit):
            raise Incomplete(lit)
    raise JsonParseError(f"unexpected character {ch!r}", pos)


def _parse_number(text: str, pos: int) -> tuple[object, int]:
    end = pos
    while end < len(text) and text[end] in _NUM_CHARS:
        end += 1
    if end == len(text):
        # the number might continue in the next chunk ("12" + "3.5")
        raise Incomplete("number")
    lit = text[pos:end]
    try:
        if any(c in lit for c in ".eE"):
            val = float(lit)
            if val == 0.0:
                val = 0.0  # normalize -0.0 (golden corpus line 31/35)
            return val, end
        return int(lit), end
    except ValueError:
        raise JsonParseError(f"bad number {lit!r}", pos) from None


def _parse_string(text: str, pos: int) -> tuple[str, int]:
    out: list[str] = []
    i = pos + 1
    pending_high: int | None = None  # first half of a surrogate pair

    def flush_high() -> None:
        nonlocal pending_high
        if pending_high is not None:
            out.append(chr(pending_high))
            pending_high = None

    while True:
        if i >= len(text):
            raise Incomplete("string")
        ch = text[i]
        if ch == '"':
            flush_high()
            return "".join(out), i + 1
        if ch == "\\":
            if i + 1 >= len(text):
                raise Incomplete("escape")
            esc = text[i + 1]
            if esc == "u":
                if i + 6 > len(text):
                    raise Incomplete("unicode escape")
                try:
                    code = int(text[i + 2 : i + 6], 16)
                except ValueError:
                    raise JsonParseError("bad \\u escape", i) from None
                if 0xD800 <= code <= 0xDBFF:
                    flush_high()
                    pending_high = code
                elif 0xDC00 <= code <= 0xDFFF and pending_high is not None:
                    combined = 0x10000 + ((pending_high - 0xD800) << 10) + (code - 0xDC00)
                    pending_high = None
                    out.append(chr(combined))
                else:
                    flush_high()
                    out.append(chr(code))
                i += 6
                continue
            flush_high()
            mapped = {'"': '"', "\\": "\\", "/": "/", "b": "\b",
                      "f": "\f", "n": "\n", "r": "\r", "t": "\t"}.get(esc)
            if mapped is None:
                raise JsonParseError(f"bad escape \\{esc}", i)
            out.append(mapped)
            i += 2
            continue
        flush_high()
        out.append(ch)
        i += 1


def _parse_array(text: str, pos: int) -> tuple[list, int]:
    out: list = []
    i = pos + 1
    while True:
        i = _skip_ws(text, i)
        if i >= len(text):
            raise Incomplete("array")
        if text[i] == "]":
            return out, i + 1
        val, i = parse_value(text, i)
        out.append(val)
        i = _skip_ws(text, i)
        if i < len(text) and text[i] == ",":  # comma optional (json.rs:385-388)
            i += 1


def _parse_object(text: str, pos: int) -> tuple[dict, int]:
    out: dict = {}
    i = pos + 1
    while True:
        i = _skip_ws(text, i)
        if i >= len(text):
            raise Incomplete("object")
        if text[i] == "}":
            return out, i + 1
        if text[i] != '"':
            raise JsonParseError("expected object key string", i)
        key, i = _parse_string(text, i)
        i = _skip_ws(text, i)
        if i >= len(text):
            raise Incomplete("object colon")
        if text[i] != ":":
            raise JsonParseError("expected ':'", i)
        val, i = parse_value(text, i + 1)
        out[key] = val  # dup keys last-write-wins (json.rs:501-507)
        i = _skip_ws(text, i)
        if i < len(text) and text[i] == ",":  # comma optional (json.rs:423-425)
            i += 1


def parse_one(text: str) -> object:
    """Parse exactly one document; error on trailing non-whitespace."""
    try:
        val, end = parse_value(text, 0)
    except Incomplete:
        # input IS complete here: a bare number/literal tail is final
        val, end = _finalize_tail(text, _skip_ws(text, 0))
    end = _skip_ws(text, end)
    if end != len(text):
        raise JsonParseError("trailing content", end)
    return val


def parse_many(text: str) -> list[object]:
    """All whitespace-separated concatenated documents in ``text``."""
    out: list[object] = []
    pos = _skip_ws(text, 0)
    while pos < len(text):
        try:
            val, pos = parse_value(text, pos)
        except Incomplete:
            # a bare number at end-of-input is complete once input ends
            val, pos = _finalize_tail(text, pos)
        out.append(val)
        pos = _skip_ws(text, pos)
    return out


def _finalize_tail(text: str, pos: int) -> tuple[object, int]:
    lit = text[pos:].strip()
    if lit in _LITERALS:
        return _LITERALS[lit], len(text)
    try:
        if any(c in lit for c in ".eE"):
            v = float(lit)
            return (0.0 if v == 0.0 else v), len(text)
        return int(lit), len(text)
    except ValueError:
        raise JsonParseError("truncated document", pos) from None


def iter_documents(reader, block_size: int = 1024) -> Iterator[object]:
    """Incremental multi-document iterator over a file-like object —
    the ``Jsons`` reader (json.rs:123-160): accumulate ``block_size``
    chunks, emit each document as soon as it parses."""
    buf = ""
    eof = False
    pos = 0
    while True:
        pos = _skip_ws(buf, pos)
        if pos:
            buf = buf[pos:]
            pos = 0
        if buf:
            try:
                val, end = parse_value(buf, 0)
                # a number flush against the chunk boundary may extend
                # ("12" + "3" = 123); closed strings/containers cannot
                if end == len(buf) and not eof and buf[0] in "-+0123456789.":
                    raise Incomplete("maybe more")
                yield val
                pos = end
                continue
            except Incomplete:
                if eof:
                    yield _finalize_tail(buf, 0)[0]
                    return
        elif eof:
            return
        chunk = reader.read(block_size)
        if not chunk:
            eof = True
        else:
            buf += chunk
