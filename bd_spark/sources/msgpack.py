"""MessagePack source: binary documents → jsonq document streams.

Closes the reference's remaining format ambition (README.md:20 names
CBOR/MsgPack for the format-agnostic `Document` layer, db.rs:33-58;
zero reference code exists for either — semantics here follow the
msgpack spec v5 + the same JSON-conversion conventions as the CBOR
bridge): decode to the JSON data model inside an Arrow-batched
``mapInPandas``, then share the variant pipeline with every other
source.  Pure-Python decode at the ingestion edge only, exactly like
the CBOR and lenient-JSON parity parsers.

JSON mapping conventions (mirroring sources/cbor.py):
- bin 8/16/32 → base64url text without padding
- ext types (incl. fixext) → null (no JSON form; like CBOR simple
  values)
- non-string map keys → canonical-serializer text
- NaN/Inf floats → null (error-free degrade-to-null)
"""

from __future__ import annotations

import base64
import json
import math
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bd_spark.jsonq.canonical import canonicalize


class MsgPackError(ValueError):
    pass


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise MsgPackError(f"truncated: need {n} bytes at {pos}")


def _decode(buf: bytes, pos: int) -> tuple[object, int]:
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC1:
        raise MsgPackError("0xc1 is never used")
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _len(buf, pos, 1 << (b - 0xC4))
        _need(buf, pos, n)
        raw = buf[pos:pos + n]
        return (
            base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii"),
            pos + n,
        )
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32 -> null
        n, pos = _len(buf, pos, 1 << (b - 0xC7))
        _need(buf, pos, 1 + n)
        return None, pos + 1 + n
    if b == 0xCA:
        _need(buf, pos, 4)
        return _finite(struct.unpack(">f", buf[pos:pos + 4])[0]), pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return _finite(struct.unpack(">d", buf[pos:pos + 8])[0]), pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos:pos + n], "big"), pos + n
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos:pos + n], "big", signed=True), pos + n
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16 -> null
        n = 1 << (b - 0xD4)
        _need(buf, pos, 1 + n)
        return None, pos + 1 + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _len(buf, pos, 1 << (b - 0xD9))
        return _str(buf, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _len(buf, pos, 2 << (b - 0xDC))
        return _array(buf, pos, n)
    # 0xDE / 0xDF: map 16/32
    n, pos = _len(buf, pos, 2 << (b - 0xDE))
    return _map(buf, pos, n)


def _len(buf: bytes, pos: int, width: int) -> tuple[int, int]:
    _need(buf, pos, width)
    return int.from_bytes(buf[pos:pos + width], "big"), pos + width


def _str(buf: bytes, pos: int, n: int) -> tuple[str, int]:
    _need(buf, pos, n)
    try:
        return buf[pos:pos + n].decode("utf-8"), pos + n
    except UnicodeDecodeError as e:
        raise MsgPackError(f"invalid utf-8: {e}") from None


def _array(buf: bytes, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos


def _map(buf: bytes, pos: int, n: int) -> tuple[dict, int]:
    d: dict[str, object] = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        d[k if isinstance(k, str) else canonicalize(k)] = v
    return d, pos


def _finite(x: float) -> object:
    return x if math.isfinite(x) else None


def decode(buf: bytes) -> object:
    """Decode exactly one msgpack item; trailing bytes are an error."""
    v, pos = _decode(bytes(buf), 0)
    if pos != len(buf):
        raise MsgPackError(f"{len(buf) - pos} trailing bytes")
    return v


def decode_all(buf: bytes) -> list[object]:
    """Decode a concatenated msgpack stream — the binary twin of the
    multi-document ``Jsons`` reader (json.rs:123-160), like
    cbor.decode_all."""
    buf = bytes(buf)
    out: list[object] = []
    pos = 0
    while pos < len(buf):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out


# ------------------------------------------------------------- encoder
def encode(value: object) -> bytes:
    """Minimal deterministic encoder (shortest widths, float64) for
    round-trip tests and fixtures."""
    if value is None:
        return b"\xc0"
    if value is True:
        return b"\xc3"
    if value is False:
        return b"\xc2"
    if isinstance(value, int):
        if 0 <= value <= 0x7F:
            return bytes([value])
        if -32 <= value < 0:
            return bytes([value & 0xFF])
        if value >= 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if value < 1 << (8 * width):
                    return bytes([code]) + value.to_bytes(width, "big")
            raise MsgPackError("uint too large")
        for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * width - 1)) <= value:
                return bytes([code]) + value.to_bytes(width, "big", signed=True)
        raise MsgPackError("int too small")
    if isinstance(value, float):
        return b"\xcb" + struct.pack(">d", value)
    if isinstance(value, bytes):
        n = len(value)
        for code, width in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + value
        raise MsgPackError("bin too large")
    if isinstance(value, str):
        raw = value.encode("utf-8")
        n = len(raw)
        if n <= 31:
            return bytes([0xA0 | n]) + raw
        for code, width in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + raw
        raise MsgPackError("str too large")
    if isinstance(value, (list, tuple)):
        n = len(value)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(encode(v) for v in value)
    if isinstance(value, dict):
        n = len(value)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(encode(k) + encode(v) for k, v in value.items())
    raise MsgPackError(f"cannot encode {type(value)}")


# ------------------------------------------------------- Spark bridge
def stream_from_binary_column(
    df: DataFrame, col: str, seq_col: str | None = "seq", multi: bool = False
) -> DataFrame:
    """MsgPack binary column → jsonq document stream
    ``(seq, ord, v VARIANT, err STRING)`` — the msgpack twin of
    cbor.stream_from_binary_column; decode errors (and any decoder
    bug) are in-band ``err`` rows, never task failures."""
    seq = (
        F.col(seq_col)
        if seq_col and seq_col in df.columns
        else F.monotonically_increasing_id()
    )
    src = df.select(seq.cast("long").alias("seq"), F.col(col).alias("_b"))

    def batches(it):
        for pdf in it:
            rows = {"seq": [], "ord": [], "j": [], "err": []}
            for s, b in zip(pdf["seq"], pdf["_b"]):
                if b is None:
                    docs: list[tuple[list[int], str | None, str | None]] = [
                        ([], None, "decode error: null input")
                    ]
                else:
                    try:
                        vals = decode_all(b) if multi else [decode(b)]
                        docs = [
                            ([i] if multi else [],
                             json.dumps(v, ensure_ascii=False), None)
                            for i, v in enumerate(vals)
                        ]
                    except Exception as e:  # noqa: BLE001 — in-band
                        docs = [([], None, f"decode error: {e}")]
                for ordv, j, err in docs:
                    rows["seq"].append(s)
                    rows["ord"].append(ordv)
                    rows["j"].append(j)
                    rows["err"].append(err)
            import pandas as pd

            yield pd.DataFrame(rows)

    decoded = src.mapInPandas(
        batches, "seq long, ord array<bigint>, j string, err string"
    )
    return decoded.select(
        "seq",
        "ord",
        F.when(
            F.col("err").isNotNull(), F.parse_json(F.lit("null"))
        ).otherwise(F.try_parse_json("j")).alias("v"),
        "err",
    )
