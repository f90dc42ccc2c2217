"""CBOR source: RFC 8949 binary documents → jsonq document streams.

The reference's secondary scope is a format-agnostic document layer
(`Document` trait, reference db.rs:33-58; README.md:20 names
CBOR/MsgPack). On Spark the bridge is small: decode CBOR to the JSON
data model (RFC 8949 §6.1 conversion rules) inside an Arrow-batched
``mapInPandas``, then hand the resulting JSON text to the same
variant pipeline every other source uses. Decoding is pure Python by
design — it runs once at the ingestion edge, never in the query hot
path, exactly like the lenient-JSON parity parser.

Scope: major types 0-7, definite and indefinite lengths, tags
(transparently unwrapped), half/single/double floats. Byte strings
become base64url text (RFC 8949 §6.1 default for JSON conversion);
non-text map keys are stringified with the canonical serializer.
"""

from __future__ import annotations

import base64
import json
import math
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bd_spark.jsonq.canonical import canonicalize


class CborError(ValueError):
    pass


_BREAK = object()


def _read_uint(buf: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        if pos + 1 > len(buf):
            raise CborError("truncated uint8")
        return buf[pos], pos + 1
    if info == 25:
        if pos + 2 > len(buf):
            raise CborError("truncated uint16")
        return int.from_bytes(buf[pos:pos + 2], "big"), pos + 2
    if info == 26:
        if pos + 4 > len(buf):
            raise CborError("truncated uint32")
        return int.from_bytes(buf[pos:pos + 4], "big"), pos + 4
    if info == 27:
        if pos + 8 > len(buf):
            raise CborError("truncated uint64")
        return int.from_bytes(buf[pos:pos + 8], "big"), pos + 8
    raise CborError(f"invalid additional info {info}")


def _decode_item(buf: bytes, pos: int) -> tuple[object, int]:
    if pos >= len(buf):
        raise CborError("truncated item")
    ib = buf[pos]
    pos += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 0:  # unsigned int
        return _read_uint(buf, pos, info)
    if major == 1:  # negative int
        n, pos = _read_uint(buf, pos, info)
        return -1 - n, pos
    if major == 2:  # byte string
        chunks, pos = _read_string(buf, pos, info, major)
        return base64.urlsafe_b64encode(chunks).rstrip(b"=").decode("ascii"), pos
    if major == 3:  # text string
        chunks, pos = _read_string(buf, pos, info, major)
        try:
            return chunks.decode("utf-8"), pos
        except UnicodeDecodeError as e:
            raise CborError(f"invalid utf-8: {e}") from None
    if major == 4:  # array
        if info == 31:
            out: list[object] = []
            while True:
                v, pos = _decode_item(buf, pos)
                if v is _BREAK:
                    return out, pos
                out.append(v)
        n, pos = _read_uint(buf, pos, info)
        out = []
        for _ in range(n):
            v, pos = _decode_item(buf, pos)
            if v is _BREAK:
                raise CborError("break in definite array")
            out.append(v)
        return out, pos
    if major == 5:  # map
        if info == 31:
            d: dict[str, object] = {}
            while True:
                k, pos = _decode_item(buf, pos)
                if k is _BREAK:
                    return d, pos
                v, pos = _decode_item(buf, pos)
                if v is _BREAK:
                    raise CborError("break in map-value position")
                d[_key(k)] = v
            return d, pos
        n, pos = _read_uint(buf, pos, info)
        d = {}
        for _ in range(n):
            k, pos = _decode_item(buf, pos)
            if k is _BREAK:
                raise CborError("break in definite map")
            v, pos = _decode_item(buf, pos)
            if v is _BREAK:
                raise CborError("break in map-value position")
            d[_key(k)] = v
        return d, pos
    if major == 6:  # tag: unwrap transparently (§6.1: content drives JSON)
        _, pos = _read_uint(buf, pos, info)
        return _decode_item(buf, pos)
    # major == 7: simple values / floats / break
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info in (22, 23):  # null / undefined
        return None, pos
    if info == 24:  # simple value (one byte) — no JSON mapping, null
        if pos + 1 > len(buf):
            raise CborError("truncated simple")
        return None, pos + 1
    if info == 25:
        if pos + 2 > len(buf):
            raise CborError("truncated float16")
        return _finite(struct.unpack(">e", buf[pos:pos + 2])[0]), pos + 2
    if info == 26:
        if pos + 4 > len(buf):
            raise CborError("truncated float32")
        return _finite(struct.unpack(">f", buf[pos:pos + 4])[0]), pos + 4
    if info == 27:
        if pos + 8 > len(buf):
            raise CborError("truncated float64")
        return _finite(struct.unpack(">d", buf[pos:pos + 8])[0]), pos + 8
    if info == 31:
        return _BREAK, pos
    if info < 20:  # unassigned simple values
        return None, pos
    raise CborError(f"invalid simple/float info {info}")


def _read_string(buf: bytes, pos: int, info: int, major: int) -> tuple[bytes, int]:
    if info == 31:  # indefinite: concatenation of definite chunks
        parts = []
        while True:
            if pos >= len(buf):
                raise CborError("truncated indefinite string")
            ib = buf[pos]
            if ib == 0xFF:
                return b"".join(parts), pos + 1
            if ib >> 5 != major or (ib & 0x1F) == 31:
                raise CborError("invalid indefinite-string chunk")
            n, p = _read_uint(buf, pos + 1, ib & 0x1F)
            if p + n > len(buf):
                raise CborError("truncated string chunk")
            parts.append(buf[p:p + n])
            pos = p + n
    n, pos = _read_uint(buf, pos, info)
    if pos + n > len(buf):
        raise CborError("truncated string")
    return buf[pos:pos + n], pos + n


def _key(k: object) -> str:
    """Map keys: text stays; everything else stringifies canonically
    (RFC 8949 §6.1: convert non-string keys to their text form)."""
    return k if isinstance(k, str) else canonicalize(k)


def _finite(x: float) -> object:
    """NaN/Inf have no JSON form — they become null (§6.1 leaves the
    choice to the application; null matches the engine's error-free
    degrade-to-null convention)."""
    return x if math.isfinite(x) else None


def decode(buf: bytes) -> object:
    """Decode exactly one CBOR item; trailing bytes are an error."""
    v, pos = _decode_item(bytes(buf), 0)
    if v is _BREAK:
        raise CborError("unexpected break")
    if pos != len(buf):
        raise CborError(f"{len(buf) - pos} trailing bytes")
    return v


def decode_all(buf: bytes) -> list[object]:
    """Decode a concatenated CBOR sequence (RFC 8742) — the binary
    twin of the multi-document ``Jsons`` reader (json.rs:123-160)."""
    buf = bytes(buf)
    out: list[object] = []
    pos = 0
    while pos < len(buf):
        v, pos = _decode_item(buf, pos)
        if v is _BREAK:
            raise CborError("unexpected break")
        out.append(v)
    return out


# ------------------------------------------------------------- encoder
def encode(value: object) -> bytes:
    """Minimal deterministic encoder (definite lengths, shortest int
    widths, doubles for floats) — for round-trip tests and fixtures."""
    if value is None:
        return b"\xf6"
    if value is True:
        return b"\xf5"
    if value is False:
        return b"\xf4"
    if isinstance(value, int):
        if value >= 0:
            return _enc_uint(0, value)
        return _enc_uint(1, -1 - value)
    if isinstance(value, float):
        return b"\xfb" + struct.pack(">d", value)
    if isinstance(value, bytes):
        return _enc_uint(2, len(value)) + value
    if isinstance(value, str):
        b = value.encode("utf-8")
        return _enc_uint(3, len(b)) + b
    if isinstance(value, (list, tuple)):
        return _enc_uint(4, len(value)) + b"".join(encode(v) for v in value)
    if isinstance(value, dict):
        return _enc_uint(5, len(value)) + b"".join(
            encode(k) + encode(v) for k, v in value.items()
        )
    raise CborError(f"cannot encode {type(value)}")


def _enc_uint(major: int, n: int) -> bytes:
    mb = major << 5
    if n < 24:
        return bytes([mb | n])
    if n < 1 << 8:
        return bytes([mb | 24, n])
    if n < 1 << 16:
        return bytes([mb | 25]) + n.to_bytes(2, "big")
    if n < 1 << 32:
        return bytes([mb | 26]) + n.to_bytes(4, "big")
    return bytes([mb | 27]) + n.to_bytes(8, "big")


# ------------------------------------------------------- Spark bridge
def stream_from_binary_column(
    df: DataFrame, col: str, seq_col: str | None = "seq", multi: bool = False
) -> DataFrame:
    """CBOR binary column → jsonq document stream
    ``(seq, ord, v VARIANT, err STRING)``.

    Decode runs in an Arrow-batched ``mapInPandas`` emitting JSON
    text; the variant conversion stays JVM-side. ``multi=True`` treats
    each cell as a concatenated CBOR sequence (RFC 8742) and bursts it
    to one row per document with ``ord=[i]`` — the binary twin of the
    incremental ``Jsons`` reader. Decode errors are in-band ``err``
    entries, like every other source (entry.rs:30-32)."""
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
                            ([i] if multi else [], json.dumps(v, ensure_ascii=False), None)
                            for i, v in enumerate(vals)
                        ]
                    # catch everything, not just CborError: a decoder
                    # bug on one malformed document must become an
                    # in-band err row, never a task failure that kills
                    # the whole job (ADVICE r3: the _BREAK sentinel
                    # escaping to json.dumps raised TypeError)
                    except Exception as e:  # noqa: BLE001
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
