"""Pure-Python baseline JPEG decoder — stdlib + numpy, zero deps.

JPEG is the dominant format of any web-scraped image corpus, and the
container ships no PIL, so ``pipe_mm_decode``'s real path needs a
native decoder (VERDICT r4 missing #1 / next #8).  Scope — the
baseline process of ITU-T T.81 (the overwhelmingly common case):

  - SOF0 baseline sequential DCT (SOF1 extended-sequential accepted:
    identical 8-bit Huffman decoding path);
  - grayscale or 3-component YCbCr, any sampling factors (4:4:4,
    4:2:0, 4:2:2, ...), interleaved single scan;
  - restart intervals (DRI / RSTn), byte stuffing, multi-table
    DQT/DHT segments.

Progressive (SOF2), lossless, hierarchical, arithmetic-coded and
12-bit streams raise ``CodecError`` with the process named — callers
(codecs.decode_image) then fall through to PIL when installed, or
surface an in-band per-row error (multimodal.decode_assets).

The hot path is small-image metadata extraction inside Arrow-batched
``mapInPandas`` stages; per-block math is vectorized (numpy 8x8
matrix IDCT), the entropy decode is a straightforward bit reader.
"""

from __future__ import annotations

import struct

import numpy as np

from bd_spark.operators.codecs import CodecError

# zigzag index k (scan order) -> raster index in the 8x8 block
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])

_SOF_UNSUPPORTED = {
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


class _Bits:
    """MSB-first bit reader over one entropy-coded segment."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise CodecError("JPEG: EOF inside entropy-coded data")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_huff(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise CodecError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map s-bit magnitude to signed."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `pos`: unstuff 0xFF00, split at RSTn.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def _idct_block(coefs: np.ndarray) -> np.ndarray:
    """Dequantized zigzag-ordered 64-vector -> 8x8 spatial samples."""
    block = np.zeros(64)
    block[_ZIGZAG] = coefs
    return _C.T @ block.reshape(8, 8) @ _C


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w, 1|3) (RGB)."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    dri = 0
    i = 2
    n = len(buf)
    scan = None
    while i + 4 <= n:
        if buf[i] != 0xFF:
            raise CodecError("JPEG: expected marker")
        m = buf[i + 1]
        i += 2
        if m == 0xD9 or m == 0x01 or 0xD0 <= m <= 0xD8:
            continue
        (seg_len,) = struct.unpack(">H", buf[i:i + 2])
        seg = buf[i + 2:i + seg_len]
        if m == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=p
                    ).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int64)
                    p += 64
                qt[tq] = vals  # zigzag order
        elif m == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1:p + 17]
                nsym = sum(counts)
                symbols = seg[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _build_huff(counts, symbols)
                p += 17 + nsym
        elif m in (0xC0, 0xC1):  # SOF0/1 — identical 8-bit decode
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise CodecError(f"JPEG: {precision}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in _SOF_UNSUPPORTED:
            raise CodecError(
                f"JPEG: {_SOF_UNSUPPORTED[m]} process unsupported "
                "(baseline sequential only)"
            )
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — baseline has exactly one scan
            if frame is None:
                raise CodecError("JPEG: SOS before SOF")
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si:3 + 2 * si]
                sel[cs] = (tt >> 4, tt & 15)
            scan_comps = [c for c in frame["comps"] if c["id"] in sel]
            if len(scan_comps) != len(frame["comps"]):
                raise CodecError("JPEG: non-interleaved scans unsupported")
            segs, _ = _split_scan(buf, i + seg_len)
            scan = (sel, segs)
            break
        i += seg_len
    if frame is None or scan is None:
        raise CodecError("JPEG: missing SOF/SOS")
    sel, segs = scan
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    for c in comps:
        if c["tq"] not in qt:
            raise CodecError(f"JPEG: missing quant table {c['tq']}")
        td, ta = sel[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise CodecError("JPEG: missing Huffman table")

    seg_idx = 0
    bits = _Bits(segs[0])
    pred = [0] * len(comps)
    n_mcus = mcux * mcuy
    coefs = np.zeros(64)
    for mcu in range(n_mcus):
        if dri and mcu and mcu % dri == 0:
            # restart: next entropy segment, DC predictors reset
            seg_idx += 1
            if seg_idx >= len(segs):
                raise CodecError("JPEG: missing restart segment")
            bits = _Bits(segs[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            q = qt[c["tq"]]
            dc_tab = huff[(0, sel[c["id"]][0])]
            ac_tab = huff[(1, sel[c["id"]][1])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coefs[:] = 0.0
                    s = _huff_decode(bits, dc_tab)
                    if s:
                        pred[ci] += _extend(bits.bits(s), s)
                    coefs[0] = pred[ci] * q[0]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, ac_tab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise CodecError("JPEG: AC index overflow")
                        coefs[k] = _extend(bits.bits(s), s) * q[k]
                        k += 1
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = _idct_block(coefs)

    # upsample each plane to full resolution, crop, level shift
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise CodecError(f"JPEG: {len(full)}-component color unsupported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
