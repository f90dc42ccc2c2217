"""Baseline JPEG decoder (bd_spark.operators.jpeg) against a minimal
in-test encoder: real Huffman entropy coding, real DCT, byte
stuffing, restart markers — so decode_jpeg is exercised on genuine
baseline JPEG streams without PIL (VERDICT r4 next #8)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bd_spark.operators import codecs
from bd_spark.operators.jpeg import _C, _ZIGZAG, decode_jpeg

# ----------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _size(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _dct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coefs = (_C @ (block - 128.0) @ _C.T).flatten()[_ZIGZAG]
    return np.rint(coefs / q).astype(np.int64)


def _block_symbols(coefs: np.ndarray, pred: int) -> tuple[list, list, int]:
    """-> (dc [(sym, mag, bits)], ac [(sym, mag, bits)], new pred)."""
    diff = int(coefs[0]) - pred
    s = _size(diff)
    dc = [(s, _mag(diff, s), s)]
    ac = []
    run = 0
    last_nz = max((k for k in range(1, 64) if coefs[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _size(v)
        ac.append(((run << 4) | s, _mag(v, s), s))
        run = 0
    if last_nz < 63:
        ac.append((0x00, 0, 0))  # EOB
    return dc, ac, int(coefs[0])


def _make_huff(symbols: set[int]) -> tuple[bytes, bytes, dict[int, tuple[int, int]]]:
    """Fixed-length canonical table over the used symbols: valid DHT
    (all codes one length, all-ones code left unused)."""
    syms = sorted(symbols)
    length = max(1, (len(syms) + 1 - 1).bit_length())
    while (1 << length) - 1 < len(syms) + 1:
        length += 1
    counts = bytearray(16)
    counts[length - 1] = len(syms)
    enc = {s: (code, length) for code, s in enumerate(syms)}
    return bytes(counts), bytes(syms), enc


def _subsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    h, w = plane.shape
    return plane.reshape(h // fv, fv, w // fh, fh).mean(axis=(1, 3))


def encode_jpeg(img: np.ndarray, quant: int = 1, sampling: str = "444",
                restart: int = 0) -> bytes:
    """Minimal baseline encoder: 1-channel or RGB uint8, quality via a
    flat quant table, optional 4:2:0 and restart intervals."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    q = np.full(64, quant, dtype=np.int64)
    if nc == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if sampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        raw_planes = [y, cb, cr]
    else:
        factors = [(1, 1)]
        raw_planes = [img[..., 0].astype(np.float64)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for (fh, fv), p in zip(factors, raw_planes):
        ph, pw = mcuy * fv * 8, mcux * fh * 8
        # pad to plane size by edge replication, then box-subsample
        full = np.pad(p, ((0, mcuy * vmax * 8 - h), (0, mcux * hmax * 8 - w)),
                      mode="edge")
        sub = _subsample(full, hmax // fh, vmax // fv)
        assert sub.shape == (ph, pw)
        planes.append(sub)

    # pass 1: all blocks -> symbols (MCU-interleaved, restart-aware)
    mcu_syms: list[list] = []
    preds = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        entries = []
        for ci, ((fh, fv), p) in enumerate(zip(factors, planes)):
            for by in range(fv):
                for bx in range(fh):
                    y0, x0 = (my * fv + by) * 8, (mx * fh + bx) * 8
                    coefs = _dct_quant(p[y0:y0 + 8, x0:x0 + 8], q)
                    dc, ac, preds[ci] = _block_symbols(coefs, preds[ci])
                    entries.append((ci, dc, ac))
        mcu_syms.append(entries)

    two_tables = len(planes) > 1
    dc_used: list[set] = [set(), set()]
    ac_used: list[set] = [set(), set()]
    for entries in mcu_syms:
        for ci, dc, ac in entries:
            t = 1 if (two_tables and ci > 0) else 0
            dc_used[t].update(sym for sym, _, _ in dc)
            ac_used[t].update(sym for sym, _, _ in ac)
    tabs = {}
    dht = bytearray()
    for t in range(2 if two_tables else 1):
        for cls, used in ((0, dc_used[t]), (1, ac_used[t])):
            counts, syms, enc = _make_huff(used or {0})
            tabs[(cls, t)] = enc
            dht += bytes([(cls << 4) | t]) + counts + syms

    # pass 2: emit entropy-coded segments
    segments: list[bytes] = []
    bw = _BitWriter()
    for mcu, entries in enumerate(mcu_syms):
        if restart and mcu and mcu % restart == 0:
            bw.flush()
            segments.append(bytes(bw.out))
            bw = _BitWriter()
        for ci, dc, ac in entries:
            t = 1 if (two_tables and ci > 0) else 0
            for cls, syms_ in ((0, dc), (1, ac)):
                for sym, mag, nbits in syms_:
                    code, length = tabs[(cls, t)][sym]
                    bw.write(code, length)
                    if nbits:
                        bw.write(mag, nbits)
    bw.flush()
    segments.append(bytes(bw.out))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes(dht))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 1 if (two_tables and ci > 0) else 0
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    for si, s in enumerate(segments[:-1]):
        out += s + bytes([0xFF, 0xD0 + (si % 8)])
    out += segments[-1]
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- tests


def _smooth(shape, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 196, size=(4, 4, shape[2]) if len(shape) == 3 else (4, 4))
    img = base
    while img.shape[0] < shape[0] or img.shape[1] < shape[1]:
        img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    return img[: shape[0], : shape[1]].astype(np.uint8)


def test_grayscale_roundtrip_nonmultiple_of_8():
    img = _smooth((17, 23), 1)
    buf = encode_jpeg(img, quant=1)
    assert codecs.sniff(buf) == "jpeg"
    got = decode_jpeg(buf)
    assert got.shape == (17, 23, 1)
    assert int(np.max(np.abs(got[:, :, 0].astype(int) - img.astype(int)))) <= 3


def test_color_444_roundtrip():
    img = _smooth((16, 16, 3), 2)
    got = decode_jpeg(encode_jpeg(img, quant=1))
    assert got.shape == (16, 16, 3)
    assert int(np.max(np.abs(got.astype(int) - img.astype(int)))) <= 6


def test_color_420_subsampled():
    # flat color halves: chroma is locally constant, so 2x2 box
    # subsampling + replication upsampling must reconstruct tightly
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:, :16] = (200, 40, 40)
    img[:, 16:] = (40, 40, 200)
    got = decode_jpeg(encode_jpeg(img, quant=1, sampling="420"))
    assert got.shape == (32, 32, 3)
    assert int(np.max(np.abs(got[:, :12].astype(int) - img[:, :12].astype(int)))) <= 6
    assert int(np.max(np.abs(got[:, 20:].astype(int) - img[:, 20:].astype(int)))) <= 6


def test_color_420_odd_dimensions():
    """4:2:0 with dims not a multiple of the 16px MCU — the classic
    decoder crop bug: pad blocks must decode then crop away."""
    img = np.zeros((18, 10, 3), dtype=np.uint8)
    img[:9] = (180, 60, 60)
    img[9:] = (60, 60, 180)
    got = decode_jpeg(encode_jpeg(img, quant=1, sampling="420"))
    assert got.shape == (18, 10, 3)
    assert int(np.max(np.abs(got[:6].astype(int) - img[:6].astype(int)))) <= 6
    assert int(np.max(np.abs(got[12:].astype(int) - img[12:].astype(int)))) <= 6


def test_restart_markers():
    img = _smooth((24, 40), 3)
    plain = decode_jpeg(encode_jpeg(img, quant=1))
    with_rst = decode_jpeg(encode_jpeg(img, quant=1, restart=2))
    assert np.array_equal(plain, with_rst)


def test_quantization_coarsens_not_crashes():
    img = _smooth((16, 16), 4)
    got = decode_jpeg(encode_jpeg(img, quant=8))
    assert got.shape == (16, 16, 1)
    assert int(np.max(np.abs(got[:, :, 0].astype(int) - img.astype(int)))) <= 40


def test_progressive_rejected_in_band():
    sof2 = (b"\xff\xd8"
            + b"\xff\xc2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(codecs.CodecError, match="progressive"):
        decode_jpeg(sof2)
    # dispatch surfaces the named process when PIL is absent
    if codecs._pil() is None:
        with pytest.raises(codecs.CodecUnavailable, match="progressive"):
            codecs.decode_image(sof2)


def test_decode_image_dispatches_jpeg_natively():
    img = _smooth((8, 8), 5)
    got = codecs.decode_image(encode_jpeg(img, quant=1))
    assert got.shape == (8, 8, 1)
