"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (per the blueprint): image/audio/video payloads travel as
`binary` columns next to a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages so the heavy bytes never pass through
row-at-a-time Python pickling.

Codecs: ``fake=True`` (the oracle-gated default) computes a
deterministic byte-level feature set (length, byte sum, 16-bin
histogram) so the driver oracle can reproduce the features in SQL.
``fake=False`` performs REAL decoding via
:mod:`bd_spark.operators.codecs`: PNG/BMP/PPM/PGM and PCM WAV decode
natively (stdlib zlib/struct/wave + numpy — no optional deps), other
formats (JPEG, ...) via PIL when installed; a missing dependency or
bad payload is an in-band per-row error, never a task failure.
Video frame extraction still requires ffmpeg (documented contract:
``sample_frames(fake=False)`` raises until pyav/ffmpeg is present).

Scale notes:
- `mapInPandas` keeps the binary column zero-copy in Arrow buffers;
  `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory
  (set in bd_spark.session).
- Payload skew (one 4 GB video among 4 KB thumbnails) is the real
  hazard at 100 TB: repartition by a size bucket first
  (``repartition_by_size``) so a batch never holds two giants.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, LongType, StringType, StructField, StructType,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("media_type", StringType()),     # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("source", StringType()),
        StructField("declared_bytes", LongType()),
    ])),
])

DECODED_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("byte_sum", LongType()),
    StructField("hist16", ArrayType(LongType())),
])


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Bridge the synthetic `documents` table into the asset schema
    (text bytes stand in for an encoded payload)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Deterministic stand-in for a codec: byte stats + 16-bin
    histogram over byte_value % 16."""
    n = len(payload)
    total = 0
    hist = [0] * 16
    for by in payload:
        total += by
        hist[by % 16] += 1
    return n, total, hist


REAL_DECODED_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("media_type", StringType()),
    StructField("fmt", StringType()),            # png | bmp | pnm | wav | ...
    StructField("width", LongType()),            # images; frames for audio
    StructField("height", LongType()),           # images; channels for audio
    StructField("channels", LongType()),
    StructField("pix_sum", LongType()),          # decoded-sample checksum
    StructField("err", StringType()),            # in-band decode error
])


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode stage over the binary payload column.

    ``fake=True`` (the oracle-gated path): deterministic byte-level
    features with schema ``DECODED_SCHEMA`` — plumbing-identical to a
    codec but reproducible in SQL.

    ``fake=False``: REAL decode via :mod:`bd_spark.operators.codecs`
    — PNG/BMP/PPM/PGM images and PCM WAV audio natively (stdlib +
    numpy), anything else through PIL when installed.  Output schema
    ``REAL_DECODED_SCHEMA`` with per-row in-band errors: one bad
    payload (or one format needing the optional PIL dependency) marks
    its row, never fails the task.
    """
    if fake:
        def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [_fake_decode(p) for p in pdf["payload"]]
                yield pd.DataFrame({
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [r[0] for r in rows],
                    "byte_sum": [r[1] for r in rows],
                    "hist16": [r[2] for r in rows],
                })

        return assets.mapInPandas(decode_batches, schema=DECODED_SCHEMA)

    from bd_spark.operators import codecs

    def real_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "media_type", "fmt", "width", "height",
                "channels", "pix_sum", "err",
            )}
            for aid, mt, p in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                fmt, w, h, c, s, err = None, None, None, None, None, None
                try:
                    buf = bytes(p) if p is not None else b""
                    fmt = codecs.sniff(buf)
                    if fmt == "wav":
                        nch, _rate, nframes, samples = codecs.decode_wav(buf)
                        w, h, c = nframes, nch, nch
                        s = int(np.int64(samples.astype(np.int64).sum()))
                    else:
                        img = codecs.decode_image(buf)
                        h, w, c = (int(x) for x in img.shape)
                        s = int(img.astype(np.int64).sum())
                except Exception as e:  # noqa: BLE001 — in-band per row
                    err = f"{type(e).__name__}: {e}"
                out["asset_id"].append(aid)
                out["media_type"].append(mt)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["pix_sum"].append(s)
                out["err"].append(err)
            yield pd.DataFrame(out)

    return assets.mapInPandas(real_batches, schema=REAL_DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
])

# real-codec path carries per-row in-band errors (null payload + err)
RESIZED_REAL_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
    StructField("err", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_bytes", LongType()),
    StructField("frame_sum", LongType()),
])


def resize_images(assets: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Resize stage: binary in, binary out, fixed target dims.

    Fake codec: nearest-neighbor byte sampling to exactly
    width*height bytes (index i -> byte floor(i * n / (w*h))) — shape
    and determinism of a real resize without PIL.  Arrow keeps both
    payload directions zero-copy.
    """

    if not fake:
        from bd_spark.operators import codecs

        def do_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                errs = []
                for p in pdf["payload"]:
                    # per-row in-band errors, like decode_assets: one
                    # undecodable payload must never fail the task
                    # (ADVICE r4)
                    try:
                        img = codecs.decode_image(bytes(p))
                        payloads.append(
                            codecs.encode_png(
                                codecs.resize_nearest(img, width, height)
                            )
                        )
                        errs.append(None)
                    except Exception as e:  # noqa: BLE001 — in-band
                        payloads.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                yield pd.DataFrame({
                    "asset_id": pdf["asset_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": payloads,
                    "err": errs,
                })

        return assets.mapInPandas(do_real, schema=RESIZED_REAL_SCHEMA)

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_n = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                n = len(p)
                payloads.append(
                    bytes(p[(i * n) // out_n] for i in range(out_n)) if n else b""
                )
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "payload": payloads,
            })

    return assets.mapInPandas(do, schema=RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, frame_bytes: int = 256,
                  every_n: int = 2, fake: bool = True) -> DataFrame:
    """Frame-sampling stage: one asset row fans out to one row per
    kept frame (the 1->N shape of a real video pipeline).

    Fake codec: the payload splits into fixed ``frame_bytes`` chunks
    ("frames"); every ``every_n``-th is kept.  The fan-out happens
    inside mapInPandas, so output batches stay Arrow-sized regardless
    of per-asset frame counts.
    """

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg/pyav (not "
                    "installed); images and WAV audio decode for real "
                    "via decode_assets(fake=False)"
                )
            ids, idxs, lens, sums = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    chunk = p[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(aid)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    sums.append(sum(chunk))
            yield pd.DataFrame({
                "asset_id": ids, "frame_idx": idxs,
                "frame_bytes": lens, "frame_sum": sums,
            })

    return assets.mapInPandas(do, schema=FRAME_SCHEMA)


def repartition_by_size(assets: DataFrame, target_partitions: int) -> DataFrame:
    """Spread large payloads: shuffle on (size_bucket, asset_id) so no
    partition accumulates multiple giant blobs."""
    bucket = F.floor(F.log2(F.greatest(F.octet_length("payload"), F.lit(1))))
    return assets.repartition(target_partitions, bucket, F.col("asset_id"))


PHASH_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("phash", LongType()),            # 60-bit dHash
    StructField("err", StringType()),            # in-band per-row error
])

_DH_ROWS, _DH_COLS = 6, 11  # 6 x 10 adjacent-column compares = 60 bits


def dhash_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """60-bit difference hash (dHash) per asset — the perceptual-hash
    primitive behind image near-dup detection: reduce to a 6x11
    grayscale grid, set bit (r*10+c) when grid[r][c+1] > grid[r][c].
    Near-identical images differ in few bits, so the generic Hamming
    pigeonhole join (operators.dedup.hamming_near_dupes) finds pairs
    with one uniform-key shuffle.

    fake=True (the oracle-able gate path): the payload BYTES are the
    grid — pixel(r,c) = payload[(r*11 + c) % len] — so the exact
    integer pipeline is reproducible in DuckDB SQL.  fake=False: real
    decode (codecs.decode_image), grayscale mean, block-average pool
    to 6x11, same bit rule; per-row in-band errors like
    decode_assets.

    100 TB shape: Arrow-batched mapInPandas, payloads never leave
    Arrow buffers, output is 16 bytes/asset; everything downstream
    (the near-dup join) operates on the hash only.
    """
    import numpy as np
    import pandas as pd

    def _bits_from_grid(grid) -> int:
        h = 0
        bit = 0
        for r in range(_DH_ROWS):
            for c in range(_DH_COLS - 1):
                if grid[r][c + 1] > grid[r][c]:
                    h |= 1 << bit
                bit += 1
        return h

    if fake:

        def fake_batches(it):
            for pdf in it:
                out = {"asset_id": [], "phash": [], "err": []}
                for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                    b = bytes(payload)
                    n = len(b)
                    if n == 0:
                        h = 0
                    else:
                        grid = [
                            [b[(r * _DH_COLS + c) % n]
                             for c in range(_DH_COLS)]
                            for r in range(_DH_ROWS)
                        ]
                        h = _bits_from_grid(grid)
                    out["asset_id"].append(aid)
                    out["phash"].append(h)
                    out["err"].append(None)
                yield pd.DataFrame(out)

        return assets.mapInPandas(fake_batches, schema=PHASH_SCHEMA)

    from bd_spark.operators import codecs

    def real_batches(it):
        for pdf in it:
            out = {"asset_id": [], "phash": [], "err": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                h, err = None, None
                try:
                    img = codecs.decode_image(bytes(payload))
                    gray = img.astype(np.float64).mean(axis=2)
                    hh, ww = gray.shape
                    if hh < _DH_ROWS or ww < _DH_COLS:
                        raise codecs.CodecError(
                            f"image {ww}x{hh} smaller than dhash grid"
                        )
                    # block-average pool to the fixed grid
                    re = np.array([
                        [gray[
                            (r * hh) // _DH_ROWS:((r + 1) * hh) // _DH_ROWS,
                            (c * ww) // _DH_COLS:((c + 1) * ww) // _DH_COLS,
                        ].mean() for c in range(_DH_COLS)]
                        for r in range(_DH_ROWS)
                    ])
                    h = _bits_from_grid(re)
                except Exception as e:  # noqa: BLE001 — in-band per row
                    err = f"{type(e).__name__}: {e}"
                out["asset_id"].append(aid)
                out["phash"].append(h)
                out["err"].append(err)
            yield pd.DataFrame(out)

    return assets.mapInPandas(real_batches, schema=PHASH_SCHEMA)


def audio_fingerprints(assets: DataFrame, fake: bool = False) -> DataFrame:
    """60-bit audio fingerprint per asset (a time-domain
    simplification of the Haitsma-Kalker scheme): decode WAV, mono-
    mix, split into 61 equal frames, take per-frame log energy, and
    set bit i when energy rises frame i -> i+1.  Robust to gain
    (energy RATIO ordering survives scaling) and to small noise; the
    generic Hamming pigeonhole join (dedup.hamming_near_dupes) then
    finds near-duplicate recordings with one uniform-key shuffle.

    fake=True (the oracle-able gate path): the payload BYTES are the
    waveform — frame i's "energy" is the plain sum of the byte slice
    [(i*n)//61, ((i+1)*n)//61), same frame-edge rule as the real
    path, same integer-exact adjacent-compare bit rule — so the
    whole pipeline is reproducible in DuckDB SQL (like
    dhash_assets(fake=True)).

    Per-row in-band errors (undecodable / too-short payloads) — one
    bad asset never fails the task.  Output is 16 bytes/asset; the
    audio itself never shuffles.
    """
    import numpy as np
    import pandas as pd

    from bd_spark.operators import codecs

    frames = 61  # 60 adjacent-frame compares = 60 bits

    if fake:

        def fake_batches(it):
            for pdf in it:
                out = {"asset_id": [], "phash": [], "err": []}
                for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                    b = bytes(payload)
                    n = len(b)
                    edges = [(i * n) // frames for i in range(frames + 1)]
                    e = [sum(b[edges[i]:edges[i + 1]])
                         for i in range(frames)]
                    h = 0
                    for i in range(frames - 1):
                        if e[i + 1] > e[i]:
                            h |= 1 << i
                    out["asset_id"].append(aid)
                    out["phash"].append(h)
                    out["err"].append(None)
                yield pd.DataFrame(out)

        return assets.mapInPandas(fake_batches, schema=PHASH_SCHEMA)

    def batches(it):
        for pdf in it:
            out = {"asset_id": [], "phash": [], "err": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                h, err = None, None
                try:
                    _nch, _rate, nfr, samples = codecs.decode_wav(
                        bytes(payload)
                    )
                    if nfr < frames:
                        raise codecs.CodecError(
                            f"{nfr} frames < fingerprint window {frames}"
                        )
                    mono = samples.astype(np.float64).mean(axis=1)
                    edges = [(i * nfr) // frames for i in range(frames + 1)]
                    e = np.array([
                        float(np.square(mono[edges[i]:edges[i + 1]]).sum())
                        for i in range(frames)
                    ])
                    h = 0
                    for i in range(frames - 1):
                        if e[i + 1] > e[i]:
                            h |= 1 << i
                except Exception as ex:  # noqa: BLE001 — in-band per row
                    err = f"{type(ex).__name__}: {ex}"
                out["asset_id"].append(aid)
                out["phash"].append(h)
                out["err"].append(err)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=PHASH_SCHEMA)
