"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (per the blueprint): image/audio/video payloads travel as
`binary` columns next to a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages so the heavy bytes never pass through
row-at-a-time Python pickling.

The actual codec step is STUBBED in this container (no PIL/ffmpeg):
``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case it computes a deterministic byte-level
feature set (length, byte sum, 16-bin histogram head) so the Spark
plumbing — schema, Arrow batching, partition flow — is fully real
and testable, and the driver oracle can reproduce the features in
SQL for ASCII payloads.

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


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode stage over the binary payload column.

    Real decoding (PIL / torchaudio / pyav) is not available in this
    container; with fake=False this raises NotImplementedError at
    executor time, by design.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg; "
                    "run with fake=True in this environment"
                )
            rows = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": [r[0] for r in rows],
                "byte_sum": [r[1] for r in rows],
                "hist16": [r[2] for r in rows],
            })

    return assets.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def repartition_by_size(assets: DataFrame, target_partitions: int) -> DataFrame:
    """Spread large payloads: shuffle on (size_bucket, asset_id) so no
    partition accumulates multiple giant blobs."""
    bucket = F.floor(F.log2(F.greatest(F.octet_length("payload"), F.lit(1))))
    return assets.repartition(target_partitions, bucket, F.col("asset_id"))
