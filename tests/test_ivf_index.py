"""Persisted IVF index: the stored corpus is partitioned by centroid
assignment and probes read it as a partition-PRUNED parquet scan —
the at-100-TB ANN layout SCALE.md's IVF story promises."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from bd_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from bd_spark.catalog import table

    return table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    cents = S.ivf_index_write(emb, path, nlist=16, train_iters=2)
    return path, cents


def test_indexed_results_match_inline_ivf(spark, emb, index):
    """Querying the persisted index returns exactly what the inline
    (unstored) IVF computes with the same trained centroids."""
    path, _ = index
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inline = S.ivf_topk(emb, q, k=5, nlist=16, nprobe=4, train_iters=2)
    stored = S.ivf_index_topk(spark, path, q, k=5, nprobe=4)
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(stored) == key(inline)


def test_probe_scan_is_partition_pruned(spark, emb, index):
    """The probe plan's parquet scan must carry the cid partition
    filter and read at most the probed lists' directories."""
    path, _ = index
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.ivf_index_topk(spark, path, q, k=5, nprobe=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1].splitlines()[0]
    # directory-level pruning: 2 queries x nprobe=3 can touch at most
    # 6 of the 16 list directories
    scan = spark.read.parquet(path).where(F.col("cid").isin([0, 1, 2]))
    n_files = scan.select(F.input_file_name()).distinct().count()
    all_files = (
        spark.read.parquet(path)
        .select(F.input_file_name()).distinct().count()
    )
    assert n_files < all_files


def test_centroids_roundtrip(spark, index):
    path, cents = index
    stored = {
        int(r["cid"]): [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(path + ".centroids").collect()
    }
    assert [stored[c] for c in range(16)] == cents
