"""Product-quantization ANN: encode determinism, ADC ranking vs a
pure-Python reference, and recall sanity vs exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bd_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from bd_spark.catalog import table

    return table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(emb):
    return S.pq_codebooks(emb, m=8, ksub=16)


def test_codebook_shape(books, emb):
    dim = len(emb.first().embedding)
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(code) == dim // 8 for b in books for code in b)


def test_encode_matches_python(emb, books):
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.where(F.col("vec_id") < 50).collect()}
    got = {r.vec_id: list(r.codes)
           for r in S.pq_encode(emb.where(F.col("vec_id") < 50), books).collect()}
    dsub = len(books[0][0])
    for vid, vec in vecs.items():
        for j, book in enumerate(books):
            sub = vec[j * dsub:(j + 1) * dsub]
            dists = [
                (round(sum((a - b) ** 2 for a, b in zip(sub, code)), 9), c)
                for c, code in enumerate(book)
            ]
            assert got[vid][j] == min(dists)[1]


def test_adc_topk_matches_python(emb, books):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.pq_topk(emb, queries, k=5, codebooks=books)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc) for r in out.collect()
    }
    # python reference
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    codes = {r.vec_id: list(r.codes) for r in S.pq_encode(emb, books).collect()}
    dsub = len(books[0][0])
    for qid in range(3):
        q = vecs[qid]
        lut = [
            [round(sum((a - b) ** 2 for a, b in zip(q[j * dsub:(j + 1) * dsub], code)), 9)
             for code in book]
            for j, book in enumerate(books)
        ]
        scored = sorted(
            (round(sum(lut[j][codes[v][j]] for j in range(8)), 9), v)
            for v in vecs
        )
        for rank, (d, v) in enumerate(scored[:5], start=1):
            assert got[(qid, rank)][0] == v
            assert abs(got[(qid, rank)][1] - round(d, 6)) < 1e-6


def test_pq_recall_sanity(emb, books):
    """PQ is approximate; still, each query's own vector must rank
    first (distance to itself is the minimum of every LUT row it
    generated), and recall@10 vs exact brute force should be well
    above chance."""
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = S.pq_topk(emb, queries, k=10, codebooks=books)
    exact = S.brute_force_topk(emb, queries, k=10)
    pq_sets = {
        q: {r.neighbor_id for r in rows}
        for q, rows in _group(pq.collect(), "query_id").items()
    }
    ex_sets = {
        q: {r.neighbor_id for r in rows}
        for q, rows in _group(exact.collect(), "query_id").items()
    }
    firsts = {r.query_id: r.neighbor_id for r in pq.where(F.col("rank") == 1).collect()}
    for q in range(8):
        assert firsts[q] == q
    mean_recall = sum(
        len(pq_sets[q] & ex_sets[q]) / 10 for q in range(8)
    ) / 8
    assert mean_recall >= 0.3


def _group(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(getattr(r, key), []).append(r)
    return out
