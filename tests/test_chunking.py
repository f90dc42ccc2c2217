"""chunk_documents: hand-verified cases, coverage properties, and a
DuckDB differential on the real documents table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bd_spark.operators.text import chunk_documents


@pytest.fixture()
def tiny(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens, 1 chunk
        (2, " ".join(f"w{i}" for i in range(8))),    # exactly max_tokens
        (3, " ".join(f"x{i}" for i in range(13))),   # 8 + tail with overlap
        (4, ""),                                     # empty -> no chunks
        (5, "one"),                                  # single token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_small_cases(tiny):
    out = chunk_documents(tiny, "doc_id", "text", max_tokens=8, overlap=2)
    got = {(r.id, r.chunk_id): (r.n_tokens, r.chunk_text) for r in out.collect()}
    # doc 1: 10 tokens, stride 6 -> chunk0 = t0..t7, chunk1 = t6..t9
    assert got[(1, 0)][0] == 8 and got[(1, 0)][1].split() == [f"t{i}" for i in range(8)]
    assert got[(1, 1)][0] == 4 and got[(1, 1)][1].split() == [f"t{i}" for i in range(6, 10)]
    # doc 2: exactly one full chunk, no tail (tail would be pure overlap)
    assert got[(2, 0)][0] == 8
    assert (2, 1) not in got
    # doc 3: 13 tokens -> chunk0 x0..x7, chunk1 x6..x12 (7 tokens)
    assert got[(3, 0)][0] == 8
    assert got[(3, 1)][0] == 7 and got[(3, 1)][1].split() == [f"x{i}" for i in range(6, 13)]
    # doc 4 absent, doc 5 single short chunk kept
    assert not any(k[0] == 4 for k in got)
    assert got[(5, 0)] == (1, "one")


def test_chunk_covers_every_token(spark, sf_dir):
    from bd_spark.catalog import table

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    out = chunk_documents(docs, "doc_id", "text", max_tokens=64, overlap=8)
    # every chunk within bounds; every doc's token count reconstructible:
    # sum(n_tokens) - overlap*(n_chunks-1) == token_count (chunks overlap
    # by exactly `overlap` tokens except possibly the last short tail)
    agg = out.groupBy("id").agg(
        F.sum("n_tokens").alias("s"),
        F.count("*").alias("c"),
        F.max("n_tokens").alias("mx"),
    )
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.filter(F.split(F.lower(F.trim("text")), r"\s+"),
                        lambda t: t != F.lit(""))).alias("n"),
    )
    j = agg.join(toks, "id").collect()
    assert len(j) > 0
    for r in j:
        assert r.mx <= 64
        assert r.s - 8 * (r.c - 1) == r.n


def test_chunk_duckdb_differential(spark, sf_dir):
    from bd_spark.catalog import table
    from bd_spark.queries.pipeline import _TOKS

    mt, ov = 32, 4
    stride = mt - ov
    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    out = chunk_documents(docs, "doc_id", "text", max_tokens=mt, overlap=ov)
    got = sorted(
        (r.id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = con.execute(f"""
        WITH t AS (SELECT doc_id AS id, {_TOKS} AS w FROM documents),
        tok0 AS (
          SELECT id,
                 unnest([{{'pos': i - 1, 'tok': w[i]}} for i in range(1, len(w) + 1)]) AS s
          FROM t
        ),
        tok AS (SELECT id, s.pos AS pos, s.tok AS tok FROM tok0),
        mem0 AS (
          SELECT id, pos, tok,
                 unnest([c for c in range(0, pos // {stride} + 1)
                         if c >= greatest(CAST(ceil((pos - {mt} + 1) / {stride}.0) AS BIGINT), 0)]) AS chunk_id
          FROM tok
        ),
        member AS (SELECT id, pos, tok, chunk_id FROM mem0),
        chunks AS (
          SELECT id, chunk_id, count(*) AS n_tokens,
                 string_agg(tok, ' ' ORDER BY pos) AS chunk_text
          FROM member GROUP BY id, chunk_id
        )
        SELECT id, chunk_id, n_tokens, chunk_text FROM chunks
        WHERE chunk_id = 0 OR n_tokens > {ov}
        ORDER BY id, chunk_id
    """).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_pack_chunks_small(spark):
    from bd_spark.operators.text import pack_chunks

    rows = [(1, 0, 6), (1, 1, 5), (2, 0, 4), (3, 0, 12), (4, 0, 2), (5, 0, 3)]
    df = spark.createDataFrame(rows, "id long, chunk_id long, n_tokens long")
    out = pack_chunks(df, budget=10, shards=1)
    got = {(r.id, r.chunk_id): (r.bin_id, r.bin_pos, r.fill) for r in out.collect()}
    # next-fit in key order with budget 10:
    # (1,0)=6 -> bin0 fill6; (1,1)=5 overflows -> bin1 fill5;
    # (2,0)=4 -> bin1 fill9; (3,0)=12 capped 10 -> bin2 fill10;
    # (4,0)=2 -> bin3 fill2; (5,0)=3 -> bin3 fill5
    assert got[(1, 0)] == (0, 0, 6)
    assert got[(1, 1)] == (1, 0, 5)
    assert got[(2, 0)] == (1, 1, 9)
    assert got[(3, 0)] == (2, 0, 10)
    assert got[(4, 0)] == (3, 0, 2)
    assert got[(5, 0)] == (3, 1, 5)


def test_pack_chunks_properties_sharded(spark, sf_dir):
    """Multi-shard packing invariants on real chunked data: every
    piece lands in exactly one bin, no bin exceeds the budget (capped
    pieces aside), positions are contiguous per bin."""
    from bd_spark.catalog import table
    from bd_spark.operators.text import chunk_documents, pack_chunks

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    chunks = chunk_documents(docs, "doc_id", "text", max_tokens=48, overlap=8)
    out = pack_chunks(chunks, budget=256, shards=4)
    assert out.count() == chunks.count()
    agg = out.groupBy("bin_id").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(256))).alias("s"),
        F.count("*").alias("c"),
        F.max("bin_pos").alias("mp"),
        F.min("bin_pos").alias("mn"),
    ).collect()
    assert len(agg) > 1
    for r in agg:
        assert r.s <= 256
        assert r.mn == 0 and r.mp == r.c - 1


def test_pack_chunks_duckdb_differential(spark, sf_dir):
    """shards=1 next-fit is engine-portable: DuckDB reproduces the
    exact (bin_id, bin_pos, fill) assignment with a recursive scan."""
    from bd_spark.catalog import table
    from bd_spark.operators.text import chunk_documents, pack_chunks

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    chunks = chunk_documents(docs, "doc_id", "text", max_tokens=40, overlap=4)
    out = pack_chunks(chunks, budget=128, shards=1)
    got = sorted(
        (r.id, r.chunk_id, r.bin_id, r.bin_pos, r.fill) for r in out.collect()
    )
    pieces = sorted(
        (r.id, r.chunk_id, min(r.n_tokens, 128)) for r in chunks.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p(id BIGINT, chunk_id BIGINT, ln BIGINT, rn BIGINT)"
    )
    for rn, (i, c, ln) in enumerate(pieces):
        con.execute("INSERT INTO p VALUES (?,?,?,?)", [i, c, ln, rn])
    oracle = con.execute("""
        WITH RECURSIVE fold AS (
          SELECT rn, id, chunk_id, ln, 0 AS bin_id, 0 AS bin_pos, ln AS fill
          FROM p WHERE rn = 0
          UNION ALL
          SELECT p.rn, p.id, p.chunk_id, p.ln,
                 CASE WHEN f.fill + p.ln > 128 THEN f.bin_id + 1 ELSE f.bin_id END,
                 CASE WHEN f.fill + p.ln > 128 THEN 0 ELSE f.bin_pos + 1 END,
                 CASE WHEN f.fill + p.ln > 128 THEN p.ln ELSE f.fill + p.ln END
          FROM fold f JOIN p ON p.rn = f.rn + 1
        )
        SELECT id, chunk_id, bin_id, bin_pos, fill FROM fold ORDER BY id, chunk_id
    """).fetchall()
    assert got == [tuple(r) for r in oracle]
