"""Generate a larger scale-factor dataset from the driver's seeded
sf0.1 tables, for LOCAL scale rehearsals only (SCALE.md; VERDICT r3
item 9).  The driver's own testdata is read-only — output goes to a
scratch dir (default /tmp/sfN).

Method: replicate every fact table K times with consistent key
offsets (foreign keys shift together, so join selectivities are
preserved exactly); `events` replicas shift both ids and timestamps
(the time RANGE grows with the data, like a longer retention window);
`documents` replicas remap the token vocabulary (token -> token+str(k))
so near-dup structure within a replica matches sf0.1 and replicas
share no shingles — total near-dup pair count scales linearly, like
a real corpus 10x the size; `embeddings` are freshly drawn iid unit
vectors (same distribution as the originals).  Dimensions
(region/nation) stay fixed, as at any TPC-H scale.

Usage: python tools/gen_scale_data.py [K] [out_dir]
  K        replication factor vs sf0.1 (default 10 -> "sf1")
  out_dir  default /tmp/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ksrc AS SELECT * FROM range({k}) t(kk)")

    def copy(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    # key spans for offsetting (max+1 keeps replicas disjoint)
    span = {
        name: con.sql(
            f"SELECT max({col}) + 1 FROM '{SRC}/{name}.parquet'"
        ).fetchone()[0]
        for name, col in [
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
        ]
    }

    copy("customer", f"""
        SELECT c_custkey + kk*{span['customer']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', ksrc""")
    copy("supplier", f"""
        SELECT s_suppkey + kk*{span['supplier']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', ksrc""")
    copy("part", f"""
        SELECT p_partkey + kk*{span['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', ksrc""")
    copy("orders", f"""
        SELECT o_orderkey + kk*{span['orders']} AS o_orderkey,
               o_custkey + kk*{span['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', ksrc""")
    copy("lineitem", f"""
        SELECT l_orderkey + kk*{span['orders']} AS l_orderkey,
               l_partkey + kk*{span['part']} AS l_partkey,
               l_suppkey + kk*{span['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', ksrc""")
    # events: user population AND time range both grow; props carried
    # verbatim (jq workloads see k-times the documents)
    copy("events", f"""
        SELECT event_id + kk*{span['events']} AS event_id,
               ts + INTERVAL (kk*35) DAY AS ts,
               user_id + kk*{span['customer']} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', ksrc""")
    # documents: per-replica token remap — replica k's vocabulary is
    # disjoint from replica j's, so shingle/gram sets never collide
    # across replicas and near-dup pairs scale linearly
    copy("documents", f"""
        SELECT doc_id + kk*{span['documents']} AS doc_id,
               CASE WHEN kk = 0 THEN text ELSE
                 list_aggregate([tok || CAST(kk AS VARCHAR)
                                 for tok in str_split(text, ' ')],
                                'string_agg', ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN kk = 0 THEN text ELSE
                 list_aggregate([tok || CAST(kk AS VARCHAR)
                                 for tok in str_split(text, ' ')],
                                'string_agg', ' ')
               END) AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet', ksrc""")

    # embeddings: fresh iid unit vectors, same count scaling + labels
    n_src, dim, n_labels = con.sql(
        f"SELECT count(*), max(len(embedding)), max(label) + 1 "
        f"FROM '{SRC}/embeddings.parquet'"
    ).fetchone()
    rng = np.random.default_rng(42)
    n = n_src * k
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    import pandas as pd

    emb = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
        "label": (np.arange(n) % n_labels).astype(np.int32),
    })
    con.register("embdf", emb)
    copy("embeddings", "SELECT vec_id, embedding::FLOAT[] AS embedding, label FROM embdf")


if __name__ == "__main__":
    main()
