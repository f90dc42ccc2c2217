"""Decompose pipe_curate's warm cost stage by stage (r11 session 3).

Each stage is timed with the bench's _force sink after
clearCache() (per-rep bench semantics), rebuilt per rep.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _force  # noqa: E402
from bd_spark.catalog import table  # noqa: E402
from bd_spark.operators import dedup  # noqa: E402
from bd_spark.operators import text as T  # noqa: E402
from bd_spark.queries.pipeline import rebalance  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_scored(spark):
    docs = rebalance(table(spark, "documents", SF))
    m = T.quality_metrics(F.col("text"))
    return docs.select(
        "doc_id", "text",
        T.lang_id(F.col("text")).alias("lang_pred"),
        m["n_tokens"].alias("n_tokens"),
        F.round(T.quality_score(F.col("text")), 6).alias("q"),
    )


def stage_kept(spark):
    return stage_scored(spark).where(F.col("q") >= 0.9)


def stage_uniq(spark):
    kept = stage_kept(spark)
    exact_reps = (
        kept.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return kept.join(exact_reps, "doc_id", "left_semi")


def stage_sig(spark):
    uniq = stage_uniq(spark).persist()
    return dedup.minhash_signature(uniq, "doc_id", "text", shingle_n=3)


def stage_pairs(spark):
    uniq = stage_uniq(spark).persist()
    return dedup.minhash_lsh_dedup(uniq, "doc_id", "text", threshold=0.7)


def stage_full(spark):
    from bd_spark.queries.pipeline import pipe_curate
    return pipe_curate(spark, SF)


STAGES = [
    ("scored", stage_scored),
    ("kept", stage_kept),
    ("uniq", stage_uniq),
    ("sig", stage_sig),
    ("pairs", stage_pairs),
    ("full", stage_full),
]


def main():
    spark = get_spark("curateprobe")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("REPS", "3"))
    for name, fn in STAGES:
        times = []
        for _ in range(reps + 1):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark)
            _force(df)
            times.append(time.time() - t0)
        print(f"{name:10s} cold={times[0]:6.2f} warm={min(times[1:]):6.2f}  "
              f"load={os.getloadavg()[0]:5.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
