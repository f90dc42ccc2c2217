"""Decompose pipe_dedup_ngram's warm cost stage by stage (r11 s3)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from bench import _force  # noqa: E402
from bd_spark.catalog import table  # noqa: E402
from bd_spark.operators.hashing import poly_gram_hashes  # noqa: E402
from bd_spark.queries.pipeline import rebalance  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 5
T = 0.6
BLOCKS = ["lang", "len_bucket"]


def docs_df(spark):
    d = table(spark, "documents", SF).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 100)
    )
    return rebalance(d).select(
        F.col("doc_id").alias("id"),
        *[F.col(c) for c in BLOCKS],
        F.array_distinct(
            poly_gram_hashes(F.lower(F.trim(F.col("text"))), N)
        ).alias("ghash"),
    )


def stage_fingerprint(spark):
    return docs_df(spark)


def stage_freq(spark):
    docs = docs_df(spark).persist()
    e = docs.select("id", *BLOCKS, F.size("ghash").alias("nh"),
                    F.explode("ghash").alias("gh"))
    return e.groupBy(*BLOCKS, "gh").agg(F.count("*").alias("df_"))


def stage_prefix(spark):
    docs = docs_df(spark).persist()
    docs.count()
    e = docs.select("id", *BLOCKS, F.size("ghash").alias("nh"),
                    F.explode("ghash").alias("gh"))
    freq = e.groupBy(*BLOCKS, "gh").agg(F.count("*").alias("df_"))
    w = Window.partitionBy("id").orderBy("df_", "gh")
    plen = F.col("nh") - F.ceil(F.lit(T) * F.col("nh")).cast("long") + 1
    return (
        e.join(F.broadcast(freq), [*BLOCKS, "gh"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= plen)
        .select("id", *BLOCKS, "gh", "nh", "rk")
    )


def stage_full(spark):
    from bd_spark.queries.pipeline import pipe_dedup_ngram
    return pipe_dedup_ngram(spark, SF)


STAGES = [
    ("fingerprint", stage_fingerprint),
    ("freq", stage_freq),
    ("prefix", stage_prefix),
    ("full", stage_full),
]


def main():
    spark = get_spark("ngramprobe")
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
        print(f"{name:12s} cold={times[0]:6.2f} warm={min(times[1:]):6.2f}  "
              f"load={os.getloadavg()[0]:5.2f}")
    spark.stop()


if __name__ == "__main__":
    main()


def _common(spark):
    docs = docs_df(spark).persist()
    est_rows = docs.agg(F.sum(F.size("ghash"))).first()[0] or 0
    e = docs.select("id", *BLOCKS, F.size("ghash").alias("nh"),
                    F.explode("ghash").alias("gh"))
    freq = e.groupBy(*BLOCKS, "gh").agg(F.count("*").alias("df_"))
    w = Window.partitionBy("id").orderBy("df_", "gh")
    plen = F.col("nh") - F.ceil(F.lit(T) * F.col("nh")).cast("long") + 1
    prefix = (
        e.join(F.broadcast(freq), [*BLOCKS, "gh"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= plen)
        .select("id", *BLOCKS, "gh", "nh", "rk")
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cond = F.col("pa.id") < F.col("pb.id")
    for c in BLOCKS:
        cond = cond & (F.col(f"pa.{c}") == F.col(f"pb.{c}"))
    cond = cond & (F.col("pa.gh") == F.col("pb.gh"))
    cond = cond & (F.least(F.col("pa.nh"), F.col("pb.nh"))
                   >= F.lit(T) * F.greatest(F.col("pa.nh"), F.col("pb.nh")))
    cond = cond & (
        1 + F.least(F.col("pa.nh") - F.col("pa.rk"),
                    F.col("pb.nh") - F.col("pb.rk"))
        >= F.ceil(F.lit(T / (1.0 + T)) * (F.col("pa.nh") + F.col("pb.nh"))
                  - F.lit(1e-9)))
    return docs, pa, pb, cond, est_rows


def stage_cand(spark):
    docs, pa, pb, cond, _ = _common(spark)
    return (pa.join(pb, cond)
            .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b")))


def stage_cand_distinct(spark):
    from bd_spark.operators.dedup import _verify_parallelism
    docs, pa, pb, cond, _ = _common(spark)
    return (pa.join(pb, cond)
            .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"))
            .distinct().repartition(_verify_parallelism(docs)))


STAGES.extend([("cand", stage_cand), ("cand_dist", stage_cand_distinct)])
