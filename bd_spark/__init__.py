"""bd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bnclabs/bd (a jq-like JSON toolkit),
rebuilt Spark-first for 100 TB scale.

Layout:
    bd_spark.session    — tuned SparkSession builder
    bd_spark.catalog    — table loading for the driver's star schema
    bd_spark.jsonq      — the jq-like query language: parser -> AST ->
                          Catalyst compiler over Spark 4 VariantType
    bd_spark.operators  — scale-path operators: dedup, similarity,
                          text analysis, multimodal plumbing
    bd_spark.queries    — headline analytical queries (driver contract)
    bd_spark.sources    — document stream readers (jsonl, parquet)
    bd_spark.streaming  — Structured Streaming entry points
"""

__version__ = "0.1.0"

from bd_spark.session import get_spark  # noqa: F401
