"""Table catalog over the driver's parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any scale factor the
# driver generates (region=5, nation=25, supplier/part grow slowly).
BROADCAST_TABLES = {"region", "nation", "supplier", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _fix_nanos(df)


def _fix_nanos(df: DataFrame) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as epoch-nano longs
    (spark.sql.legacy.parquet.nanosAsLong); restore them to timestamps
    at microsecond precision. Integer `div` avoids the double-precision
    loss a float division would cause on 1.7e18-scale nanos."""
    from pyspark.sql import functions as F

    for field in df.schema.fields:
        if field.name in ("ts", "o_orderdate", "l_shipdate") and field.dataType.simpleString() == "bigint":
            df = df.withColumn(field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so spark.sql() can see them."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
