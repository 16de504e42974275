"""Testdata/table loading helpers.

At production scale these would be Delta tables / Kafka topics; the driver's
testdata is parquet (TESTDATA.md).  One quirk handled centrally:
``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is
set; we set it per-session and surface ``ts`` both as ``ts_nanos`` (long)
and ``ts`` (timestamp, microsecond precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

__all__ = ["load_table", "load_tables", "TABLES"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumnsRenamed({"ts": "ts_nanos"}).withColumn(
            "ts",
            F.timestamp_micros((F.col("ts_nanos") / 1000).cast("long")),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
