"""Testdata/table loading helpers.

At production scale these would be Delta tables / Kafka topics; the driver's
testdata is parquet (TESTDATA.md).  One quirk handled centrally: the driver
has shipped ``events.parquet`` with ``ts`` either as parquet
TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as a long
via ``spark.sql.legacy.parquet.nanosAsLong``) or as plain microsecond
timestamps.  We adapt to whichever schema is present and surface ``ts``
both as ``ts_nanos`` (long, epoch nanoseconds, timezone-independent) and
``ts`` (timestamp, microsecond precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

__all__ = ["load_table", "load_tables", "TABLES"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # harmless when ts is already a timestamp; required to read
        # TIMESTAMP(NANOS) parquet at all
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumnsRenamed({"ts": "ts_nanos"}).withColumn(
                "ts",
                F.timestamp_micros((F.col("ts_nanos") / 1000).cast("long")),
            )
        # timestamp[us] (possibly NTZ): derive epoch nanos via
        # timestampdiff against the NTZ epoch — unlike unix_micros(cast),
        # this never routes through the session timezone, matching
        # DuckDB's naive-timestamp epoch() semantics.
        return df.withColumn(
            "ts_nanos",
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                "cast(ts as timestamp_ntz))"
            ) * F.lit(1000),
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
