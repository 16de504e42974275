"""Interleaved A/B for dedup_canonical's representative selection
(r12 optimization round).

Shapes:
  A  old rank -> self-join (row_number()==1 branch joined back)
  B  new first() over the same ordered window, unbounded frame

Both run the full production composition (minhash LSH pairs ->
connected components -> label -> representative); correctness is
asserted first (sorted rows identical), then shapes alternate
round-robin so host CPU-steal bursts hit both equally.

Run: python scripts/ab_canonical_r12.py [rounds] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window


def _labeled(spark, sf_dir):
    from pincette_json_streams_spark.functions.dedup import (
        connected_components, minhash_lsh_pairs,
    )
    from pincette_json_streams_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, edges="star")
    comp = connected_components(pairs, nodes=docs.select("doc_id"))
    return comp.select(F.col("id").alias("doc_id"), "cluster_id") \
        .join(docs.select("doc_id", "n_chars"), "doc_id")


def shape_a(spark, sf_dir):
    labeled = _labeled(spark, sf_dir)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    ranked = labeled.withColumn("rk", F.row_number().over(w))
    rep = ranked.where(F.col("rk") == 1).select(
        "cluster_id", F.col("doc_id").alias("rep_id"))
    return (
        labeled.join(rep, "cluster_id")
        .select(
            "doc_id", "cluster_id",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
             .cast("long").alias("cluster_size"),
            "rep_id",
            (F.col("doc_id") == F.col("rep_id")).alias("keep"),
        )
    )


def shape_b(spark, sf_dir):
    labeled = _labeled(spark, sf_dir)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return labeled.select(
        "doc_id", "cluster_id",
        F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
         .cast("long").alias("cluster_size"),
        F.first("doc_id").over(w).alias("rep_id"),
    ).withColumn("keep", F.col("doc_id") == F.col("rep_id"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    shapes = {"A_rank_join": shape_a, "B_first_window": shape_b}
    ref = None
    for k, fn in shapes.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        if ref is None:
            ref = rows
            print(f"{k}: {len(rows)} rows (reference)")
        else:
            print(f"{k}: {len(rows)} rows match={rows == ref}")
            assert rows == ref, k
        spark.catalog.clearCache()

    t = {k: [] for k in shapes}
    for r in range(rounds):
        for k, fn in shapes.items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            t[k].append(dt)
            spark.catalog.clearCache()
            print(f"round {r} {k}: {dt}", flush=True)
    print({k: (min(v), v) for k, v in t.items()})


if __name__ == "__main__":
    main()
