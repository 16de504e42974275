"""Interleaved A/B/C for the theil_sen_trend pair step at sf0.1.

Shapes (all share the capped-points window and the output contract):
  A = round-8 join-free: collect_list -> posexplode+explode generators
      -> second groupBy collect_list(struct)+array_sort median
  B = round-7 self-join: pts x pts on g with r1<r2, lazy localCheckpoint,
      single collect_list(struct)+array_sort agg
  C = single-agg in-array: ONE groupBy collect_list, pairs + median
      computed in one projection (flatten/transform/filter/array_sort
      over plain doubles — no struct comparator, no second exchange)

Run: python scripts/ab_theil.py [rounds]
Prints per-round times interleaved and a summary; correctness of C vs A
checked first at sf0.01 (exact row set).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _base(ev):
    vd = F.col("value").cast("double")
    return ev.filter(~F.isnan(vd) & (F.abs(vd) != float("inf"))).select(
        F.col("user_id").alias("g"),
        F.expr("ts_nanos div 1000000000").alias("t"),
        F.floor(vd * 1000000 + F.lit(0.5)).cast("bigint").alias("v"),
        F.col("event_id").alias("id"),
    )


def _pts(ev):
    w = Window.partitionBy("g").orderBy("t", "id")
    return (_base(ev).withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 64))


def _finish(med, spark):
    return med.select(
        F.col("g").alias("user_id"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("pn").cast("long").alias("n_pairs"),
        F.floor(F.col("slope") + F.lit(0.5)).cast("bigint")
        .alias("slope_e6"),
    )


def shape_a(spark, ev):
    pts = _pts(ev)
    arr = pts.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("r", "t", "v"))).alias("a"))
    pairs = (
        arr.select("g", "a", F.posexplode("a").alias("i", "x"))
        .select("g", "x",
                F.explode(F.expr("slice(a, i + 2, size(a))")).alias("y"))
        .filter(F.col("x.t") != F.col("y.t"))
        .select("g", F.col("x.r").alias("r1"), F.col("y.r").alias("r2"),
                ((F.col("y.v") - F.col("x.v")).cast("double")
                 / (F.col("y.t") - F.col("x.t")).cast("double"))
                .alias("slope")))
    med = (pairs.groupBy("g")
           .agg(F.array_sort(F.collect_list(
                F.struct(F.col("slope"), F.col("r1"), F.col("r2"))))
                .alias("__ps"),
                F.max("r2").alias("n_points"))
           .select("g", "n_points", F.size("__ps").alias("pn"),
                   F.expr("element_at(__ps, int((size(__ps) + 1) div 2))"
                          ".slope").alias("slope")))
    return _finish(med, spark)


def shape_b(spark, ev):
    pts = _pts(ev).localCheckpoint(eager=False)
    a = pts.select("g", F.col("t").alias("t1"), F.col("v").alias("v1"),
                   F.col("r").alias("r1"))
    b = pts.select(F.col("g").alias("g2"), F.col("t").alias("t2"),
                   F.col("v").alias("v2"), F.col("r").alias("r2"))
    pairs = (a.join(b, (F.col("g") == F.col("g2"))
                    & (F.col("r1") < F.col("r2")))
             .filter(F.col("t1") != F.col("t2"))
             .select("g", "r1", "r2",
                     ((F.col("v2") - F.col("v1")).cast("double")
                      / (F.col("t2") - F.col("t1")).cast("double"))
                     .alias("slope")))
    med = (pairs.groupBy("g")
           .agg(F.array_sort(F.collect_list(
                F.struct(F.col("slope"), F.col("r1"), F.col("r2"))))
                .alias("__ps"),
                F.max("r2").alias("n_points"))
           .select("g", "n_points", F.size("__ps").alias("pn"),
                   F.expr("element_at(__ps, int((size(__ps) + 1) div 2))"
                          ".slope").alias("slope")))
    return _finish(med, spark)


def shape_c(spark, ev):
    pts = _pts(ev)
    arr = pts.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("r", "t", "v"))).alias("a"))
    slopes = F.expr(
        "array_sort(filter(flatten(transform(a, (x, i) -> "
        "transform(slice(a, i + 2, size(a)), y -> "
        "IF(y.t = x.t, CAST(NULL AS DOUBLE), "
        "CAST(y.v - x.v AS DOUBLE) / CAST(y.t - x.t AS DOUBLE))))), "
        "s -> s IS NOT NULL))")
    med = (arr.select("g", F.size("a").alias("n_points"),
                      slopes.alias("__s"))
           .filter(F.size("__s") >= 1)
           .select("g", "n_points", F.size("__s").alias("pn"),
                   F.expr("element_at(__s, int((size(__s) + 1) div 2))")
                   .alias("slope")))
    return _finish(med, spark)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from pincette_json_streams_spark.sources.tables import load_tables

    def events(sf_dir):
        return load_tables(spark, sf_dir, names=("events",))["events"]

    # correctness: C vs A vs B exact at sf0.01
    ev01 = events("/root/testdata/sf0.01")
    ra = sorted(map(tuple, shape_a(spark, ev01).collect()))
    rb = sorted(map(tuple, shape_b(spark, ev01).collect()))
    rc = sorted(map(tuple, shape_c(spark, ev01).collect()))
    print("rows:", len(ra), "A==B:", ra == rb, "A==C:", ra == rc)
    assert ra == rb == rc, "shape outputs diverge"

    ev = events("/root/testdata/sf0.1")
    shapes = {"A_generators": shape_a, "B_selfjoin": shape_b,
              "C_inarray": shape_c}
    t = {k: [] for k in shapes}
    for r in range(rounds):
        for k, fn in shapes.items():
            t0 = time.time()
            fn(spark, ev).count()
            dt = round(time.time() - t0, 3)
            t[k].append(dt)
            print(f"round {r} {k}: {dt}", flush=True)
    print({k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
           for k, v in t.items()})


if __name__ == "__main__":
    main()
