"""Honest Theil-Sen A/B: every candidate measured WRAPPED
(orderBy + limit(25) + collect), because count() on the bare aggregate
lets Catalyst prune the collect_list/array_sort work entirely — the
round-8 'join-free is faster' A/B measured that pruned skeleton, not
the plan (the 0.7 s vs 3.5 s in-suite mystery).

Candidates:
  A  = round-8 join-free (struct collect + generators + struct-sort agg)
  B  = round-7 self-join (struct-sort agg)
  A2 = A's generators, but the median agg collects PLAIN DOUBLES
       (native sort; slope ties make (r1,r2) order irrelevant to the
       selected VALUE)
  C3 = single-agg: points collected once, t/v split into primitive
       arrays, pairs + median computed in ONE projection (sequence
       generators, no struct slices, double sort)

Measured (sf0.1, interleaved, wrapped, 4 rounds):
  A 3.6-4.4 s | B 1.8-3.1 s | A2 2.0-2.2 s | C3 47-48 s (nested HOF
  lambdas are interpreted per element — never expand pairs in-array)
  B2 (added below: B's join + plain-double median agg) 1.25-1.66 s —
  the adopted round-9 shape.

Run: python scripts/ab_theil2.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scripts.ab_theil import _pts, shape_a, shape_b


def _finish(med):
    return med.select(
        F.col("g").alias("user_id"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("pn").cast("long").alias("n_pairs"),
        F.floor(F.col("slope") + F.lit(0.5)).cast("bigint")
        .alias("slope_e6"),
    )


def shape_a2(spark, ev):
    pts = _pts(ev)
    arr = pts.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("r", "t", "v"))).alias("a"))
    pairs = (
        arr.select("g", "a", F.posexplode("a").alias("i", "x"))
        .select("g", "x",
                F.explode(F.expr("slice(a, i + 2, size(a))")).alias("y"))
        .filter(F.col("x.t") != F.col("y.t"))
        .select("g", F.col("y.r").alias("r2"),
                ((F.col("y.v") - F.col("x.v")).cast("double")
                 / (F.col("y.t") - F.col("x.t")).cast("double"))
                .alias("slope")))
    med = (pairs.groupBy("g")
           .agg(F.array_sort(F.collect_list("slope")).alias("__ps"),
                F.max("r2").alias("n_points"))
           .select("g", "n_points", F.size("__ps").alias("pn"),
                   F.expr("element_at(__ps, int((size(__ps) + 1) div 2))")
                   .alias("slope")))
    return _finish(med)


def shape_c3(spark, ev):
    pts = _pts(ev)
    arr = pts.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("r", "t", "v"))).alias("a"))
    split = arr.select(
        "g", F.size("a").alias("n"),
        F.expr("transform(a, x -> x.t)").alias("ts"),
        F.expr("transform(a, x -> x.v)").alias("vs"))
    slopes = F.expr(
        "array_sort(filter(flatten(transform(sequence(1, n - 1), j -> "
        "transform(sequence(0, j - 1), i -> "
        "IF(ts[j] = ts[i], CAST(NULL AS DOUBLE), "
        "CAST(vs[j] - vs[i] AS DOUBLE) / CAST(ts[j] - ts[i] AS DOUBLE))"
        "))), s -> s IS NOT NULL))")
    med = (split.filter(F.col("n") >= 2)
           .select("g", F.col("n").alias("n_points"),
                   slopes.alias("__s"))
           .filter(F.size("__s") >= 1)
           .select("g", "n_points", F.size("__s").alias("pn"),
                   F.expr("element_at(__s, int((size(__s) + 1) div 2))")
                   .alias("slope")))
    return _finish(med)


def wrap(s):
    return (s.orderBy(F.col("slope_e6").desc(), "user_id").limit(25)
            .select(F.col("user_id").cast("long").alias("user_id"),
                    "n_points", "n_pairs", "slope_e6"))


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

    from pincette_json_streams_spark.sources.tables import load_table

    shapes = {"A_r8": shape_a, "B_r7": shape_b, "A2_dbl": shape_a2,
              "C3_arr": shape_c3}

    # correctness first: FULL result sets must be identical at sf0.01
    ev01 = load_table(spark, "/root/testdata/sf0.01", "events")
    full = {k: sorted(map(tuple, fn(spark, ev01).collect()))
            for k, fn in shapes.items()}
    ref = full["A_r8"]
    for k, v in full.items():
        print(f"full[{k}] == A: {v == ref} ({len(v)} rows)")
    assert all(v == ref for v in full.values())

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    t = {k: [] for k in shapes}
    for r in range(rounds):
        for k, fn in shapes.items():
            t0 = time.time()
            wrap(fn(spark, ev)).collect()
            dt = round(time.time() - t0, 3)
            t[k].append(dt)
            print(f"round {r} {k}: {dt}", flush=True)
    print({k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
           for k, v in t.items()})


if __name__ == "__main__":
    main()


def shape_b2(spark, ev):
    """r7 self-join pair step + plain-double median agg."""
    pts = _pts(ev).localCheckpoint(eager=False)
    a = pts.select("g", F.col("t").alias("t1"), F.col("v").alias("v1"),
                   F.col("r").alias("r1"))
    b = pts.select(F.col("g").alias("g2"), F.col("t").alias("t2"),
                   F.col("v").alias("v2"), F.col("r").alias("r2"))
    pairs = (a.join(b, (F.col("g") == F.col("g2"))
                    & (F.col("r1") < F.col("r2")))
             .filter(F.col("t1") != F.col("t2"))
             .select("g", "r2",
                     ((F.col("v2") - F.col("v1")).cast("double")
                      / (F.col("t2") - F.col("t1")).cast("double"))
                     .alias("slope")))
    med = (pairs.groupBy("g")
           .agg(F.array_sort(F.collect_list("slope")).alias("__ps"),
                F.max("r2").alias("n_points"))
           .select("g", "n_points", F.size("__ps").alias("pn"),
                   F.expr("element_at(__ps, int((size(__ps) + 1) div 2))")
                   .alias("slope")))
    return _finish(med)
