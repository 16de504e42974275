"""Interleaved A/B for prefix_jaccard (r12 optimization round).

Shapes:
  A  current prefix_filter_pairs (import)
  B  freq frame lazily checkpointed (cuts the 4x recompute of the
     token-frequency aggregate — one per `ordered` consumer)
  C  freq via count() window over w instead of groupBy+broadcast join

Interleaves the shapes round-robin so host CPU-steal bursts hit all
shapes equally; reports per-pass times and the min.

Run: python scripts/ab_prefix_r12.py [rounds] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window


def _toks(df, text_col, id_col, n):
    from pincette_json_streams_spark.functions.dedup import _spread
    from pincette_json_streams_spark.functions.text import normalize_text
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                     lambda x: x != "")
    return _spread(df, by=id_col).select(
        F.col(id_col).alias("id"), words.alias("__w"),
    ).select(
        "id",
        F.array_distinct(F.expr(
            f"CASE WHEN size(__w) >= {n} THEN "
            f"transform(sequence(1, size(__w) - {n - 1}),"
            f" i -> concat_ws(' ', slice(__w, i, {n})))"
            f" ELSE array() END"
        )).alias("tok"),
    ).filter(F.size("tok") > 0).localCheckpoint(eager=False)


def _finish(ordered, threshold_pct):
    pref = ordered.withColumn(
        "p", F.expr(f"sz - (({threshold_pct} * sz + 99) div 100) + 1")
    ).select(
        "id", "sz",
        F.posexplode(F.expr("slice(arr, 1, int(p))")).alias("pos", "w"))
    a, b = pref.alias("a"), pref.alias("b")
    ubound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos") - 1,
        F.col("b.sz") - F.col("b.pos") - 1)
    cand = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("a.id") < F.col("b.id"))
               & (F.col("a.sz") * 100 >= threshold_pct * F.col("b.sz"))
               & (F.col("b.sz") * 100 >= threshold_pct * F.col("a.sz"))
               & (ubound * (100 + threshold_pct)
                  >= threshold_pct
                  * (F.col("a.sz") + F.col("b.sz"))))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = ordered.select("id", "arr", "sz")
    verified = (
        cand.join(sets.select(F.col("id").alias("id_a"),
                              F.col("arr").alias("arr_a"),
                              F.col("sz").alias("sz_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"),
                          F.col("arr").alias("arr_b"),
                          F.col("sz").alias("sz_b")), "id_b")
        .withColumn("inter",
                    F.size(F.array_intersect("arr_a", "arr_b"))
                    .cast("bigint"))
        .withColumn("uni",
                    (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                    .cast("bigint"))
        .filter(F.col("inter") * 100 >= F.lit(threshold_pct)
                * F.col("uni"))
    )
    return verified.select(
        "id_a", "id_b", "inter", "uni",
        F.expr("(inter * 1000000) div uni").alias("jacc_e6"),
    )


def shape_a(df, threshold_pct=60, n=3):
    from pincette_json_streams_spark.functions.dedup import (
        prefix_filter_pairs,
    )
    return prefix_filter_pairs(df, threshold_pct=threshold_pct, n=n)


def shape_b(df, threshold_pct=60, n=3):
    """freq lazily checkpointed."""
    toks = _toks(df, "text", "doc_id", n)
    ex = toks.select("id", F.explode("tok").alias("w"))
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("c")) \
        .localCheckpoint(eager=False)
    ordered = (
        ex.join(freq, "w")
        .groupBy("id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("c", "w"))),
            lambda s: s["w"]).alias("arr"))
        .withColumn("sz", F.size("arr"))
    )
    return _finish(ordered, threshold_pct)


def shape_c(df, threshold_pct=60, n=3):
    """freq via window count over w (no aggregate + join)."""
    toks = _toks(df, "text", "doc_id", n)
    ex = toks.select("id", F.explode("tok").alias("w"))
    wc = ex.withColumn("c", F.count(F.lit(1)).over(
        Window.partitionBy("w")))
    ordered = (
        wc.groupBy("id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("c", "w"))),
            lambda s: s["w"]).alias("arr"))
        .withColumn("sz", F.size("arr"))
    )
    return _finish(ordered, threshold_pct)


def shape_d(df, threshold_pct=60, n=3):
    """ordered persisted (deserialized in-memory cache): computed once,
    3 cache hits for the other consumers (pref-b, sets-a, sets-b)."""
    toks = _toks(df, "text", "doc_id", n)
    ex = toks.select("id", F.explode("tok").alias("w"))
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ordered = (
        ex.join(freq, "w")
        .groupBy("id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("c", "w"))),
            lambda s: s["w"]).alias("arr"))
        .withColumn("sz", F.size("arr"))
    ).persist()
    return _finish(ordered, threshold_pct)


def shape_e(df, threshold_pct=60, n=3):
    """freq checkpoint + pref persisted (the self-join sides share one
    computation of the exploded prefix postings)."""
    toks = _toks(df, "text", "doc_id", n)
    ex = toks.select("id", F.explode("tok").alias("w"))
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("c")) \
        .localCheckpoint(eager=False)
    ordered = (
        ex.join(freq, "w")
        .groupBy("id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("c", "w"))),
            lambda s: s["w"]).alias("arr"))
        .withColumn("sz", F.size("arr"))
    )
    pref = ordered.withColumn(
        "p", F.expr(f"sz - (({threshold_pct} * sz + 99) div 100) + 1")
    ).select(
        "id", "sz",
        F.posexplode(F.expr("slice(arr, 1, int(p))")).alias("pos", "w")
    ).persist()
    a, b = pref.alias("a"), pref.alias("b")
    ubound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos") - 1,
        F.col("b.sz") - F.col("b.pos") - 1)
    cand = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("a.id") < F.col("b.id"))
               & (F.col("a.sz") * 100 >= threshold_pct * F.col("b.sz"))
               & (F.col("b.sz") * 100 >= threshold_pct * F.col("a.sz"))
               & (ubound * (100 + threshold_pct)
                  >= threshold_pct
                  * (F.col("a.sz") + F.col("b.sz"))))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = ordered.select("id", "arr", "sz")
    verified = (
        cand.join(sets.select(F.col("id").alias("id_a"),
                              F.col("arr").alias("arr_a"),
                              F.col("sz").alias("sz_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"),
                          F.col("arr").alias("arr_b"),
                          F.col("sz").alias("sz_b")), "id_b")
        .withColumn("inter",
                    F.size(F.array_intersect("arr_a", "arr_b"))
                    .cast("bigint"))
        .withColumn("uni",
                    (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                    .cast("bigint"))
        .filter(F.col("inter") * 100 >= F.lit(threshold_pct)
                * F.col("uni"))
    )
    return verified.select(
        "id_a", "id_b", "inter", "uni",
        F.expr("(inter * 1000000) div uni").alias("jacc_e6"),
    )


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
    from pincette_json_streams_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")

    shapes = {"A_current": shape_a, "B_freq_ckpt": shape_b,
              "C_window": shape_c, "D_ordered_persist": shape_d,
              "E_pref_persist": shape_e}
    # correctness first: all shapes must agree exactly
    ref = None
    for k, fn in shapes.items():
        rows = sorted(map(tuple, fn(docs).collect()))
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
            fn(docs).count()
            dt = round(time.time() - t0, 3)
            t[k].append(dt)
            spark.catalog.clearCache()
            print(f"round {r} {k}: {dt}", flush=True)
    print({k: (min(v), v) for k, v in t.items()})


if __name__ == "__main__":
    main()
