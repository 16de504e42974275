"""r13 interleaved A/B: string-shingle vs xxhash64-shingle
prefix_filter_pairs at sf0.1 (the suite's heaviest query).

The old arm is a verbatim replica of the r12 function (string tokens
through postings/regroup/verify); the new arm is the library version
(tokens hashed to 64-bit inside the kernel pass — guide §2.3, narrower
types).  Output identity asserted on the FULL result before timing;
arms alternate inside one session.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_prefix_filter_pairs(df, text_col="text", id_col="doc_id",
                            threshold_pct=60, n=3):
    """Verbatim r12 shape (string shingles)."""
    from pincette_json_streams_spark.functions.caching import (
        tracked_persist,
    )
    from pincette_json_streams_spark.functions.dedup import _spread
    from pincette_json_streams_spark.functions.text import normalize_text

    words = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                     lambda x: x != "")
    toks = _spread(df, by=id_col).select(
        F.col(id_col).alias("id"), words.alias("__w"),
    ).select(
        "id",
        F.array_distinct(F.expr(
            f"CASE WHEN size(__w) >= {n} THEN "
            f"transform(sequence(1, size(__w) - {n - 1}),"
            f" i -> concat_ws(' ', slice(__w, i, {n})))"
            f" ELSE array() END"
        )).alias("tok"),
    ).filter(F.size("tok") > 0) \
        .localCheckpoint(eager=False)
    ex = toks.select("id", F.explode("tok").alias("w"))
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ordered = tracked_persist(
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
        F.posexplode(F.expr("slice(arr, 1, int(p))"))
        .alias("pos", "w"))
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "8"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-prefix-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from pincette_json_streams_spark.functions.caching import (
        release_caches,
    )
    from pincette_json_streams_spark.functions.dedup import (
        prefix_filter_pairs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(arm):
        fn = old_prefix_filter_pairs if arm == "old" \
            else prefix_filter_pairs
        return fn(docs, threshold_pct=60, n=3)

    a = sorted(map(tuple, build("old").collect()))
    spark.catalog.clearCache()
    release_caches()
    b = sorted(map(tuple, build("new").collect()))
    spark.catalog.clearCache()
    release_caches()
    print(f"outputs identical = {a == b}  rows = {len(a)}")
    assert a == b, "old/new outputs differ"

    times: dict[str, list] = {"old": [], "new": []}
    for r in range(rounds):
        for arm in ("old", "new") if r % 2 == 0 else ("new", "old"):
            df = build(arm)
            t0 = time.time()
            df.count()
            times[arm].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            release_caches()
    for arm in ("old", "new"):
        ts = sorted(times[arm])
        print(f"prefix {arm}: min {ts[0]:.3f} med {ts[len(ts) // 2]:.3f}"
              f" all {times[arm]}")
    try:
        la = os.getloadavg()
        print(f"loadavg {la[0]:.2f} {la[1]:.2f}")
    except OSError:
        pass


if __name__ == "__main__":
    main()
