"""In-suite A/B for theil_sen_trend: replay the bench suite PREFIX
(every bench query before theil, in bench order, one pass) to put the
session in the same state the driver's bench measures in, then
interleave the two pair-step shapes.

Run: python scripts/ab_theil_insuite.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.ab_theil import shape_a, shape_b


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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

    import bench
    import __spark_entry__ as entry
    qs = entry.queries()
    sf_dir = "/root/testdata/sf0.1"

    prefix = bench.BENCH_QUERIES[:bench.BENCH_QUERIES.index(
        "theil_sen_trend")]
    t0 = time.time()
    for name in prefix:
        fn = qs.get(name)
        if fn:
            try:
                fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                print("prefix", name, "failed:", e)
    print(f"prefix ({len(prefix)} queries) done in "
          f"{round(time.time() - t0, 1)} s", flush=True)

    from pincette_json_streams_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    t = {"A_generators": [], "B_selfjoin": []}
    for r in range(rounds):
        for k, fn in (("A_generators", shape_a),
                      ("B_selfjoin", shape_b)):
            t0 = time.time()
            fn(spark, ev).count()
            dt = round(time.time() - t0, 3)
            t[k].append(dt)
            print(f"round {r} {k}: {dt}", flush=True)
    print({k: {"min": min(v), "all": v} for k, v in t.items()})


if __name__ == "__main__":
    main()
