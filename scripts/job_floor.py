"""Job-floor ledger for the fixed-overhead watch queries.

The round-6..8 verdicts carry three queries (pagerank_top,
graph_triangles, bloom_prefilter) whose absolute times are 2-30x a
sub-second DuckDB twin with a "local job-scheduling floor" story.
This script makes that story falsifiable: for each query it measures,
at sf0.01 AND sf0.1,

- wall time (min of ``--passes`` runs),
- the number of Spark JOBS the run launches (status-tracker job-group
  count — AQE materializes every exchange as a job on local mode),

plus the host's per-job floor (min wall time of a 32-task no-data job),
and prints the decomposition

    floor    = jobs * per_job_floor
    residual = wall - floor        (the data-proportional part)

If the story is true, residual must scale with sf while floor stays
constant; at cluster scale the floor amortizes away entirely (a 100x
bigger input does not add jobs — it adds tasks per job).

Usage: python scripts/job_floor.py [--passes 3] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pagerank_top", "graph_triangles", "bloom_prefilter",
    # round-11 additions: the remaining >2x-vs-twin SUB-SECOND rows
    # whose sf0.01->sf0.1 pairs are nearly flat — same fixed-cost
    # story, now falsifiable the same way
    "dsir_weights", "dup_spans", "bigram_lm",
    # round-11: the iterative connected-components rollup over audio
    # window near-pair edges — wall time is dominated by per-iteration
    # job launches, the same fixed-cost story as pagerank
    "audio_clusters",
]


def per_job_floor(spark, n: int = 20) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        spark.range(0, 32, 1, 32).count()
        best = min(best, time.monotonic() - t0)
    return best


def measure(spark, fn, sf_dir: str, name: str, passes: int):
    tracker = spark.sparkContext.statusTracker()
    best = None
    for p in range(passes):
        group = f"jobfloor-{name}-{p}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(group))
        if best is None or wall < best[0]:
            best = (wall, jobs)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1]) if "=" in a else passes
    names = args or QUERIES

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    floor = per_job_floor(spark)
    out = {"per_job_floor_sec": round(floor, 4), "queries": {}}
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        row = {}
        for sf, sf_dir in (("0.01", "/root/testdata/sf0.01"),
                           ("0.1", "/root/testdata/sf0.1")):
            wall, jobs = measure(spark, fn, sf_dir, f"{name}-{sf}", passes)
            row[sf] = {
                "wall_sec": round(wall, 3),
                "jobs": jobs,
                "floor_sec": round(jobs * floor, 3),
                "residual_sec": round(max(0.0, wall - jobs * floor), 3),
            }
        out["queries"][name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
