"""Parallel-scaling probe (r13, VERDICT item 8): the driver's c8/c32
ratio table was unusable in round 12 (both runs storm-contaminated, ratios
0.03-38 on identical plans), so measure scaling ourselves, witnessed.

Runs the heaviest benched queries at local[LOW] and local[HIGH]
(default 4 and 32) in ONE process — low first, then high, 3 passes
each, min taken — gated on the 1-min load average before each tier so
an external storm can't masquerade as serial code.  A query that
genuinely parallelizes should show ratio (low/high) well above 1 as
long as its runtime is not dominated by Spark's fixed per-action floor;
sub-second queries sit near the floor and report ~1 by construction.

Writes scaling_probe_out.json {query: {low, high, ratio}, ...} next to
this script's repo root and prints one JSON line.

Usage: python scripts/scaling_probe.py [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the heaviest queries by committed record minima, excluding the
# sub-second floor-bound rows the probe cannot say anything about
PROBE_QUERIES = [
    "prefix_jaccard",
    "dedup_canonical",
    "pagerank_top",
    "graph_triangles",
    "curation_funnel",
    "dedup_ngram_capped",
    "theil_sen_trend",
    "dup_containment_capped",
    "ann_hamming_lsh",
    "warc_extract",
]


def wait_quiet(limit: float = 1.5, timeout: float = 180.0) -> float:
    waited = 0.0
    try:
        while os.getloadavg()[0] > limit and waited < timeout:
            time.sleep(5)
            waited += 5
    except OSError:
        pass
    return waited


def run_tier(cpus: int, names: list, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-probe-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    import __spark_entry__ as entry

    qs = entry.queries()
    # same warmup contract as bench.py: worker pool + footers
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _wf(s):
        import numpy as np
        import pandas as pd
        return pd.Series(np.ones(len(s)))

    warm = pandas_udf(_wf, "double", PandasUDFType.SCALAR)
    (spark.range(0, 10000).repartition(cpus)
     .select(warm(F.col("id").cast("string")).alias("x"))
     .agg(F.sum("x")).collect())
    import glob
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).limit(1).collect()
        except Exception:
            pass

    out = {}
    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(runs), "passes": runs}
    spark.stop()
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "4"))
    high = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = PROBE_QUERIES[: int(sys.argv[1])] if len(sys.argv) > 1 \
        else PROBE_QUERIES

    payload: dict = {"low_cpus": low, "high_cpus": high, "sf_dir": sf_dir}
    payload["load_wait_low"] = wait_quiet()
    payload["loadavg_at_low"] = round(os.getloadavg()[0], 2)
    lo = run_tier(low, names, sf_dir)
    payload["load_wait_high"] = wait_quiet()
    payload["loadavg_at_high"] = round(os.getloadavg()[0], 2)
    hi = run_tier(high, names, sf_dir)
    payload["loadavg_after"] = round(os.getloadavg()[0], 2)
    payload["queries"] = {
        n: {
            "low": lo[n]["min"], "high": hi[n]["min"],
            "ratio": round(lo[n]["min"] / hi[n]["min"], 2)
            if hi[n]["min"] else None,
            "passes_low": lo[n]["passes"], "passes_high": hi[n]["passes"],
        }
        for n in names
    }
    out_path = os.path.join(REPO, "scaling_probe_out.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items()
                      if k != "queries"}))
    for n, row in payload["queries"].items():
        print(f"{n}: low {row['low']} high {row['high']} "
              f"ratio {row['ratio']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
