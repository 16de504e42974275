"""DuckDB twin of bench.py: times each BENCH_QUERIES oracle on the same
parquet at the same scale factor, printing one JSON line.  The suite
ratio (bench.py seconds / this) is the BASELINE.md 2x gate.

Usage: python scripts/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entry.oracle_sql()
    times, detail = {}, {}
    for name in bench.BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:
            continue
        runs = []
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(round(time.time() - t0, 3))
        times[name] = min(runs)
        detail[name] = runs
    print(json.dumps({
        "metric": "oracle_suite_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf_dir": sf_dir,
        "passes": 2,
        "agg": "min",
        "pass_detail": detail,
    }))


if __name__ == "__main__":
    main()
