"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB against the same parquet directory, then
compares row count, sorted-by-name schema and a value hash computed over
rows sorted by all columns.  Prints one line per query and a final summary.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


class NonScalarCell(Exception):
    """Raised for list/dict/Row cells: the external driver's pandas
    canonicalizer cannot sort or hash them, so the local gate must be
    exactly as strict — flatten arrays (array_join / to_json) in the
    driver-facing projection instead."""


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, (list, tuple, dict)) or hasattr(v, "asDict"):
        raise NonScalarCell(
            f"non-scalar cell {type(v).__name__}: {str(v)[:80]}")
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            try:
                hs = _hash_rows(scols, srows)
                ho = _hash_rows(ocols, orows)
            except NonScalarCell as ex:
                problems.append(f"driver-contract violation: {ex}")
                hs = ho = None
            if hs is not None and hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                order_s = sorted(range(len(scols)),
                                 key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)),
                                 key=lambda i: ocols[i])
                ls = sorted("\x1f".join(_norm_cell(r[i]) for i in order_s)
                            for r in srows)
                lo = sorted("\x1f".join(_norm_cell(r[i]) for i in order_o)
                            for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(
                            f"first diff:\n  spark  {a[:300]}\n"
                            f"  duckdb {b[:300]}")
                        break
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed"
          + (f": {' '.join(failures)}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
