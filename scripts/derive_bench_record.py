"""Derive bench_record.json from the committed bench_out.json.

The record-integrity rule (SCALE.md §16): record values must be
WITNESSED by a committed pass_detail — ``queries`` = per-query min of
the passes, ``budget_queries`` = per-query median.  This script is the
only sanctioned writer of bench_record.json; scripts/
audit_bench_record.py (run in CI) then verifies the derivation holds.

Usage: python scripts/derive_bench_record.py [note]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "bench_out.json")) as fh:
        out = json.load(fh)
    detail = out["pass_detail"]
    record = {
        "sf": out["sf"],
        "cpus": out["cpus"],
        "n_queries": len(detail),
        "queries": {q: min(p) for q, p in sorted(detail.items())},
        "budget_queries": {
            q: round(statistics.median(p), 3)
            for q, p in sorted(detail.items())},
        "note": (sys.argv[1] if len(sys.argv) > 1 else
                 "derived from bench_out.json pass_detail "
                 "(queries=min, budget=median) by "
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
        "sf": out["sf"],
        "cpus": out["cpus"],
        "pass_detail": {q: p for q, p in sorted(detail.items())},
        "note": "witness copy of the bench_out.json pass_detail this "
                "record was derived from; written only by "
                "scripts/derive_bench_record.py",
    }
    wpath = os.path.join(REPO, "bench_witness.json")
    with open(wpath, "w") as fh:
        json.dump(witness, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path} + {wpath}: {len(detail)} queries, "
          f"suite min-sum {round(sum(record['queries'].values()), 1)}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
