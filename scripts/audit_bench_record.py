"""Record-integrity audit: every bench_record.json value must be
witnessed by the committed bench_witness.json pass_detail.

The witness is a copy of the bench_out.json the record was derived
from, written ONLY by scripts/derive_bench_record.py at derivation
time — the external driver overwrites bench_out.json with its own
runs every round, so auditing against bench_out.json directly fails
CI on an artifact the builder never committed (the round-9 red test).

The round-8 lesson: a record value (theil_sen_trend 0.77 s) was
committed from an uncommitted "quiet re-measure" that no committed
pass_detail could reproduce, and the regression budget was widened in
the same breath — which let a real 3.5 s plan regression ride under the
radar.  The rule that makes that impossible:

  * ``queries[q]``   (the record, min-of-passes) may not UNDERCUT
    ``min(pass_detail[q])`` — no phantom fast records;
  * ``budget_queries[q]`` (the regression base, median-of-passes) may
    not EXCEED ``median(pass_detail[q])`` — budgets can only be
    tightened by hand, never loosened past the committed evidence.

Exit 0 when clean; prints violations and exits 1 otherwise.  Also run
as a pytest via tests/test_harness.py.
"""
from __future__ import annotations

import json
import os
import statistics
import sys

EPS = 1e-6
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audit(record_path: str | None = None,
          out_path: str | None = None) -> list[str]:
    record_path = record_path or os.path.join(REPO, "bench_record.json")
    out_path = out_path or os.path.join(REPO, "bench_witness.json")
    with open(record_path) as fh:
        record = json.load(fh)
    if not os.path.exists(out_path):
        return [f"no witness file at {out_path}: re-derive the record "
                f"with scripts/derive_bench_record.py from a committed "
                f"bench_out.json"]
    with open(out_path) as fh:
        out = json.load(fh)
    detail = out.get("pass_detail", {})
    problems = []
    for q, rec_min in record.get("queries", {}).items():
        passes = detail.get(q)
        if not passes:
            problems.append(
                f"{q}: record value {rec_min} has NO committed "
                f"pass_detail witness in bench_out.json")
            continue
        if rec_min < min(passes) - EPS:
            problems.append(
                f"{q}: record {rec_min} undercuts the committed "
                f"witness min {min(passes)} (passes {passes})")
    for q, budget in record.get("budget_queries", {}).items():
        passes = detail.get(q)
        if not passes:
            problems.append(
                f"{q}: budget {budget} has NO committed pass_detail "
                f"witness in bench_out.json")
            continue
        med = statistics.median(passes)
        if budget > med + EPS:
            problems.append(
                f"{q}: budget {budget} exceeds the committed witness "
                f"median {med} (passes {passes})")
    return problems


def main() -> int:
    problems = audit()
    if problems:
        print(f"{len(problems)} record-integrity violations:")
        for p in problems:
            print(" -", p)
        return 1
    print("bench_record.json: all values witnessed by bench_witness.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
