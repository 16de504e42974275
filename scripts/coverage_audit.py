"""Mechanical operator-inventory audit: every stage, expression
operator and match operator in the compiler dispatch tables, plus
which are exercised by the driver-contract queries and the reference
corpus.  The per-round parity check SURVEY.md §2 asks for, as a tool.

Usage: python scripts/coverage_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pincette_json_streams_spark.operators import match as match_mod
    from pincette_json_streams_spark.operators.expressions import OPERATORS
    from pincette_json_streams_spark.operators.stages import STAGES

    # match operators are dispatched structurally, not via a table:
    # inventory them from the module source
    match_src = Path(match_mod.__file__).read_text()
    QUERY_OPERATORS = sorted(set(
        re.findall(r'"(\$[a-zA-Z]+)"', match_src)
    ) - {"$options"})  # $options is a modifier of $regex, not an op

    repo = Path(__file__).parent.parent
    sources = ""
    for p in [repo / "__spark_entry__.py", *sorted(
            (repo / "tests").glob("*.py")), *sorted(
            (repo / "examples").rglob("*.yaml"))]:
        sources += p.read_text()
    ref_corpus = ""
    ref = Path("/root/reference/src/test/resources")
    if ref.is_dir():
        for p in sorted(ref.rglob("*.json")) + sorted(
                ref.rglob("*.yaml")):
            try:
                ref_corpus += p.read_text()
            except UnicodeDecodeError:
                pass

    def audit(name, table):
        used, unused = [], []
        for op in sorted(table):
            pat = re.escape(op)
            if re.search(pat, sources) or re.search(pat, ref_corpus):
                used.append(op)
            else:
                unused.append(op)
        print(f"{name}: {len(table)} registered, "
              f"{len(used)} exercised by queries/tests/corpus")
        if unused:
            print(f"  NOT exercised: {unused}")
        return {"registered": len(table), "exercised": len(used),
                "unexercised": unused}

    report = {
        "stages": audit("stages", STAGES),
        "expression_operators": audit("expression operators", OPERATORS),
        "query_operators": audit("query (match) operators",
                                 QUERY_OPERATORS),
    }
    print(json.dumps({
        k: {"registered": v["registered"], "exercised": v["exercised"]}
        for k, v in report.items()
    }))


if __name__ == "__main__":
    main()
