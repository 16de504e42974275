"""Differential fuzz for the JSLT interpreter (functions/jslt_subset.py).

There is no JSLT binary in this environment, so the oracle is the
SHARED EXPRESSIBLE SUBSET of JSLT and jq: a typed AST generator emits
random programs that render to BOTH languages, with every documented
spec difference encoded in the jq rendering rather than skipped:

  - JSLT field access returns null on non-objects where jq errors
      .a            ->  first(((.a)?, null))
  - JSLT object templates OMIT null-valued pairs
      {"k": E}      ->  ({"k": (E)} | with_entries(select(.value != null)))
  - JSLT size(null) is null where jq's length is 0 (and jq length on a
    number is abs, so size() only renders for ARR/OBJ/STR-typed nodes)
  - JSLT string(5.0) is "5.0" (Java float formatting) where jq's
    tostring gives "5": string() only renders over integer-guaranteed
    numeric subtrees
  - JSLT truthiness (boolean()/not()/if conditions) treats
    null/false/0/""/[]/{} as false; jq only null/false — so boolean(E)
    renders as the explicit truthiness cascade and `if` conditions are
    restricted to BOOL-typed nodes

Each program is evaluated three ways: our JSLT interpreter, our jq
interpreter (itself differentially validated against the jq binary over
9,600+ cases), and the system jq 1.6 binary when present.  A JSLT
result that disagrees with BOTH jq evaluations is a JSLT bug (or a
renderer bug — either way a finding).  Errors compare as a status:
JsltError on one side and JqError/binary-error on the other agree.

Usage: python scripts/fuzz_jslt_differential.py [n_cases] [seed]
Exit 1 on any divergence.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pincette_json_streams_spark.functions.jq_subset import (  # noqa: E402
    JqError, compile_jq,
)
from pincette_json_streams_spark.functions.jslt_subset import (  # noqa: E402
    JsltError, compile_jslt,
)

NUM, STR, BOOL, ARR, OBJ, ANY = "num", "str", "bool", "arr", "obj", "any"


class N:
    """AST node: kind + children; renders to both languages."""

    def __init__(self, kind, typ, *kids, **meta):
        self.kind, self.typ, self.kids, self.meta = kind, typ, kids, meta


def gen(rng, typ=ANY, depth=0, in_loop=False):
    """Generate a node of (at most) the requested type."""
    def any_leaf():
        r = rng.random()
        if r < 0.45:
            path = rng.choice([".a", ".b", ".a.b", ".c"])
            return N("path", ANY, path=path)
        if r < 0.6 and in_loop:
            return N("ctx", ANY)
        return lit(rng)

    def lit(rng):
        v = rng.choice([None, True, False, 0, 1, 7, -3, "s", "x y", "",
                        2.5])
        t = (BOOL if isinstance(v, bool) else
             NUM if isinstance(v, (int, float)) else
             STR if isinstance(v, str) else ANY)
        return N("lit", t, v=v)

    if depth >= 3:
        if typ == NUM:
            return N("lit", NUM, v=rng.choice([0, 1, 7, -3, 2.5]))
        if typ == STR:
            return N("lit", STR, v=rng.choice(["s", "", "x y"]))
        if typ == BOOL:
            return N("lit", BOOL, v=rng.choice([True, False]))
        if typ == ARR:
            return N("arr", ARR, *[lit(rng)
                                   for _ in range(rng.randint(0, 3))])
        if typ == OBJ:
            return N("obj", OBJ, *[lit(rng) for _ in range(2)],
                     keys=["a", "b"])
        return any_leaf()

    d = depth + 1
    if typ == NUM:
        k = rng.random()
        if k < 0.12:
            return N("minmax", NUM, gen(rng, NUM, d, in_loop),
                     gen(rng, NUM, d, in_loop),
                     fn=rng.choice(["min", "max"]))
        if k < 0.5:
            op = rng.choice(["+", "-", "*"])
            return N("arith", NUM, gen(rng, NUM, d, in_loop),
                     gen(rng, NUM, d, in_loop), op=op)
        if k < 0.7:
            return N("size", NUM,
                     gen(rng, rng.choice([ARR, OBJ, STR]), d, in_loop))
        return N("lit", NUM, v=rng.choice([0, 1, 7, -3, 2.5]))
    if typ == STR:
        k = rng.random()
        if k < 0.12:
            return N("joinarr", STR, gen(rng, ARR, d, in_loop))
        if k < 0.3:
            return N("concat", STR, gen(rng, STR, d, in_loop),
                     gen(rng, STR, d, in_loop))
        if k < 0.5:
            return N("case", STR, gen(rng, STR, d, in_loop),
                     up=rng.random() < 0.5)
        if k < 0.7:
            # numbers under string() must stay INTEGER: string(5.0) is
            # "5.0" in JSLT (Java formatting) but "5" in jq — a real
            # language difference, not a bug to find
            pick = rng.random()
            child = (gen_int(rng, d) if pick < 0.4
                     else gen(rng, STR if pick < 0.7 else BOOL, d,
                              in_loop))
            return N("tostr", STR, child)
        return N("lit", STR, v=rng.choice(["s", "", "x y", "AbC"]))
    if typ == BOOL:
        k = rng.random()
        if k < 0.08:
            f = rng.choice(["is-string", "is-array", "is-object",
                            "is-number", "is-boolean"])
            return N("ispred", BOOL, gen(rng, ANY, d, in_loop), fn=f)
        if k < 0.16:
            return N("strpred", BOOL, gen(rng, STR, d, in_loop),
                     gen(rng, STR, d, in_loop),
                     fn=rng.choice(["starts-with", "ends-with"]))
        if k < 0.22:
            return N("contains", BOOL, gen(rng, ANY, d, in_loop),
                     gen(rng, ARR, d, in_loop))
        if k < 0.3:
            op = rng.choice(["<", ">", "<=", ">="])
            return N("cmp", BOOL, gen(rng, NUM, d, in_loop),
                     gen(rng, NUM, d, in_loop), op=op)
        if k < 0.45:
            op = rng.choice(["==", "!="])
            return N("cmp", BOOL, gen(rng, ANY, d, in_loop),
                     gen(rng, ANY, d, in_loop), op=op)
        if k < 0.6:
            op = rng.choice(["and", "or"])
            return N("boolop", BOOL, gen(rng, BOOL, d, in_loop),
                     gen(rng, BOOL, d, in_loop), op=op)
        if k < 0.75:
            return N("not", BOOL, gen(rng, ANY, d, in_loop))
        if k < 0.9:
            return N("boolean", BOOL, gen(rng, ANY, d, in_loop))
        return N("lit", BOOL, v=rng.random() < 0.5)
    if typ == ARR:
        k = rng.random()
        if k < 0.4:
            return N("arr", ARR, *[gen(rng, ANY, d, in_loop)
                                   for _ in range(rng.randint(0, 3))])
        if k < 0.7:
            return N("for", ARR, gen(rng, ARR, d, in_loop),
                     gen(rng, ANY, d, True))
        return N("arr", ARR, *[gen(rng, ANY, d, in_loop)
                               for _ in range(rng.randint(0, 2))])
    if typ == OBJ:
        if rng.random() < 0.25:
            # object comprehension {for (src) K : V if (C)} — array
            # sources iterate elements, object sources iterate
            # {key, value} wrappers; the filter uses JSLT truthiness
            # (render BOOL-typed conditions only); null VALUES drop;
            # duplicate keys: last wins in both engines
            src = gen(rng, rng.choice([ARR, OBJ]), d, in_loop)
            key = gen(rng, STR, d, True)
            val = gen(rng, ANY, d, True)
            cond = gen(rng, BOOL, d, True) if rng.random() < 0.5 \
                else None
            return N("objfor", OBJ, src, key, val, cond)
        if rng.random() < 0.4:
            # object template with a `*` matcher: explicit pairs
            # shadow matched keys (even when their value is null and
            # the pair itself drops), `- k1, k2` excludes more keys,
            # the matcher expr runs with the matched VALUE as context,
            # and matched nulls drop like explicit nulls
            ks = rng.sample(["a", "b"], rng.randint(0, 2))
            pool = [k for k in ["a", "b", "c"] if k not in ks]
            ms = rng.sample(pool, rng.randint(0, min(2, len(pool))))
            return N("objmatch", OBJ,
                     *[gen(rng, ANY, d, in_loop) for _ in ks],
                     gen(rng, ANY, d, True),
                     keys=ks, minus=ms)
        ks = rng.sample(["a", "b", "c"], rng.randint(1, 3))
        return N("obj", OBJ, *[gen(rng, ANY, d, in_loop) for _ in ks],
                 keys=ks)
    # ANY
    k = rng.random()
    if k < 0.08:
        # pipe: left value becomes the right side's context
        return N("pipe", ANY, gen(rng, ANY, d, in_loop),
                 gen(rng, ANY, d, True))
    if k < 0.35:
        return any_leaf()
    if k < 0.45:
        return N("if", ANY, gen(rng, BOOL, d, in_loop),
                 gen(rng, ANY, d, in_loop),
                 gen(rng, ANY, d, in_loop) if rng.random() < 0.7
                 else None)
    if k < 0.55:
        return N("index", ANY, gen(rng, ARR, d, in_loop),
                 i=rng.choice([0, 1, -1]))
    if k < 0.65:
        return N("let", ANY, gen(rng, ANY, d, in_loop),
                 N("var", ANY))
    return gen(rng, rng.choice([NUM, STR, BOOL, ARR, OBJ]), d, in_loop)


TRUTHY_JQ = ('(({X}) as $__t | if $__t == null or $__t == false or '
             '$__t == "" or $__t == [] or $__t == {{}} or $__t == 0 '
             'then false else true end)')


def to_jslt(n, ctx="."):
    if n.kind == "lit":
        return json.dumps(n.meta["v"])
    if n.kind == "path":
        return n.meta["path"] if ctx == "." else ctx + n.meta["path"]
    if n.kind == "ctx":
        return ctx
    if n.kind == "var":
        return "$v"
    if n.kind == "arith":
        a, b = (to_jslt(x, ctx) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "concat":
        a, b = (to_jslt(x, ctx) for x in n.kids)
        return f"({a} + {b})"
    if n.kind == "case":
        f = "uppercase" if n.meta["up"] else "lowercase"
        return f"{f}({to_jslt(n.kids[0], ctx)})"
    if n.kind == "tostr":
        return f"string({to_jslt(n.kids[0], ctx)})"
    if n.kind == "size":
        return f"size({to_jslt(n.kids[0], ctx)})"
    if n.kind == "cmp":
        a, b = (to_jslt(x, ctx) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "boolop":
        a, b = (to_jslt(x, ctx) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "not":
        return f"not({to_jslt(n.kids[0], ctx)})"
    if n.kind == "boolean":
        return f"boolean({to_jslt(n.kids[0], ctx)})"
    if n.kind == "arr":
        return "[" + ", ".join(to_jslt(x, ctx) for x in n.kids) + "]"
    if n.kind == "obj":
        pairs = ", ".join(
            f'"{k}": {to_jslt(x, ctx)}'
            for k, x in zip(n.meta["keys"], n.kids))
        return "{" + pairs + "}"
    if n.kind == "objfor":
        src, key, val, cond = n.kids
        body = (f"{{for ({to_jslt(src, ctx)}) "
                f"{to_jslt(key)} : {to_jslt(val)}")
        if cond is not None:
            body += f" if ({to_jslt(cond)})"
        return body + "}"
    if n.kind == "objmatch":
        parts = [f'"{k}": {to_jslt(x, ctx)}'
                 for k, x in zip(n.meta["keys"], n.kids[:-1])]
        star = "*"
        if n.meta["minus"]:
            star += " - " + ", ".join(n.meta["minus"])
        # matcher context is the matched VALUE -> render `.`-relative
        parts.append(f"{star} : {to_jslt(n.kids[-1])}")
        return "{" + ", ".join(parts) + "}"
    if n.kind == "for":
        # the loop body's context is the element, i.e. "."
        return f"[for ({to_jslt(n.kids[0], ctx)}) {to_jslt(n.kids[1])}]"
    if n.kind == "if":
        c = to_jslt(n.kids[0], ctx)
        a = to_jslt(n.kids[1], ctx)
        if n.kids[2] is None:
            return f"(if ({c}) {a})"
        return f"(if ({c}) {a} else {to_jslt(n.kids[2], ctx)})"
    if n.kind == "index":
        return f"({to_jslt(n.kids[0], ctx)})[{n.meta['i']}]"
    if n.kind == "pipe":
        return (f"({to_jslt(n.kids[0], ctx)} | "
                f"{to_jslt(n.kids[1])})")
    if n.kind == "ispred":
        return f"{n.meta['fn']}({to_jslt(n.kids[0], ctx)})"
    if n.kind == "strpred":
        return (f"{n.meta['fn']}({to_jslt(n.kids[0], ctx)}, "
                f"{to_jslt(n.kids[1], ctx)})")
    if n.kind == "contains":
        return (f"contains({to_jslt(n.kids[0], ctx)}, "
                f"{to_jslt(n.kids[1], ctx)})")
    if n.kind == "minmax":
        return (f"{n.meta['fn']}({to_jslt(n.kids[0], ctx)}, "
                f"{to_jslt(n.kids[1], ctx)})")
    if n.kind == "joinarr":
        # join stringifies scalar elements; restrict via tostring map
        return (f'join([for ({to_jslt(n.kids[0], ctx)}) string(.)], '
                f'"-")')
    if n.kind == "let":
        # JSLT let is a program-level binding; inline via a def instead
        # so it nests: def only sees $params, so use a 1-arg function
        return (f"(if (true) {to_jslt(n.kids[0], ctx)})"
                if False else _jslt_let(n, ctx))
    raise AssertionError(n.kind)


def _jslt_let(n, ctx):
    # nested lets aren't expressions in JSLT; emit the bound value and
    # reference it through get-key on a wrapper object instead, which IS
    # an expression:  get-key({"v": E}, "v")
    return f'get-key({{"v": {to_jslt(n.kids[0], ctx)}}}, "v")'


def to_jq(n):
    if n.kind == "lit":
        return json.dumps(n.meta["v"])
    if n.kind == "path":
        # NOT first((X?, null)): jq 1.6's `try` swallows `break`, so
        # first() over an error-suppressed stream emits twice (fixed in
        # 1.7); the collect form is version-proof
        return (f"([(({n.meta['path']}))?] | "
                "if length == 0 then null else .[0] end)")
    if n.kind == "ctx":
        return "."
    if n.kind == "var":
        return "$v"
    if n.kind == "arith":
        a, b = (to_jq(x) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "concat":
        a, b = (to_jq(x) for x in n.kids)
        return f"({a} + {b})"
    if n.kind == "case":
        f = "ascii_upcase" if n.meta["up"] else "ascii_downcase"
        return f"(({to_jq(n.kids[0])}) | {f})"
    if n.kind == "tostr":
        return f"(({to_jq(n.kids[0])}) | tostring)"
    if n.kind == "size":
        return (f"(({to_jq(n.kids[0])}) as $__s | "
                "if $__s == null then null else ($__s | length) end)")
    if n.kind == "cmp":
        a, b = (to_jq(x) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "boolop":
        a, b = (to_jq(x) for x in n.kids)
        return f"({a} {n.meta['op']} {b})"
    if n.kind == "not":
        return "(" + TRUTHY_JQ.format(X=to_jq(n.kids[0])) + " | not)"
    if n.kind == "boolean":
        return TRUTHY_JQ.format(X=to_jq(n.kids[0]))
    if n.kind == "arr":
        return "[" + ", ".join(to_jq(x) for x in n.kids) + "]"
    if n.kind == "obj":
        pairs = ", ".join(
            f'"{k}": ({to_jq(x)})'
            for k, x in zip(n.meta["keys"], n.kids))
        return ("({" + pairs + "} | "
                "with_entries(select(.value != null)))")
    if n.kind == "objfor":
        src, key, val, cond = n.kids
        sel = f"select({to_jq(cond)}) | " if cond is not None else ""
        return (
            f"(({to_jq(src)}) as $__s | "
            '(if ($__s | type) == "object" then ($__s | to_entries) '
            "else $__s end) | "
            f"[ .[] | {sel}{{key: ({to_jq(key)}), "
            f"value: ({to_jq(val)})}} ] | "
            # null-valued PAIRS are omitted BEFORE insertion (JSLT
            # spec), so a later null duplicate cannot erase an earlier
            # value — filtering after from_entries would
            "map(select(.value != null)) | from_entries)")
    if n.kind == "objmatch":
        pairs = ", ".join(
            f'"{k}": ({to_jq(x)})'
            for k, x in zip(n.meta["keys"], n.kids[:-1]))
        explicit = ("({" + pairs + "} | "
                    "with_entries(select(.value != null)))")
        excluded = list(n.meta["keys"]) + list(n.meta["minus"])
        keep = " and ".join(f'.key != "{k}"' for k in excluded) or "true"
        matched = (
            '(if (. | type) == "object" then '
            f"(with_entries(select({keep})) "
            f"| map_values({to_jq(n.kids[-1])}) "
            "| with_entries(select(.value != null))) "
            "else {} end)")
        # matched keys are disjoint from explicit keys by construction,
        # so jq's right-biased `+` cannot overwrite an explicit pair
        return f"({explicit} + {matched})"
    if n.kind == "for":
        return f"(({to_jq(n.kids[0])}) | map({to_jq(n.kids[1])}))"
    if n.kind == "if":
        c = to_jq(n.kids[0])
        a = to_jq(n.kids[1])
        b = "null" if n.kids[2] is None else to_jq(n.kids[2])
        return f"(if {c} then {a} else {b} end)"
    if n.kind == "index":
        return (f"([(({to_jq(n.kids[0])})[{n.meta['i']}])?] | "
                "if length == 0 then null else .[0] end)")
    if n.kind == "pipe":
        return f"(({to_jq(n.kids[0])}) | ({to_jq(n.kids[1])}))"
    if n.kind == "ispred":
        t = {"is-string": "string", "is-array": "array",
             "is-object": "object", "is-number": "number",
             "is-boolean": "boolean"}[n.meta["fn"]]
        return f'((({to_jq(n.kids[0])}) | type) == "{t}")'
    if n.kind == "strpred":
        f = {"starts-with": "startswith",
             "ends-with": "endswith"}[n.meta["fn"]]
        # JSLT: false on null input; jq: error on non-strings
        return (f"(({to_jq(n.kids[0])}) as $s | "
                f"(({to_jq(n.kids[1])})) as $p | "
                f"if $s == null then false else ($s | {f}($p)) end)")
    if n.kind == "contains":
        # JSLT contains(el, seq): membership with type-strict equality
        return (f"(({to_jq(n.kids[0])}) as $e | "
                f"(({to_jq(n.kids[1])})) as $a | "
                "([$a[] | select(. == $e)] | length) > 0)")
    if n.kind == "minmax":
        f = {"min": "<", "max": ">"}[n.meta["fn"]]
        return (f"(({to_jq(n.kids[0])}) as $x | "
                f"(({to_jq(n.kids[1])})) as $y | "
                f"if $x == null or $y == null then null "
                f"elif $x {f} $y then $x else $y end)")
    if n.kind == "joinarr":
        return (f"(({to_jq(n.kids[0])}) | "
                'map(tostring) | join("-"))')
    if n.kind == "let":
        return f"(({to_jq(n.kids[0])}) as $v | {to_jq(n.kids[1])})"
    raise AssertionError(n.kind)


def gen_int(rng, d):
    """Integer-only arithmetic subtree (no 2.5 literals, no division)."""
    if d >= 3 or rng.random() < 0.5:
        return N("lit", NUM, v=rng.choice([0, 1, 7, -3]))
    return N("arith", NUM, gen_int(rng, d + 1), gen_int(rng, d + 1),
             op=rng.choice(["+", "-", "*"]))


def gen_value(rng, depth=0):
    if depth >= 2:
        return rng.choice([None, True, False, 0, 1, -2, 1.5, "x", ""])
    r = rng.random()
    if r < 0.3:
        return rng.choice([None, True, False, 0, 1, 7, -3, 2.5, "s",
                           "hello world", ""])
    if r < 0.65:
        return [gen_value(rng, depth + 1)
                for _ in range(rng.randint(0, 4))]
    return {k: gen_value(rng, depth + 1)
            for k in rng.sample(["a", "b", "c"], rng.randint(0, 3))}


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return None
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


def run_jslt(prog, value):
    try:
        return ("ok", compile_jslt(prog)(json.loads(json.dumps(value))))
    except JsltError as e:
        return ("error", str(e)[:80])
    except RecursionError:
        return ("error", "recursion")
    except Exception as e:  # noqa: BLE001 — a crash IS a finding
        return ("crash", f"{type(e).__name__}: {e}"[:120])


def run_jq_ours(prog, value):
    try:
        out = compile_jq(prog)(json.loads(json.dumps(value)))
        if len(out) != 1:
            return ("error", f"stream of {len(out)}")
        return ("ok", out[0])
    except JqError as e:
        return ("error", str(e)[:80])
    except RecursionError:
        return ("error", "recursion")
    except Exception as e:  # noqa: BLE001
        return ("crash", f"{type(e).__name__}: {e}"[:120])


def run_jq_bin(prog, value):
    p = subprocess.run(
        ["jq", "-c", prog], input=json.dumps(value),
        capture_output=True, text=True, timeout=10)
    if p.returncode != 0:
        return ("error", p.stderr.strip()[:80])
    out = [json.loads(ln) for ln in p.stdout.splitlines() if ln.strip()]
    if len(out) != 1:
        return ("error", f"stream of {len(out)}")
    return ("ok", out[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rng = random.Random(seed)
    have_bin = shutil.which("jq") is not None
    diverged = checked = 0
    for _ in range(n):
        node = gen(rng)
        value = gen_value(rng)
        jslt_prog = to_jslt(node)
        jq_prog = to_jq(node)
        ours = run_jslt(jslt_prog, value)
        ref = run_jq_ours(jq_prog, value)
        refs = [("jq_ours", ref)]
        if have_bin:
            refs.append(("jq_bin", run_jq_bin(jq_prog, value)))
        if ours[0] == "crash":
            diverged += 1
            print(f"CRASH  jslt={jslt_prog!r}\n       "
                  f"input={json.dumps(value)} -> {ours[1]}")
            continue
        # the two jq evaluations must agree with each other (else the
        # renderer hit a jq corner, not a JSLT bug — still report)
        if have_bin and (
                refs[0][1][0] != refs[1][1][0]
                or (refs[0][1][0] == "ok"
                    and norm(refs[0][1][1]) != norm(refs[1][1][1]))):
            diverged += 1
            print(f"JQREF  jq={jq_prog!r}\n       "
                  f"input={json.dumps(value)}\n       "
                  f"ours={refs[0][1]}\n       bin ={refs[1][1]}")
            continue
        if ours[0] == "error" and ref[0] == "error":
            checked += 1
            continue
        if ours[0] != ref[0] or norm(ours[1]) != norm(ref[1]):
            diverged += 1
            print(f"VALUE  jslt={jslt_prog!r}\n       "
                  f"jq  ={jq_prog!r}\n       "
                  f"input={json.dumps(value)}\n       "
                  f"jslt-> {ours}\n       jq  -> {ref}")
            continue
        checked += 1
    print(f"\n{checked}/{n} agree, {diverged} divergences"
          f" (binary cross-check: {'on' if have_bin else 'off'})")
    sys.exit(1 if diverged else 0)


if __name__ == "__main__":
    main()
