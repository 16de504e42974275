"""Row-level (Python-dict) interpreter for Mongo pipelines/expressions.

Used where per-row imperative semantics are required and the input is a
single JSON document rather than a DataFrame: aggregate *pipeline reducers*
(docs/state.md — the reducer pipeline runs over one `{command, state}`
document per command) and the $redact fallback.  Everything DataFrame-wide
still goes through the Column compiler (operators/expressions.py); this
interpreter is deliberately scoped to the per-document fold inside
``applyInPandas``/``transformWithStateInPandas`` where Catalyst cannot see
anyway.

Covers the operator subset that reducer pipelines in the reference's test
corpus use ($addFields/$set/$unset/$project/$replaceRoot/$match + scalar
expressions); unknown operators raise so gaps surface in tests.
"""

from __future__ import annotations

from typing import Any, Callable

__all__ = ["eval_expr", "run_pipeline_doc", "pipeline_reducer"]

_MISSING = object()


def _get_path(doc: Any, path: str) -> Any:
    cur = doc
    for seg in path.split("."):
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return None
    return cur


def _set_path(doc: dict, path: str, value: Any) -> None:
    parts = path.split(".")
    cur = doc
    for seg in parts[:-1]:
        cur = cur.setdefault(seg, {})
    cur[parts[-1]] = value


def _del_path(doc: dict, path: str) -> None:
    parts = path.split(".")
    cur = doc
    for seg in parts[:-1]:
        cur = cur.get(seg)
        if not isinstance(cur, dict):
            return
    cur.pop(parts[-1], None)


def eval_expr(expr: Any, doc: dict, variables: dict | None = None) -> Any:
    v = variables or {}
    if isinstance(expr, str):
        if expr.startswith("$$"):
            name, _, rest = expr[2:].partition(".")
            if name == "ROOT":
                base = doc
            else:
                base = v.get(name)
            return _get_path(base, rest) if rest else base
        if expr.startswith("$"):
            return _get_path(doc, expr[1:])
        return expr
    if isinstance(expr, (int, float, bool)) or expr is None:
        return expr
    if isinstance(expr, list):
        return [eval_expr(e, doc, v) for e in expr]
    if isinstance(expr, dict):
        if len(expr) == 1:
            (op, args), = expr.items()
            if op.startswith("$"):
                return _eval_op(op, args, doc, v)
        return {k: eval_expr(x, doc, v) for k, x in expr.items()}
    raise ValueError(f"cannot evaluate {expr!r}")


def _nums(args, doc, v):
    return [eval_expr(a, doc, v) for a in
            (args if isinstance(args, list) else [args])]


def _eval_op(op: str, args: Any, doc: dict, v: dict) -> Any:
    import math

    def ev(e):
        return eval_expr(e, doc, v)

    if op == "$add":
        vals = _nums(args, doc, v)
        return None if any(x is None for x in vals) else sum(vals)
    if op == "$subtract":
        a, b = _nums(args, doc, v)
        return None if a is None or b is None else a - b
    if op == "$multiply":
        vals = _nums(args, doc, v)
        if any(x is None for x in vals):
            return None
        out = 1
        for x in vals:
            out *= x
        return out
    if op == "$divide":
        a, b = _nums(args, doc, v)
        return None if a is None or b is None else a / b
    if op == "$mod":
        a, b = _nums(args, doc, v)
        return None if a is None or b is None else a % b
    if op == "$abs":
        (a,) = _nums(args, doc, v)
        return None if a is None else abs(a)
    if op in ("$floor", "$ceil", "$sqrt", "$exp", "$ln", "$log10", "$trunc"):
        (a,) = _nums(args, doc, v)
        if a is None:
            return None
        return {
            "$floor": math.floor, "$ceil": math.ceil, "$sqrt": math.sqrt,
            "$exp": math.exp, "$ln": math.log, "$log10": math.log10,
            "$trunc": math.trunc,
        }[op](a)
    if op == "$pow":
        a, b = _nums(args, doc, v)
        return a ** b
    if op == "$concat":
        vals = _nums(args, doc, v)
        return None if any(x is None for x in vals) else "".join(vals)
    if op == "$toUpper":
        (a,) = _nums(args, doc, v)
        return None if a is None else str(a).upper()
    if op == "$toLower":
        (a,) = _nums(args, doc, v)
        return None if a is None else str(a).lower()
    if op == "$toString":
        (a,) = _nums(args, doc, v)
        return None if a is None else str(a)
    if op in ("$toInt", "$toLong"):
        (a,) = _nums(args, doc, v)
        return None if a is None else int(a)
    if op == "$toDouble":
        (a,) = _nums(args, doc, v)
        return None if a is None else float(a)
    if op == "$eq":
        a, b = _nums(args, doc, v)
        return a == b
    if op == "$ne":
        a, b = _nums(args, doc, v)
        return a != b
    if op in ("$gt", "$gte", "$lt", "$lte"):
        a, b = _nums(args, doc, v)
        if a is None or b is None:
            return False
        return {"$gt": a > b, "$gte": a >= b, "$lt": a < b,
                "$lte": a <= b}[op]
    if op == "$cmp":
        a, b = _nums(args, doc, v)
        return -1 if a < b else (1 if a > b else 0)
    if op == "$and":
        return all(bool(ev(a)) for a in args)
    if op == "$or":
        return any(bool(ev(a)) for a in args)
    if op == "$not":
        a = args[0] if isinstance(args, list) else args
        return not bool(ev(a))
    if op == "$cond":
        if isinstance(args, dict):
            return ev(args["then"]) if ev(args["if"]) else ev(args["else"])
        i, t, e = args
        return ev(t) if ev(i) else ev(e)
    if op == "$ifNull":
        for a in args:
            val = ev(a)
            if val is not None:
                return val
        return None
    if op == "$switch":
        for br in args["branches"]:
            if ev(br["case"]):
                return ev(br["then"])
        return ev(args["default"]) if "default" in args else None
    if op == "$literal":
        return args
    if op == "$let":
        new_vars = dict(v)
        new_vars.update(
            {k: eval_expr(x, doc, v) for k, x in args["vars"].items()}
        )
        return eval_expr(args["in"], doc, new_vars)
    if op == "$mergeObjects":
        out: dict = {}
        for a in (args if isinstance(args, list) else [args]):
            val = ev(a)
            if isinstance(val, dict):
                out.update(val)
        return out
    if op == "$size":
        (a,) = _nums(args, doc, v)
        return len(a) if a is not None else None
    if op == "$concatArrays":
        out = []
        for a in args:
            val = ev(a)
            if val is None:
                return None
            out.extend(val)
        return out
    if op == "$in":
        a, b = _nums(args, doc, v)
        return a in (b or [])
    if op == "$filter":
        arr = ev(args["input"]) or []
        var = args.get("as", "this")
        return [e for e in arr
                if eval_expr(args["cond"], doc, {**v, var: e, "this": e})]
    if op == "$map":
        arr = ev(args["input"]) or []
        var = args.get("as", "this")
        return [eval_expr(args["in"], doc, {**v, var: e, "this": e})
                for e in arr]
    if op == "$reduce":
        arr = ev(args["input"]) or []
        acc = ev(args["initialValue"])
        for e in arr:
            acc = eval_expr(args["in"], doc, {**v, "value": acc, "this": e})
        return acc
    raise ValueError(f"row interpreter: unsupported operator {op}")


def _match_doc(query: dict, doc: dict, v: dict | None = None) -> bool:
    v = v or {}
    for key, value in query.items():
        if key == "$and":
            if not all(_match_doc(q, doc, v) for q in value):
                return False
        elif key == "$or":
            if not any(_match_doc(q, doc, v) for q in value):
                return False
        elif key == "$nor":
            if any(_match_doc(q, doc, v) for q in value):
                return False
        elif key == "$expr":
            if not bool(eval_expr(value, doc, v)):
                return False
        elif isinstance(value, dict) and any(
            k.startswith("$") for k in value
        ):
            cur = _get_path(doc, key)
            present = _has_path(doc, key)
            for o, arg in value.items():
                ok = {
                    "$eq": lambda: cur == arg,
                    "$ne": lambda: cur != arg,
                    "$gt": lambda: present and cur is not None and cur > arg,
                    "$gte": lambda: present and cur is not None and cur >= arg,
                    "$lt": lambda: present and cur is not None and cur < arg,
                    "$lte": lambda: present and cur is not None and cur <= arg,
                    "$in": lambda: cur in arg,
                    "$nin": lambda: cur not in arg,
                    "$exists": lambda: present == bool(arg),
                    "$expr": lambda: bool(eval_expr(arg, doc, v)),
                }.get(o)
                if ok is None:
                    raise ValueError(f"row matcher: unsupported {o}")
                if not ok():
                    return False
        else:
            if _get_path(doc, key) != value:
                return False
    return True


def _has_path(doc: Any, path: str) -> bool:
    cur = doc
    for seg in path.split("."):
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return False
    return True


def run_pipeline_doc(
    stages: list[dict], doc: dict,
    script_imports: dict[str, str] | None = None,
) -> dict | None:
    """Run a pipeline over ONE document (reducer semantics).  $match that
    fails -> None (command rejected / no-op).  ``script_imports``
    resolves imports inside $jq/$jslt stages (build-time inlined files,
    Common.java:803-846)."""
    cur: dict | None = dict(doc)
    for stage in stages:
        if cur is None:
            return None
        (name, spec), = stage.items()
        if name == "$match":
            if not _match_doc(spec, cur):
                return None
        elif name in ("$addFields", "$set"):
            for k, val in spec.items():
                _set_path(cur, k, eval_expr(val, cur))
        elif name == "$unset":
            for k in (spec if isinstance(spec, list) else [spec]):
                _del_path(cur, k)
        elif name == "$project":
            incl = {k: s for k, s in spec.items() if s not in (0, False)}
            if incl:
                out: dict = {}
                if "_id" in cur and "_id" not in spec:
                    out["_id"] = cur["_id"]
                for k, s in incl.items():
                    out[k] = _get_path(cur, k) if s in (1, True) \
                        else eval_expr(s, cur)
                cur = out
            else:
                for k in spec:
                    _del_path(cur, k)
        elif name in ("$replaceRoot", "$replaceWith"):
            expr = spec.get("newRoot", spec) if isinstance(spec, dict) \
                else spec
            cur = eval_expr(expr, cur)
        elif name in ("$jq", "$jslt"):
            # script stages inside reducer pipelines (app39's form:
            # `reducer: [{$jq: file}]` — the build inlines the file)
            cur = _doc_script(name[1:], spec, script_imports)(cur)
        else:
            raise ValueError(f"reducer pipeline: unsupported stage {name}")
    return cur


_doc_script_cache: dict[tuple, Callable] = {}


def _doc_script(
    language: str, src: str,
    script_imports: dict[str, str] | None = None,
) -> Callable:
    key = (language, src,
           frozenset((script_imports or {}).items()))
    fn = _doc_script_cache.get(key)
    if fn is None:
        loader = (script_imports or {}).get

        if language == "jslt":
            from pincette_json_streams_spark.functions.jslt_subset import (
                compile_jslt,
            )
            fn = compile_jslt(src, loader=lambda p: loader(p) or "")
        else:
            from pincette_json_streams_spark.functions.jq_subset import (
                compile_jq,
            )
            jqf = compile_jq(src, loader=lambda p: loader(p) or "")
            fn = lambda v: (jqf(v) or [None])[0]  # noqa: E731
        _doc_script_cache[key] = fn
    return fn


def pipeline_reducer(
    commands: dict[str, list[dict]],
    script_imports: dict[str, str] | None = None,
) -> Callable[[dict, dict], dict | None]:
    """Reducer from per-command specs (docs/state.md:61-95).  Each command
    maps to either a Mongo pipeline over {command, state} (ending as the
    new state, conventionally via $replaceRoot) or a JQ script string —
    the reference's preferred reducer language (docs/index.md:11,
    App.java:793-812).  ``script_imports`` resolves jq `import`s the way
    the build step inlines them (Common.java:803-846)."""
    script_cache: dict[tuple, Callable] = {}
    # driver-side snapshot: script_for may first run inside the stateful
    # executor worker, where the plugin registry import is empty
    from pincette_json_streams_spark.plugins import JSLT_FUNCTION_EXTENSIONS
    _jslt_ext = dict(JSLT_FUNCTION_EXTENSIONS)

    def script_for(src: str, language: str) -> Callable:
        fn = script_cache.get((language, src))
        if fn is None:
            loader = (script_imports or {}).get
            if language == "jslt":
                from pincette_json_streams_spark.functions.jslt_subset \
                    import compile_jslt

                fn = compile_jslt(src, loader=lambda p: loader(p) or "",
                                  extensions=_jslt_ext)
            else:
                from pincette_json_streams_spark.functions.jq_subset \
                    import compile_jq

                jqf = compile_jq(src, loader=lambda p: loader(p) or "")
                fn = lambda v: (jqf(v) or [None])[0]  # noqa: E731
            script_cache[(language, src)] = fn
        return fn

    def reduce(state: dict, command: dict) -> dict | None:
        name = command.get("_command")
        spec = commands.get(name)
        if spec is None:
            return None
        language = "jq"
        stages = spec
        if isinstance(stages, dict):
            if "jslt" in stages:
                stages, language = stages["jslt"], "jslt"
            elif "jq" in stages:
                stages = stages["jq"]
            else:
                stages = stages.get("reducer", stages.get("pipeline", []))
        if isinstance(stages, dict):  # {"reducer": {"jslt"/"jq": ...}}
            if "jslt" in stages:
                stages, language = stages["jslt"], "jslt"
            elif "jq" in stages:
                stages = stages["jq"]
        if not stages or isinstance(stages, dict):
            # command declared without a reducer (e.g. `put: {}` with only
            # a validator) -> built-ins apply, not an identity pipeline
            # over the {command, state} envelope
            return None
        # deep-copy: pipeline stages mutate documents in place
        # ($replaceRoot returns the actual nested object); the caller's
        # state must stay pristine for the before/after event diff
        import copy

        doc = {"command": copy.deepcopy(command),
               "state": copy.deepcopy(state)}
        if isinstance(stages, str):  # a JQ (default) or JSLT script
            return script_for(stages, language)(doc)
        return run_pipeline_doc(stages, doc,
                                script_imports=script_imports)

    return reduce
