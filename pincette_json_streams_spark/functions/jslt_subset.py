"""A self-contained JSLT-subset interpreter.

JSLT is the reference's second script language for reducers and the
$jslt stage/operator (/root/reference/docs/aggregation_stages.md:245-277,
docs/aggregation_operators.md:1176; script compilation App.java:1212-1263)
— there is no maintained Python implementation, so this module implements
the subset the reference's corpus and docs exercise, from the public JSLT
language reference:

  - dot paths ``.a.b``, array indexing ``.a[0]``, slices ``.a[1:2]``
  - pipe ``expr | expr`` (left value becomes the context of the right)
  - object templates ``{"k": expr, * : .}`` — the ``*`` matcher copies the
    remaining keys of the context object; **pairs evaluating to null are
    omitted** (JSLT's way to delete keys: ``{"_command": null, *: .}``);
    matcher exclusions ``{* - a, b : .}``
  - array/object ``for`` comprehensions with ``if (...)`` filters,
    ``if (...) ... else ...``
  - ``let name = expr`` bindings and ``$name`` references
  - ``def name(p1, p2) expr`` with ``$p`` parameters; file ``import``s
    with namespace prefixes (``import "x.jslt" as ns`` then ``ns:f(...)``)
  - arithmetic/comparison/boolean operators, string ``+``
  - core built-ins (size, string, number(+fallback), boolean, not,
    fallback, round, floor, ceiling, contains, join, split, lowercase,
    uppercase, test, capture, replace, starts-with, ends-with, trim,
    is-* incl. is-integral/is-decimal, get-key, error, min, max
    (binary + array extension), sum, mod, flatten, all, any, zip,
    zip-with-index, index-of, array, from-json, to-json, sha256-hex,
    hash-int, now, parse-time, format-time, parse-url, random)
  - the platform's custom functions (docs/custom_jslt.md): base64-decode,
    base64-encode, get-pointer, pointer, set-pointer, substr, trace,
    uri-decode, uri-encode, uuid, parse-iso-instant
"""

from __future__ import annotations

import base64 as _b64
import json
import math
import re
import urllib.parse
import uuid as _uuid
from typing import Any, Callable

__all__ = ["compile_jslt", "JsltError"]


class JsltError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<num>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<op>==|!=|<=|>=|\||\.|\[|\]|\{|\}|\(|\)|,|:|\+|-|\*|/|<|>|=|\$)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_-]*)
""", re.VERBOSE)

_KEYWORDS = {"if", "else", "let", "def", "import", "as", "for", "and",
             "or", "true", "false", "null"}


def _lex(src: str) -> list[tuple[str, str, int]]:
    """-> (kind, text, start_pos); positions let the parser require
    adjacency for `.field` chaining (so `let n = .a` on one line doesn't
    swallow a `.b` body on the next)."""
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise JsltError(f"jslt: bad character at {src[pos:pos+20]!r}")
        start = pos
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "ident" and text in _KEYWORDS:
            out.append(("kw", text, start))
        else:
            out.append((m.lastgroup, text, start))
    out.append(("eof", "", pos))
    return out


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, ahead=0):
        t = self.toks[min(self.i + ahead, len(self.toks) - 1)]
        return (t[0], t[1])

    def _tok3(self, ahead=0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def _adjacent(self):
        """True when the next token starts exactly where the previous one
        ended (no whitespace) — required for `.field` chaining."""
        if self.i == 0:
            return True
        prev = self.toks[self.i - 1]
        return self._tok3()[2] == prev[2] + len(prev[1])

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return (t[0], t[1])

    def accept(self, kind, text=None):
        k, v = self.peek()
        if k == kind and (text is None or v == text):
            self.i += 1
            return v
        return None

    def expect(self, kind, text=None):
        got = self.accept(kind, text)
        if got is None:
            raise JsltError(f"jslt: expected {text or kind}, "
                            f"got {self.peek()!r}")
        return got

    def program(self):
        imports, defs, lets = [], [], []
        while True:
            if self.peek() == ("kw", "import"):
                self.next()
                path = json.loads(self.expect("str"))
                self.expect("kw", "as")
                ns = self.expect("ident")
                imports.append((path, ns))
            elif self.peek() == ("kw", "def"):
                defs.append(self._def())
            elif self.peek() == ("kw", "let"):
                lets.append(self._let())
            else:
                break
        body = self.expr()
        self.expect("eof")
        return imports, defs, lets, body

    def _def(self):
        self.expect("kw", "def")
        name = self.expect("ident")
        self.expect("op", "(")
        params = []
        if self.peek() != ("op", ")"):
            while True:
                params.append(self.expect("ident"))
                if not self.accept("op", ","):
                    break
        self.expect("op", ")")
        body = self.expr()
        return (name, params, body)

    def _let(self):
        self.expect("kw", "let")
        name = self.expect("ident")
        self.expect("op", "=")
        return (name, self.expr())

    def expr(self):
        left = self.or_()
        if self.accept("op", "|"):
            return ("pipe", left, self.expr())
        return left

    def or_(self):
        left = self.and_()
        while self.peek() == ("kw", "or"):
            self.next()
            left = ("or", left, self.and_())
        return left

    def and_(self):
        left = self.cmp()
        while self.peek() == ("kw", "and"):
            self.next()
            left = ("and", left, self.cmp())
        return left

    def cmp(self):
        left = self.add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return ("cmp", v, left, self.add())
        return left

    def add(self):
        left = self.mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                left = ("arith", v, left, self.mul())
            else:
                return left

    def mul(self):
        left = self.unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/"):
                self.next()
                left = ("arith", v, left, self.unary())
            else:
                return left

    def unary(self):
        if self.accept("op", "-"):
            return ("neg", self.postfix())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            k, v = self.peek()
            if k == "op" and v == "." and self._adjacent():
                nxt = self.peek(1)
                if nxt[0] in ("ident", "str"):
                    self.next()
                    kk, kv = self.next()
                    key = json.loads(kv) if kk == "str" else kv
                    node = ("get", node, ("lit", key))
                    continue
                break
            if k == "op" and v == "[" and self._adjacent():
                self.next()
                if self.accept("op", ":"):
                    hi = None if self.peek() == ("op", "]") else self.expr()
                    self.expect("op", "]")
                    node = ("slice", node, None, hi)
                else:
                    idx = self.expr()
                    if self.accept("op", ":"):
                        hi = None if self.peek() == ("op", "]") \
                            else self.expr()
                        self.expect("op", "]")
                        node = ("slice", node, idx, hi)
                    else:
                        self.expect("op", "]")
                        node = ("get", node, idx)
                continue
            return node
        return node

    def primary(self):
        k, v = self.peek()
        if k == "op" and v == ".":
            self.next()
            k2, v2 = self.peek()
            if k2 == "ident":
                self.next()
                return ("get", ("ctx",), ("lit", v2))
            if k2 == "str":
                self.next()
                return ("get", ("ctx",), ("lit", json.loads(v2)))
            return ("ctx",)
        if k == "num":
            self.next()
            f = float(v)
            return ("lit", int(f) if f.is_integer() and "." not in v
                    and "e" not in v.lower() else f)
        if k == "str":
            self.next()
            return ("lit", json.loads(v))
        if k == "kw" and v in ("true", "false", "null"):
            self.next()
            return ("lit", {"true": True, "false": False,
                            "null": None}[v])
        if k == "kw" and v == "if":
            self.next()
            self.expect("op", "(")
            cond = self.expr()
            self.expect("op", ")")
            then = self.expr()
            alt = ("lit", None)
            if self.peek() == ("kw", "else"):
                self.next()
                alt = self.expr()
            return ("if", cond, then, alt)
        if k == "kw" and v == "let":
            # let inside an expression body: let x = e  <expr>
            name, value = self._let()
            body = self.expr()
            return ("let", name, value, body)
        if k == "op" and v == "$":
            self.next()
            return ("var", self.expect("ident"))
        if k == "op" and v == "(":
            self.next()
            node = self.expr()
            self.expect("op", ")")
            return node
        if k == "op" and v == "[":
            return self._array()
        if k == "op" and v == "{":
            return self._object()
        if k == "ident":
            self.next()
            name = v
            if self.accept("op", ":"):
                name = f"{v}:{self.expect('ident')}"
            self.expect("op", "(")
            args = []
            if self.peek() != ("op", ")"):
                while True:
                    args.append(self.expr())
                    if not self.accept("op", ","):
                        break
            self.expect("op", ")")
            return ("call", name, args)
        raise JsltError(f"jslt: unexpected token {self.peek()!r}")

    def _array(self):
        self.expect("op", "[")
        if self.peek() == ("kw", "for"):
            self.next()
            self.expect("op", "(")
            src = self.expr()
            self.expect("op", ")")
            body = self.expr()
            cond = None
            if self.peek() == ("kw", "if"):
                self.next()
                self.expect("op", "(")
                cond = self.expr()
                self.expect("op", ")")
            self.expect("op", "]")
            return ("for_array", src, body, cond)
        items = []
        if self.peek() != ("op", "]"):
            while True:
                items.append(self.expr())
                if not self.accept("op", ","):
                    break
        self.expect("op", "]")
        return ("array", items)

    def _object(self):
        self.expect("op", "{")
        if self.peek() == ("kw", "for"):
            self.next()
            self.expect("op", "(")
            src = self.expr()
            self.expect("op", ")")
            kexpr = self.expr()
            self.expect("op", ":")
            vexpr = self.expr()
            cond = None
            if self.peek() == ("kw", "if"):
                self.next()
                self.expect("op", "(")
                cond = self.expr()
                self.expect("op", ")")
            self.expect("op", "}")
            return ("for_object", src, kexpr, vexpr, cond)
        pairs = []
        matcher = None
        matcher_minus: list[str] = []
        lets = []
        while self.peek() != ("op", "}"):
            if self.peek() == ("kw", "let"):
                lets.append(self._let())
                self.accept("op", ",")
                continue
            if self.accept("op", "*"):
                # `* - k1, k2 : expr` — matcher with key exclusions
                if self.accept("op", "-"):
                    while True:
                        k, v = self.next()
                        if k == "str":
                            matcher_minus.append(json.loads(v))
                        elif k in ("ident", "kw"):
                            matcher_minus.append(v)
                        else:
                            raise JsltError(
                                f"jslt: bad matcher exclusion {(k, v)!r}")
                        if not self.accept("op", ","):
                            break
                self.expect("op", ":")
                matcher = self.expr()
            else:
                k, v = self.next()
                if k == "str":
                    key = ("lit", json.loads(v))
                elif k == "ident" or k == "kw":
                    key = ("lit", v)
                else:
                    raise JsltError(f"jslt: bad object key {(k, v)!r}")
                self.expect("op", ":")
                pairs.append((key, self.expr()))
            if not self.accept("op", ","):
                break
        self.expect("op", "}")
        return ("object", lets, pairs, matcher, matcher_minus)


# --------------------------------------------------------------------------
# evaluator
# --------------------------------------------------------------------------

def _jslt_eq(a, b):
    """JSLT value equality: booleans are their own type (true != 1 —
    Python's bool/int equality must not leak, jslt-differential-fuzz
    finding), numbers compare numerically across int/float, containers
    deep-compare."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _jslt_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            _jslt_eq(v, b[k]) for k, v in a.items())
    return a == b


def _truthy(v):
    # JSLT boolean(): false is null, false, 0/0.0, "", [], {}
    if v is None or v is False:
        return False
    if isinstance(v, (int, float)) and v == 0:
        return False
    if v == [] or v == {} or v == "":
        return False
    return True


def _eval(node, ctx, env):
    tag = node[0]
    if tag == "ctx":
        return ctx
    if tag == "lit":
        return node[1]
    if tag == "pipe":
        return _eval(node[2], _eval(node[1], ctx, env), env)
    if tag == "get":
        base = _eval(node[1], ctx, env)
        key = _eval(node[2], ctx, env)
        if base is None:
            return None
        if isinstance(base, dict):
            return base.get(key)
        if isinstance(base, list) and isinstance(key, int):
            n = len(base)
            i = key if key >= 0 else n + key
            return base[i] if 0 <= i < n else None
        return None
    if tag == "slice":
        base = _eval(node[1], ctx, env)
        lo = _eval(node[2], ctx, env) if node[2] else None
        hi = _eval(node[3], ctx, env) if node[3] else None
        if base is None:
            return None
        if not isinstance(base, (list, str)):
            # navigation-null philosophy, like .key on a non-object
            return None
        for b in (lo, hi):
            if b is not None and (isinstance(b, bool)
                                  or not isinstance(b, int)):
                raise JsltError("jslt: slice bounds must be integers")
        return base[lo:hi]
    if tag == "neg":
        v = _eval(node[1], ctx, env)
        if v is None:
            return None
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JsltError(
                f"jslt: cannot negate {type(v).__name__}")
        return -v
    if tag == "arith":
        op, a, b = node[1], _eval(node[2], ctx, env), \
            _eval(node[3], ctx, env)
        if op == "+":
            if a is None:
                return b
            if b is None:
                return a
            if isinstance(a, dict) and isinstance(b, dict):
                out = dict(b)
                out.update(a)  # JSLT: left side wins on +
                return out
            if isinstance(a, list) and isinstance(b, list):
                return a + b
            if isinstance(a, str) or isinstance(b, str):
                sa = a if isinstance(a, str) else _to_string(a)
                sb = b if isinstance(b, str) else _to_string(b)
                return sa + sb
            for x in (a, b):
                if isinstance(x, bool) or not isinstance(x, (int, float)):
                    raise JsltError(
                        f"jslt: + cannot combine {type(a).__name__}"
                        f" and {type(b).__name__}")
            return a + b
        if a is None or b is None:
            return None
        # JSLT: - * / are number-only; without this guard Python
        # semantics leak through (5 * "x" -> "xxxxx", true - 1 -> 0)
        for x in (a, b):
            if isinstance(x, bool) or not isinstance(x, (int, float)):
                raise JsltError(
                    f"jslt: {op} requires numbers, got "
                    f"{type(a).__name__} {op} {type(b).__name__}")
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if b == 0:
                raise JsltError("jslt: division by zero")
            r = a / b
            return int(r) if isinstance(a, int) and isinstance(b, int) \
                and a % b == 0 else r
        raise JsltError(f"jslt: bad op {op}")
    if tag == "cmp":
        op, a, b = node[1], _eval(node[2], ctx, env), \
            _eval(node[3], ctx, env)
        if op == "==":
            return _jslt_eq(a, b)
        if op == "!=":
            return not _jslt_eq(a, b)
        if a is None or b is None:
            return False
        num_a = not isinstance(a, bool) and isinstance(a, (int, float))
        num_b = not isinstance(b, bool) and isinstance(b, (int, float))
        if not ((num_a and num_b) or (isinstance(a, str)
                                      and isinstance(b, str))):
            raise JsltError(
                f"jslt: cannot compare {type(a).__name__} {op} "
                f"{type(b).__name__}")
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
    if tag == "and":
        return _truthy(_eval(node[1], ctx, env)) and \
            _truthy(_eval(node[2], ctx, env))
    if tag == "or":
        return _truthy(_eval(node[1], ctx, env)) or \
            _truthy(_eval(node[2], ctx, env))
    if tag == "if":
        if _truthy(_eval(node[1], ctx, env)):
            return _eval(node[2], ctx, env)
        return _eval(node[3], ctx, env)
    if tag == "let":
        val = _eval(node[2], ctx, env)
        return _eval(node[3], ctx, {**env, "vars":
                                    {**env["vars"], node[1]: val}})
    if tag == "var":
        if node[1] not in env["vars"]:
            raise JsltError(f"jslt: undefined variable ${node[1]}")
        return env["vars"][node[1]]
    if tag == "array":
        return [_eval(e, ctx, env) for e in node[1]]
    if tag == "for_array":
        src = _eval(node[1], ctx, env)
        if src is None:
            return None
        if not isinstance(src, (list, dict)):
            raise JsltError(
                f"jslt: for requires an array or object, got "
                f"{type(src).__name__}")
        # JSLT reference: an object input is converted to an array of
        # {"key", "value"} objects (same as the object-for), not its
        # bare values
        items = src if isinstance(src, list) else [
            {"key": k, "value": v} for k, v in src.items()
        ]
        out = []
        for x in items:
            if node[3] is not None and not _truthy(
                    _eval(node[3], x, env)):
                continue
            out.append(_eval(node[2], x, env))
        return out
    if tag == "for_object":
        src = _eval(node[1], ctx, env)
        if src is None:
            return None
        if not isinstance(src, (list, dict)):
            raise JsltError(
                f"jslt: for requires an array or object, got "
                f"{type(src).__name__}")
        items = src if isinstance(src, list) else [
            {"key": k, "value": v} for k, v in src.items()
        ]
        cond = node[4] if len(node) > 4 else None
        out = {}
        for x in items:
            if cond is not None and not _truthy(_eval(cond, x, env)):
                continue
            k = _eval(node[2], x, env)
            v = _eval(node[3], x, env)
            if v is not None:
                out[k] = v
        return out
    if tag == "object":
        lets, pairs, matcher = node[1], node[2], node[3]
        minus = set(node[4]) if len(node) > 4 else set()
        local = env
        for name, vex in lets:
            local = {**local, "vars": {**local["vars"],
                                       name: _eval(vex, ctx, local)}}
        out = {}
        explicit = set()
        for kexpr, vexpr in pairs:
            k = _eval(kexpr, ctx, local)
            explicit.add(k)
            v = _eval(vexpr, ctx, local)
            if v is not None:  # null values drop the key (JSLT semantics)
                out[k] = v
        if matcher is not None and isinstance(ctx, dict):
            for k, v in ctx.items():
                if k not in explicit and k not in minus:
                    mv = _eval(matcher, v, local)
                    if mv is not None:
                        out[k] = mv
        return out
    if tag == "call":
        try:
            return _call(node[1], node[2], ctx, env)
        except (JsltError, RecursionError):
            raise
        except Exception as e:
            # safety net: a type hole in any builtin must surface as a
            # catchable JsltError, never a raw Python exception that
            # kills an executor task with an opaque stack
            raise JsltError(
                f"jslt: {node[1]}: {type(e).__name__}: {e}")
    raise JsltError(f"jslt: unhandled node {tag}")


def _to_string(v):
    if isinstance(v, str):
        return v
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _ptr_get(obj, pointer, default=None):
    if not pointer or pointer == "/":
        return obj
    cur = obj
    for seg in pointer.lstrip("/").split("/"):
        seg = seg.replace("~1", "/").replace("~0", "~")
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        elif isinstance(cur, list) and seg.isdigit() and \
                int(seg) < len(cur):
            cur = cur[int(seg)]
        else:
            return default
    return cur


def _ptr_set(obj, pointer, value):
    segs = [s.replace("~1", "/").replace("~0", "~")
            for s in pointer.lstrip("/").split("/")]

    def go(cur, i):
        if i == len(segs):
            return value
        out = dict(cur) if isinstance(cur, dict) else {}
        out[segs[i]] = go(out.get(segs[i], {}), i + 1)
        return out
    return go(obj, 0)


_JAVA_TIME = [
    ("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"), ("SSS", "%f"),
    ("XXX", "%z"), ("XX", "%z"), ("X", "%z"), ("Z", "%z"),
    ("'T'", "T"), ("EEE", "%a"), ("MMM", "%b"),
]


def _java_time_format(fmt: str) -> str:
    """Translate the common java.time pattern letters (JSLT's
    parse-time/format-time contract) to strptime directives."""
    out = fmt
    for j, p in _JAVA_TIME:
        out = out.replace(j, p)
    return out


_NULL1 = frozenset((
    "round floor ceiling lowercase uppercase trim capture replace "
    "split join sha256-hex hash-int base64-encode base64-decode "
    "uri-encode uri-decode substr parse-time format-time parse-url "
    "zip zip-with-index sum flatten parse-iso-instant get-pointer "
    "error"
).split())
_FALSE1 = frozenset(("test", "starts-with", "ends-with"))


def _call(name, args, ctx, env):
    if name in env["funcs"]:
        params, body = env["funcs"][name]
        if len(params) != len(args):
            raise JsltError(f"jslt: {name} expects {len(params)} args")
        bound = {p: _eval(a, ctx, env) for p, a in zip(params, args)}
        return _eval(body, ctx, {**env, "vars": {**env["vars"], **bound}})

    def a(i=0):
        return _eval(args[i], ctx, env)

    n = len(args)
    # JSLT's documented convention: most functions propagate a null
    # FIRST argument as null (round-8 hostile-type sweep: 329 raw
    # Python TypeError/AttributeError holes found — in a Spark
    # executor those kill the task instead of surfacing a catchable
    # JsltError)
    if name in _NULL1 and n >= 1 and a(0) is None:
        return None
    if name in _FALSE1 and n >= 1 and a(0) is None:
        return False
    if name in ("min", "max", "mod") and n >= 2 \
            and (a(0) is None or a(1) is None):
        return None
    if name == "size":
        v = a()
        return None if v is None else (
            len(v) if isinstance(v, (str, list, dict)) else None)
    if name == "string":
        return _to_string(a())
    if name == "number":
        v = a()
        if v is None or isinstance(v, (int, float)):
            return v
        try:
            f = float(v)
        except (TypeError, ValueError):
            if n > 1:  # number(x, fallback)
                return a(1)
            raise JsltError(f"jslt: number() cannot convert {v!r}")
        return int(f) if f.is_integer() else f
    if name == "fallback":
        # lazy: evaluate args until one has a value (the JSLT operator
        # for absent-field defaults)
        for i in range(n):
            v = a(i)
            if v is not None:
                return v
        return None
    if name == "boolean":
        return _truthy(a())
    if name == "not":
        return not _truthy(a())
    if name == "round":
        return round(a())
    if name == "floor":
        return math.floor(a())
    if name == "ceiling":
        return math.ceil(a())
    if name == "sum":
        v = a()
        return sum(v) if v else None
    if name in ("min", "max"):
        # JSLT's min/max are binary (min(a, b)); the unary-over-array
        # form is kept as a compatible extension
        f = min if name == "min" else max
        if n == 2:
            x, y = a(0), a(1)
            return None if x is None or y is None else f(x, y)
        v = a()
        return f(v) if v else None
    if name == "mod":
        x, y = a(0), a(1)
        return None if x is None or y is None else x % y
    if name == "flatten":
        def _flat(xs):
            out = []
            for x in xs:
                out.extend(_flat(x) if isinstance(x, list) else [x])
            return out
        v = a()
        return None if v is None else _flat(v)
    if name == "all":
        v = a()
        return None if v is None else all(_truthy(x) for x in v)
    if name == "any":
        v = a()
        return None if v is None else any(_truthy(x) for x in v)
    if name == "zip":
        x, y = a(0), a(1)
        if x is None or y is None:
            return None
        return [[i, j] for i, j in zip(x, y)]
    if name == "zip-with-index":
        v = a()
        return None if v is None else [
            {"index": i, "value": x} for i, x in enumerate(v)]
    if name == "index-of":
        arr, val = a(0), a(1)
        if arr is None:
            return None
        for i, x in enumerate(arr):
            if _jslt_eq(x, val):
                return i
        return -1
    if name == "array":
        v = a()
        if v is None or isinstance(v, list):
            return v
        if isinstance(v, dict):
            return [{"key": k, "value": x} for k, x in v.items()]
        raise JsltError(f"jslt: array() cannot convert {type(v).__name__}")
    if name == "from-json":
        v = a()
        if v is None:
            return None
        try:
            return json.loads(v)
        except (TypeError, ValueError):
            return a(1) if n > 1 else None
    if name == "to-json":
        return json.dumps(a())
    if name == "contains":
        el, seq = a(0), a(1)
        if isinstance(seq, dict):
            return el in seq
        if seq is None:
            return False
        if isinstance(seq, str):
            return isinstance(el, str) and el in seq
        return any(_jslt_eq(el, x) for x in seq)
    if name == "join":
        arr, sep = a(0), a(1)
        return sep.join(_to_string(x) for x in arr)
    if name == "split":
        s, sep = a(0), a(1)
        return s.split(sep) if s is not None else None
    if name == "lowercase":
        return a().lower()
    if name == "uppercase":
        return a().upper()
    if name == "trim":
        return a().strip()
    if name == "starts-with":
        return a(0).startswith(a(1))
    if name == "ends-with":
        return a(0).endswith(a(1))
    if name == "test":
        return re.search(a(1), a(0)) is not None
    if name == "capture":
        s = a(0)
        if s is None:
            return None
        # JSLT regexes are Java-flavored: named groups are (?<n>...) —
        # translate to Python's (?P<n>...), leaving lookbehinds alone
        pat = re.sub(r"\(\?<(?![=!])", "(?P<", a(1))
        m = re.search(pat, s)
        return {k: v for k, v in (m.groupdict() if m else {}).items()
                if v is not None}
    if name == "replace":
        s = a(0)
        return None if s is None else re.sub(a(1), a(2), s)
    if name == "sha256-hex":
        import hashlib as _hl

        return _hl.sha256(_to_string(a()).encode()).hexdigest()
    if name == "sha512-hex":
        import hashlib as _hl

        return _hl.sha512(_to_string(a()).encode()).hexdigest()
    if name == "print":
        # JSLT debugging passthrough: emit the stringified value (with
        # an optional prefix) and return it unchanged.  DELIBERATELY
        # stderr, not stdout — the driver contract prints its one JSON
        # line on stdout and debug output must not corrupt it.
        import sys as _sys

        v = a(0)
        prefix = _to_string(a(1)) if len(args) > 1 else ""
        _sys.stderr.write(prefix + _to_string(v) + "\n")
        return v
    if name == "hash-int":
        import hashlib as _hl

        canon = json.dumps(a(), sort_keys=True, separators=(",", ":"))
        return int.from_bytes(
            _hl.sha256(canon.encode()).digest()[:8], "big", signed=False
        ) >> 1  # non-negative 63-bit
    if name == "now":
        import time as _time

        return _time.time()
    if name == "parse-time":
        s = a(0)
        if s is None:
            return None
        try:
            from datetime import datetime, timezone

            dt = datetime.strptime(s, _java_time_format(a(1)))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.timestamp()
        except ValueError:
            if n > 2:
                return a(2)
            raise JsltError(f"jslt: parse-time failed for {s!r}")
    if name == "format-time":
        v = a(0)
        if v is None:
            return None
        from datetime import datetime, timezone

        return datetime.fromtimestamp(v, tz=timezone.utc).strftime(
            _java_time_format(a(1)))
    if name == "get-key":
        obj, key = a(0), a(1)
        dflt = a(2) if n > 2 else None
        return obj.get(key, dflt) if isinstance(obj, dict) else dflt
    if name == "error":
        raise JsltError(_to_string(a()))
    if name.startswith("is-"):
        v = a()
        is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
        return {
            "is-string": isinstance(v, str),
            "is-number": is_num,
            "is-integral": is_num and float(v).is_integer(),
            "is-decimal": is_num and not float(v).is_integer(),
            "is-boolean": isinstance(v, bool),
            "is-object": isinstance(v, dict),
            "is-array": isinstance(v, list),
            "is-null": v is None,
        }.get(name, False)
    # ---- the platform's custom functions (docs/custom_jslt.md) ----
    if name == "base64-encode":
        return _b64.b64encode(a().encode()).decode()
    if name == "base64-decode":
        return _b64.b64decode(a()).decode()
    if name == "uri-encode":
        return urllib.parse.quote(a(), safe="")
    if name == "uri-decode":
        return urllib.parse.unquote(a())
    if name == "uuid":
        return str(_uuid.uuid4())
    if name == "substr":
        s, start = a(0), a(1)
        end = a(2) if n > 2 else len(s)
        return s[start:end]
    if name == "trace":
        return a()
    if name == "pointer":
        return "/" + "/".join(_to_string(a(i)) for i in range(n))
    if name == "get-pointer":
        return _ptr_get(a(0), a(1), a(2) if n > 2 else None)
    if name == "set-pointer":
        return _ptr_set(a(0), a(1), a(2))
    if name == "parse-iso-instant":
        from datetime import datetime

        s = a()
        return int(datetime.fromisoformat(
            s.replace("Z", "+00:00")).timestamp())
    if name == "parse-url":
        # JSLT spec shape: scheme/userinfo/host/port/path/query/
        # parameters (name -> [values]) / fragment; absent parts omitted
        s = a()
        if s is None:
            return None
        u = urllib.parse.urlsplit(s)
        out: dict = {}
        if u.scheme:
            out["scheme"] = u.scheme
        if u.username:
            out["userinfo"] = (
                u.username + (":" + u.password if u.password else ""))
        if u.hostname:
            out["host"] = u.hostname
        try:
            if u.port is not None:
                out["port"] = u.port
        except ValueError:
            # out-of-range / non-numeric port: omit the part instead of
            # failing the executor task for one malformed URL
            pass
        if u.path:
            out["path"] = u.path
        if u.query:
            out["query"] = u.query
            params: dict = {}
            for k, v in urllib.parse.parse_qsl(
                    u.query, keep_blank_values=True):
                params.setdefault(k, []).append(v)
            out["parameters"] = params
        if u.fragment:
            out["fragment"] = u.fragment
        return out
    if name == "random":
        import random as _random

        return _random.random()
    ext = env.get("ext") or {}
    if name in ext:
        return ext[name](*[a(i) for i in range(n)])
    raise JsltError(f"jslt: unknown function {name}")


def compile_jslt(
    src: str,
    loader: Callable[[str], str] | None = None,
    extensions: dict[str, Callable] | None = None,
) -> Callable[[Any], Any]:
    """Compile a JSLT program to ``fn(value) -> value`` (single-valued,
    unlike jq's streams).  ``loader`` resolves file imports from the
    spec's inlined ``scriptImports`` (Common.java:803-846).
    ``extensions`` overrides the plugin-function snapshot — callers that
    compile on an executor must capture the registry driver-side and pass
    it here."""
    imports, defs, lets, body = _Parser(_lex(src)).program()
    funcs: dict[str, tuple] = {}
    for path, ns in imports:
        if loader is None:
            raise JsltError(f"jslt: import {path!r} needs a loader")
        sub_imports, sub_defs, _sl, _sb = _Parser(
            _lex(loader(path) + "\nnull")).program()
        for dname, dparams, dbody in sub_defs:
            funcs[f"{ns}:{dname}"] = (dparams, dbody)
    for dname, dparams, dbody in defs:
        funcs[dname] = (dparams, dbody)

    # snapshot plugin functions at compile time (driver side): the dict is
    # captured in the closure, so cloudpickle ships the functions by value
    # to executor Python workers, where the plugins module import would be
    # a fresh empty registry
    if extensions is None:
        from pincette_json_streams_spark.plugins import (
            JSLT_FUNCTION_EXTENSIONS,
        )
        extensions = dict(JSLT_FUNCTION_EXTENSIONS)
    ext = extensions

    def run(value):
        env = {"funcs": funcs, "vars": {}, "ext": ext}
        for name, vex in lets:
            env["vars"][name] = _eval(vex, value, env)
        return _eval(body, value, env)

    return run
