"""A self-contained JQ-subset interpreter.

The reference treats JQ as the *preferred* script language for reducers
and the $jq stage/operator (/root/reference/docs/index.md:11,
docs/aggregation_stages.md:245-277, docs/aggregation_operators.md:1163;
script compilation App.java:1212-1263).  No maintained jq binding exists
in this runtime, so this module implements the subset the reference's
corpus and docs exercise, from the public jq language manual:

  - pipes ``a | b``, comma streams ``a, b``, parentheses
  - identity ``.``, field paths ``.a.b``, optional ``.a?``, iteration
    ``.[]``, indexing ``.[0]``, slices ``.[1:3]``, generic ``.[expr]``
  - literals (numbers, strings with ``\\(interpolation)``, true/false/null),
    array ``[...]`` and object ``{a: v, "b": v, c, (expr): v}`` construction
  - arithmetic ``+ - * / %`` (jq semantics: + merges objects, concatenates
    arrays/strings), comparisons, ``and/or/not``, alternative ``//``
  - ``if .. then .. elif .. else .. end``, ``reduce EXPR as $v (init; f)``,
    ``foreach EXPR as $v (init; update[; extract])``, ``label $x | ..``
    with ``break $x``, destructuring patterns in every ``as``
    (``. as [$a, {b: $c}] | ..``)
  - assignment ``.path = v``, update ``.path |= f``, arithmetic update
    ``.path += v``
  - variables ``EXPR as $x | body``
  - ``def name: body;`` / ``def name(params): body;`` with real jq
    parameter semantics: ``$x`` value params bind each OUTPUT of the
    argument, bare params are call-by-name filter closures capturing
    the caller's environment; defs may appear anywhere an expression
    starts (local defs scope over the rest of the pipe); file
    ``import``s with namespaces (``import "x.jq" as ns;`` then
    ``ns::name``)
  - builtins: length, keys, has, del, map, select, add, any, all, range,
    floor, ceil, sqrt, fabs, tostring, tonumber, type, not, empty, error,
    ascii_downcase, ascii_upcase, split, join, ltrimstr, rtrimstr,
    startswith, endswith, contains, test, reverse, sort, sort_by, unique,
    min, max, first, last, to_entries, from_entries, with_entries,
    tojson, fromjson, group_by, unique_by, min_by, max_by, flatten, abs,
    round, pow, log, log2, log10, exp, exp2, exp10, isnan, isinfinite,
    infinite, nan, trim, ltrim, rtrim, sub, gsub, splits, ascii,
    explode, implode, todate, fromdate, objects/arrays/booleans/numbers/
    strings/nulls/values/scalars/iterables, recurse (0/1/2-arg), limit,
    now, gmtime, localtime, mktime, strftime, strflocaltime, strptime,
    todateiso8601, fromdateiso8601, SQL-style INDEX/IN/GROUP_BY/
    UNIQUE_BY/ANY/ALL,
    until, while, getpath, setpath, delpaths, paths, leaf_paths,
    match/capture/scan (Oniguruma-flag aware), nth, in, inside, env,
    $ENV, $__loc__, walk, transpose, combinations, indices, index,
    rindex, repeat, debug, stderr, toarray, pick, path (generator
    paths: .a[], comma, pipes, select), halt, halt_error,
    tostream/fromstream/truncate_stream, and the @format strings
    (@text @json @base64 @base64d @uri @html @csv @tsv @sh)

Evaluation is generator-based like jq itself: every expression yields a
*stream* of values.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Callable, Iterable, Iterator

__all__ = ["compile_jq", "JqError"]


class JqError(ValueError):
    pass


class JqHalt(Exception):
    """halt / halt_error: terminates the whole program — deliberately
    NOT a JqError, so try/catch and `?` cannot intercept it (jq
    semantics, round-8 fuzz); compile_jq's runner converts it to a
    JqError at the very top so callers still see one error type."""


# --------------------------------------------------------------------------
# lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<num>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<loc>\$__loc__)
  | (?P<op>\.\.|\|=|\+=|-=|==|!=|<=|>=|//|::|\||\.|\[|\]|\{|\}|\(|\)|,|:|;|\+|-|\*|/|%|<|>|=|\?|\$|@)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
""", re.VERBOSE)

_KEYWORDS = {"if", "then", "elif", "else", "end", "and", "or", "not",
             "def", "as", "import", "reduce", "foreach", "label",
             "true", "false", "null", "try", "catch"}


def _scan_string(src: str, start: int) -> int:
    r"""``start`` is the opening quote; returns the index just past the
    closing quote, honoring ``\(...)`` interpolation — whose expression
    may itself contain strings (with their own interpolations), which a
    regex cannot track (round-8 fuzz: `"v=\(getpath(["a"]))"`)."""
    i = start + 1
    n = len(src)
    while i < n:
        c = src[i]
        if c == "\\":
            if i + 1 < n and src[i + 1] == "(":
                depth = 1
                i += 2
                while i < n and depth:
                    if src[i] == '"':
                        i = _scan_string(src, i)
                        continue
                    if src[i] == "(":
                        depth += 1
                    elif src[i] == ")":
                        depth -= 1
                    i += 1
                continue
            i += 2
            continue
        if c == '"':
            return i + 1
        i += 1
    raise JqError("jq: unterminated string")


def _lex(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise JqError(f"jq: bad character at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "str":
            # the regex stops at the first inner quote; re-scan with
            # interpolation awareness to get the REAL string extent
            end = _scan_string(src, m.start())
            text = src[m.start():end]
            pos = end
        if kind == "loc":
            # $__loc__ carries its source line (jq manual: {file, line})
            out.append(("loc", str(src[:m.start()].count("\n") + 1)))
        elif kind == "ident" and text in _KEYWORDS:
            out.append(("kw", text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# --------------------------------------------------------------------------
# parser -> AST (tuples)
# --------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, text=None):
        k, v = self.peek()
        if k == kind and (text is None or v == text):
            self.i += 1
            return v
        return None

    def expect(self, kind, text=None):
        got = self.accept(kind, text)
        if got is None:
            raise JqError(
                f"jq: expected {text or kind}, got {self.peek()!r}")
        return got

    # program := (import ';')* (def ';')* pipe
    def program(self):
        imports = []
        while self.peek() == ("kw", "import"):
            self.next()
            path = json.loads(self.expect("str"))
            self.expect("kw", "as")
            ns = self.expect("ident")
            self.expect("op", ";")
            imports.append((path, ns))
        defs = []
        while self.peek() == ("kw", "def"):
            defs.append(self._def())
        body = self.pipe()
        self.expect("eof")
        return ("program", imports, defs, body)

    def _def(self):
        self.expect("kw", "def")
        name = self.expect("ident")
        params = []
        if self.accept("op", "("):
            while True:
                # $x = value param (binds each OUTPUT of the argument);
                # bare x = filter param (call-by-name closure, real-jq
                # `def f(g): ...` semantics)
                if self.accept("op", "$"):
                    params.append("$" + self.expect("ident"))
                else:
                    params.append(self.expect("ident"))
                if not self.accept("op", ";"):
                    break
            self.expect("op", ")")
        self.expect("op", ":")
        body = self.pipe()
        self.expect("op", ";")
        return (name, params, body)

    def pipe(self):
        # real jq allows `def name: body; rest` wherever an expression
        # starts — the def scopes over the rest of the pipe
        if self.peek() == ("kw", "def"):
            d = self._def()
            return ("localdef", d, self.pipe())
        left = self.comma()
        if self.accept("op", "|"):
            return ("pipe", left, self.pipe())
        return left

    def comma(self):
        left = self.assign()
        if self.accept("op", ","):
            return ("comma", left, self.comma())
        return left

    def assign(self):
        left = self.alt()
        k, v = self.peek()
        if k == "op" and v in ("=", "|=", "+=", "-="):
            self.next()
            right = self.alt()
            return ("assign", v, left, right)
        if self.peek() == ("kw", "as"):
            self.next()
            pat = self._pattern()
            self.expect("op", "|")
            body = self.pipe()
            return ("bind", left, pat, body)
        return left

    def alt(self):
        left = self.or_()
        if self.accept("op", "//"):
            return ("alt", left, self.alt())
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
        left = self.addsub()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return ("cmp", v, left, self.addsub())
        return left

    def addsub(self):
        left = self.muldiv()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                left = ("arith", v, left, self.muldiv())
            else:
                return left

    def muldiv(self):
        left = self.unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
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
            if k == "op" and v == ".":
                # .foo after an expression (e.g. $x.foo)
                nxt = self.toks[self.i + 1]
                if nxt[0] == "ident":
                    self.next()
                    node = ("index", node, ("lit", self.next()[1]))
                    continue
                break
            if k == "op" and v == "[":
                self.next()
                if self.accept("op", "]"):
                    node = ("iterate", node)
                elif self.accept("op", ":"):
                    hi = self.pipe()
                    self.expect("op", "]")
                    node = ("slice", node, None, hi)
                else:
                    idx = self.pipe()
                    if self.accept("op", ":"):
                        if self.peek() == ("op", "]"):
                            hi = None
                        else:
                            hi = self.pipe()
                        self.expect("op", "]")
                        node = ("slice", node, idx, hi)
                    else:
                        self.expect("op", "]")
                        node = ("index", node, idx)
                continue
            if k == "op" and v == "?":
                self.next()
                node = ("try", node)
                continue
            return node
        return node

    def primary(self):
        k, v = self.peek()
        if k == "op" and v == "..":
            # `..` is sugar for recurse (round-8 fuzz: the lexer
            # tokenized it but no parse rule consumed it)
            self.next()
            return ("call", "recurse", [])
        if k == "op" and v == ".":
            self.next()
            k2, v2 = self.peek()
            if k2 == "ident":
                self.next()
                return ("index", ("identity",), ("lit", v2))
            if k2 == "str":
                self.next()
                return ("index", ("identity",), ("lit", json.loads(v2)))
            return ("identity",)
        if k == "num":
            self.next()
            f = float(v)
            return ("lit", int(f) if f.is_integer() and "." not in v
                    and "e" not in v.lower() else f)
        if k == "str":
            self.next()
            return self._string(v)
        if k == "kw" and v in ("true", "false", "null"):
            self.next()
            return ("lit", {"true": True, "false": False,
                            "null": None}[v])
        if k == "kw" and v == "if":
            return self._if()
        if k == "kw" and v == "not":
            self.next()
            return ("call", "not", [])
        if k == "kw" and v == "try":
            # jq: `try f catch g` — tight binding (postfix terms); the
            # catch handler receives the error MESSAGE as its input
            self.next()
            body = self.postfix()
            handler = self.postfix() if self.accept("kw", "catch") \
                else None
            return ("trycatch", body, handler)
        if k == "kw" and v == "reduce":
            return self._reduce()
        if k == "kw" and v == "foreach":
            return self._reduce("foreach")
        if k == "kw" and v == "label":
            # label $name | pipe — scope for break $name
            self.next()
            self.expect("op", "$")
            nm = self.expect("ident")
            self.expect("op", "|")
            return ("label", nm, self.pipe())
        if k == "loc":
            self.next()
            return ("lit", {"file": "<stdin>", "line": int(v)})
        if k == "op" and v == "@":
            # @format — bare filter, or prefixing an interpolated string
            # where ONLY the \(...) segments are escaped (jq manual)
            self.next()
            name = self.expect("ident")
            k2, v2 = self.peek()
            if k2 == "str":
                self.next()
                return self._string(v2, fmt=name)
            return ("format", name)
        if k == "op" and v == "$":
            self.next()
            return ("var", self.expect("ident"))
        if k == "op" and v == "(":
            self.next()
            node = self.pipe()
            self.expect("op", ")")
            return node
        if k == "op" and v == "[":
            self.next()
            if self.accept("op", "]"):
                return ("array", None)
            node = self.pipe()
            self.expect("op", "]")
            return ("array", node)
        if k == "op" and v == "{":
            return self._object()
        if k == "ident":
            self.next()
            if v == "break" and self.accept("op", "$"):
                return ("break", self.expect("ident"))
            if self.accept("op", "::"):
                name = self.expect("ident")
                return self._call(f"{v}::{name}")
            return self._call(v)
        raise JqError(f"jq: unexpected token {self.peek()!r}")

    def _call(self, name):
        args = []
        if self.accept("op", "("):
            while True:
                args.append(self.pipe())
                if not self.accept("op", ";"):
                    break
            self.expect("op", ")")
        return ("call", name, args)

    def _string(self, raw, fmt=None):
        # handle \(...) interpolation; with fmt (@format "...") the
        # interpolated values are escaped through the format instead of
        # plain tostring
        body = raw[1:-1]
        parts: list = []
        buf = ""
        i = 0
        while i < len(body):
            if body[i] == "\\" and i + 1 < len(body) and body[i+1] == "(":
                depth = 1
                j = i + 2
                while j < len(body) and depth:
                    if body[j] == '"':
                        # nested string inside the interpolation: its
                        # quotes/parens must not confuse the scan
                        j = _scan_string(body, j)
                        continue
                    if body[j] == "(":
                        depth += 1
                    elif body[j] == ")":
                        depth -= 1
                    j += 1
                if buf:
                    parts.append(("lit", json.loads(f'"{buf}"')))
                    buf = ""
                inner = _Parser(_lex(body[i+2:j-1])).pipe()
                parts.append(("format_apply", fmt, inner) if fmt
                             else ("call", "tostring_i", [inner]))
                i = j
            else:
                if body[i] == "\\":
                    buf += body[i:i+2]
                    i += 2
                else:
                    buf += body[i]
                    i += 1
        if buf or not parts:
            parts.append(("lit", json.loads(f'"{buf}"')))
        if len(parts) == 1:
            return parts[0]
        node = parts[0]
        for p in parts[1:]:
            node = ("arith", "+", node, p)
        return node

    def _if(self):
        self.expect("kw", "if")
        cond = self.pipe()
        self.expect("kw", "then")
        then = self.pipe()
        branches = [(cond, then)]
        alt = ("identity",)
        while True:
            k, v = self.peek()
            if (k, v) == ("kw", "elif"):
                self.next()
                c = self.pipe()
                self.expect("kw", "then")
                t = self.pipe()
                branches.append((c, t))
            elif (k, v) == ("kw", "else"):
                self.next()
                alt = self.pipe()
            elif (k, v) == ("kw", "end"):
                self.next()
                return ("if", branches, alt)
            else:
                raise JqError(f"jq: bad if, got {self.peek()!r}")

    def _pattern(self):
        # destructuring pattern (jq manual "Destructuring Alternative
        # Operator" minus ?//): $x | [p, ...] | {key: p, $x, "s": p,
        # (expr): p}
        if self.accept("op", "$"):
            return ("pvar", self.expect("ident"))
        if self.accept("op", "["):
            subs = [self._pattern()]
            while self.accept("op", ","):
                subs.append(self._pattern())
            self.expect("op", "]")
            return ("parr", subs)
        if self.accept("op", "{"):
            entries = []
            while True:
                if self.accept("op", "$"):
                    nm = self.expect("ident")
                    entries.append((("lit", nm), ("pvar", nm)))
                else:
                    if self.accept("op", "("):
                        kexpr = self.pipe()
                        self.expect("op", ")")
                    else:
                        k, v = self.peek()
                        if k == "str":
                            self.next()
                            kexpr = ("lit", json.loads(v))
                        else:
                            kexpr = ("lit", self.expect("ident"))
                    self.expect("op", ":")
                    entries.append((kexpr, self._pattern()))
                if not self.accept("op", ","):
                    break
            self.expect("op", "}")
            return ("pobj", entries)
        raise JqError(f"jq: bad destructuring pattern at {self.peek()!r}")

    def _reduce(self, kw="reduce"):
        self.expect("kw", kw)
        src = self.postfix()
        self.expect("kw", "as")
        pat = self._pattern()
        self.expect("op", "(")
        init = self.pipe()
        self.expect("op", ";")
        upd = self.pipe()
        extract = None
        if kw == "foreach" and self.accept("op", ";"):
            extract = self.pipe()
        self.expect("op", ")")
        return (kw, src, pat, init, upd, extract)

    def _objval(self):
        # object values allow pipes but not commas: {a: .x | f, b: 2}
        left = self.assign()
        if self.accept("op", "|"):
            return ("pipe", left, self._objval())
        return left

    def _object(self):
        self.expect("op", "{")
        entries = []
        if self.accept("op", "}"):
            return ("object", entries)
        while True:
            k, v = self.peek()
            if k == "str":
                self.next()
                key = ("lit", json.loads(v))
            elif k == "op" and v == "(":
                self.next()
                key = self.pipe()
                self.expect("op", ")")
            elif k == "ident" or (k == "kw"):
                self.next()
                key = ("lit", v)
            elif k == "op" and v == "$":
                self.next()
                name = self.expect("ident")
                entries.append((("lit", name), ("var", name)))
                if not self.accept("op", ","):
                    break
                continue
            else:
                raise JqError(f"jq: bad object key {self.peek()!r}")
            if self.accept("op", ":"):
                val = self._objval()
            else:
                val = ("index", ("identity",), key)
            entries.append((key, val))
            if not self.accept("op", ","):
                break
        self.expect("op", "}")
        return ("object", entries)


# --------------------------------------------------------------------------
# evaluator (stream semantics)
# --------------------------------------------------------------------------

def _truthy(v) -> bool:
    return v is not None and v is not False


def _canon_render(v):
    """jq's number canonicalization when RENDERING to text (tostring/
    tojson/@json, jslt-fuzz finding): integral floats print as ints
    (5.0 -> "5", -0.0 -> "-0"), NaN prints as null.  Only used for
    text output — values in flight keep their float identity."""
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if math.isinf(v):
            # jq prints infinities clamped to the double max
            return math.copysign(1.7976931348623157e+308, v)
        if v == 0 and math.copysign(1.0, v) < 0:
            return _MinusZero(-0.0)  # typed marker, rendered as "-0"
        if v == int(v) and abs(v) < 2 ** 53:
            return int(v)
        return v
    if isinstance(v, list):
        return [_canon_render(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon_render(x) for k, x in v.items()}
    return v


class _MinusZero(float):
    """Marker for a genuine negative-zero float so only true -0.0
    nodes render as '-0' (a data string "-0.0" must stay intact)."""
    pass


def _dump_node(x) -> str:
    # hand-rolled canonical JSON renderer: json.dumps can't print a
    # bare -0, and a blanket text replace would corrupt strings /
    # numbers merely CONTAINING "-0.0" (e.g. -0.05, "x-0.0y")
    if x is None:
        return "null"
    if x is True:
        return "true"
    if x is False:
        return "false"
    if isinstance(x, _MinusZero):
        return "-0"
    if isinstance(x, (int, float, str)):
        return json.dumps(x)
    if isinstance(x, list):
        return "[" + ",".join(_dump_node(y) for y in x) + "]"
    if isinstance(x, dict):
        return "{" + ",".join(
            json.dumps(k) + ":" + _dump_node(y) for k, y in x.items()) + "}"
    raise TypeError(f"{type(x).__name__} is not JSON-serializable")


def _dumps_canon(v) -> str:
    return _dump_node(_canon_render(v))


def _tostr(v) -> str:
    if isinstance(v, str):
        return v
    return _dumps_canon(v)


class _Env:
    def __init__(self, funcs, variables):
        self.funcs = funcs
        self.vars = variables

    def child_vars(self, extra):
        e = _Env(self.funcs, dict(self.vars))
        e.vars.update(extra)
        return e


def _format_value(name: str, v) -> str:
    """jq @format conversions (jq manual 'Format strings and escaping').
    Non-string scalars/containers are first rendered with tostring
    (JSON text for containers), except the row formats @csv/@tsv/@sh
    which have their own per-cell rules."""
    import base64 as _b64
    import urllib.parse as _up

    def base(x):
        return x if isinstance(x, str) else _tostr(x)

    if name == "text":
        return base(v)
    if name == "json":
        try:
            return _dumps_canon(v)
        except (TypeError, ValueError):
            # strict like real jq: a non-JSON value is an error, not a
            # silently stringified repr
            raise JqError(
                f"jq: @json: {type(v).__name__} is not JSON-serializable")
    if name == "base64":
        return _b64.b64encode(base(v).encode()).decode()
    if name == "base64d":
        import binascii as _ba

        s = base(v)
        try:
            # padding restored (jq inverts @base64's padded output but
            # tolerates unpadded); validate=True so corrupt input
            # RAISES like real jq instead of decoding to garbage
            raw = _b64.b64decode(s + "=" * (-len(s) % 4), validate=True)
        except (_ba.Error, ValueError):
            raise JqError(f"jq: {s!r} is not valid base64 data")
        try:
            # strict: real jq errors on non-UTF-8 payloads; replacement
            # chars would silently mangle binary data
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            raise JqError(f"jq: @base64d: {s!r} decodes to non-UTF-8 data")
    if name == "uri":
        return _up.quote(base(v), safe="-_.~")
    if name == "html":
        return (base(v).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace("'", "&#39;")
                .replace('"', "&quot;"))
    if name == "csv":
        if not isinstance(v, list):
            raise JqError("jq: @csv input must be an array")
        cells = []
        for x in v:
            if x is None:
                cells.append("")
            elif isinstance(x, bool):
                cells.append("true" if x else "false")
            elif isinstance(x, (int, float)):
                cells.append(_tostr(x))
            elif isinstance(x, str):
                cells.append('"' + x.replace('"', '""') + '"')
            else:
                raise JqError("jq: @csv cells must be scalars")
        return ",".join(cells)
    if name == "tsv":
        if not isinstance(v, list):
            raise JqError("jq: @tsv input must be an array")
        cells = []
        for x in v:
            if x is None:
                cells.append("")
            elif isinstance(x, bool):
                cells.append("true" if x else "false")
            elif isinstance(x, (int, float)):
                cells.append(_tostr(x))
            elif isinstance(x, str):
                cells.append(x.replace("\\", "\\\\").replace("\t", "\\t")
                             .replace("\n", "\\n").replace("\r", "\\r"))
            else:
                raise JqError("jq: @tsv cells must be scalars")
        return "\t".join(cells)
    if name == "sh":
        def q(x):
            if isinstance(x, (dict, list)):
                raise JqError("jq: @sh cells must be scalars")
            if isinstance(x, str):
                # only STRINGS are shell-quoted; numbers/bools/null
                # render bare (round-8 fuzz vs the binary)
                return "'" + x.replace("'", "'\\''") + "'"
            return base(x)
        return " ".join(q(x) for x in v) if isinstance(v, list) else q(v)
    raise JqError(f"jq: unknown format @{name}")


class _Break(Exception):
    """Raised by `break $label`, caught by the matching `label $x |`."""

    def __init__(self, name):
        self.name = name


_NO_KEY = object()


def _destructure(pat, val, env, out):
    """Bind a destructuring pattern against a value (jq manual:
    missing/mismatched parts bind null, never error)."""
    tag = pat[0]
    if tag == "pvar":
        out[pat[1]] = val
    elif tag == "parr":
        for i, sub in enumerate(pat[1]):
            v = val[i] if isinstance(val, list) and i < len(val) else None
            _destructure(sub, v, env, out)
    elif tag == "pobj":
        for kexpr, sub in pat[1]:
            # next() without a default would turn an empty key stream
            # (e.g. `. as {(empty): $v}`) into a PEP-479 RuntimeError
            # that try/catch cannot intercept; raise a catchable JqError.
            key = next(_eval(kexpr, val, env), _NO_KEY)
            if key is _NO_KEY:
                raise JqError(
                    "jq: object pattern key expression produced no output"
                )
            v = val.get(key) if isinstance(val, dict) else None
            _destructure(sub, v, env, out)
    return out


def _eval(node, inp, env: _Env) -> Iterator[Any]:
    tag = node[0]
    if tag == "identity":
        yield inp
    elif tag == "lit":
        yield node[1]
    elif tag == "format":
        yield _format_value(node[1], inp)
    elif tag == "format_apply":
        for v in _eval(node[2], inp, env):
            yield _format_value(node[1], v)
    elif tag == "pipe":
        for v in _eval(node[1], inp, env):
            yield from _eval(node[2], v, env)
    elif tag == "comma":
        yield from _eval(node[1], inp, env)
        yield from _eval(node[2], inp, env)
    elif tag == "index":
        for base in _eval(node[1], inp, env):
            for k in _eval(node[2], inp, env):
                if base is None:
                    yield None
                elif isinstance(base, dict):
                    if not isinstance(k, str):
                        raise JqError(
                            "jq: Cannot index object with "
                            + _type_name(k))
                    yield base.get(k)
                elif isinstance(base, list) and isinstance(k, int):
                    n = len(base)
                    i = k if k >= 0 else n + k
                    yield base[i] if 0 <= i < n else None
                else:
                    raise JqError(
                        f"jq: cannot index {type(base).__name__}")
    elif tag == "slice":
        for base in _eval(node[1], inp, env):
            lo = _first_or_err(_eval(node[2], inp, env), 'slice bound') \
                if node[2] else None
            hi = _first_or_err(_eval(node[3], inp, env), 'slice bound') \
                if node[3] else None
            yield base[lo:hi] if base is not None else None
    elif tag == "iterate":
        for base in _eval(node[1], inp, env):
            if isinstance(base, list):
                yield from base
            elif isinstance(base, dict):
                yield from base.values()
            elif base is None:
                pass
            else:
                raise JqError(
                    f"jq: cannot iterate {type(base).__name__}")
    elif tag == "localdef":
        dname, dparams, dbody = node[1]
        nf = dict(env.funcs)
        nf[dname] = (dparams, dbody, nf)
        yield from _eval(node[2], inp, _Env(nf, env.vars))
    elif tag in ("try", "trycatch"):
        # lazy: outputs produced BEFORE the error are kept (real jq:
        # 'try (1, error("x"))' yields 1) — materializing with list()
        # discarded them
        it = _eval(node[1], inp, env)
        while True:
            try:
                v = next(it)
            except StopIteration:
                break
            except JqError as e:
                if tag == "trycatch" and node[2] is not None:
                    yield from _eval(node[2], str(e), env)
                break
            yield v
    elif tag == "neg":
        for v in _eval(node[1], inp, env):
            yield -v
    elif tag == "arith":
        op = node[1]
        for a in _eval(node[2], inp, env):
            for b in _eval(node[3], inp, env):
                yield _arith(op, a, b)
    elif tag == "cmp":
        op = node[1]
        for a in _eval(node[2], inp, env):
            for b in _eval(node[3], inp, env):
                yield {
                    "==": lambda: _jq_eq(a, b),
                    "!=": lambda: not _jq_eq(a, b),
                    "<": lambda: _lt(a, b), "<=": lambda: not _lt(b, a),
                    ">": lambda: _lt(b, a), ">=": lambda: not _lt(a, b),
                }[op]()
    elif tag == "and":
        for a in _eval(node[1], inp, env):
            if not _truthy(a):
                yield False
            else:
                for b in _eval(node[2], inp, env):
                    yield _truthy(b)
    elif tag == "or":
        for a in _eval(node[1], inp, env):
            if _truthy(a):
                yield True
            else:
                for b in _eval(node[2], inp, env):
                    yield _truthy(b)
    elif tag == "alt":
        produced = False
        for v in _eval(node[1], inp, env):
            if _truthy(v):
                produced = True
                yield v
        if not produced:
            yield from _eval(node[2], inp, env)
    elif tag == "if":
        for branches, alt in [(node[1], node[2])]:
            def run(i):
                if i >= len(branches):
                    yield from _eval(alt, inp, env)
                    return
                cond, then = branches[i]
                for c in _eval(cond, inp, env):
                    if _truthy(c):
                        yield from _eval(then, inp, env)
                    else:
                        yield from run(i + 1)
            yield from run(0)
    elif tag == "array":
        if node[1] is None:
            yield []
        else:
            yield list(_eval(node[1], inp, env))
    elif tag == "object":
        def build(i, acc):
            if i == len(node[1]):
                yield dict(acc)
                return
            kexpr, vexpr = node[1][i]
            for k in _eval(kexpr, inp, env):
                for v in _eval(vexpr, inp, env):
                    yield from build(i + 1, acc + [(k, v)])
        yield from build(0, [])
    elif tag == "var":
        if node[1] not in env.vars:
            if node[1] == "ENV":  # jq: environment snapshot
                import os as _os

                yield dict(_os.environ)
                return
            raise JqError(f"jq: undefined variable ${node[1]}")
        yield env.vars[node[1]]
    elif tag == "bind":
        for v in _eval(node[1], inp, env):
            yield from _eval(
                node[3], inp,
                env.child_vars(_destructure(node[2], v, env, {})))
    elif tag == "reduce":
        for init in _eval(node[3], inp, env):
            acc = init
            for v in _eval(node[1], inp, env):
                e2 = env.child_vars(_destructure(node[2], v, env, {}))
                results = list(_eval(node[4], acc, e2))
                acc = results[-1] if results else None
            yield acc
    elif tag == "foreach":
        # jq: foreach EXPR as $v (init; update[; extract]) — every
        # output of update is emitted (through extract when given); the
        # state for the next element is update's LAST output
        for init in _eval(node[3], inp, env):
            acc = init
            for v in _eval(node[1], inp, env):
                e2 = env.child_vars(_destructure(node[2], v, env, {}))
                emitted = False
                for acc in _eval(node[4], acc, e2):
                    emitted = True
                    if node[5] is not None:
                        yield from _eval(node[5], acc, e2)
                    else:
                        yield acc
                if not emitted:
                    acc = None
    elif tag == "label":
        # break $name unwinds lazily to the nearest matching label
        try:
            yield from _eval(node[2], inp, env)
        except _Break as b:
            if b.name != node[1]:
                raise
    elif tag == "break":
        raise _Break(node[1])
    elif tag == "assign":
        yield from _assign(node, inp, env)
    elif tag == "call":
        yield from _call(node[1], node[2], inp, env)
    else:
        raise JqError(f"jq: unhandled node {tag}")


def _lt(a, b):
    ta, tb = _type_rank(a), _type_rank(b)
    if ta != tb:
        return ta < tb
    if isinstance(a, (list, tuple)):
        # element-wise through _lt, NOT Python list < (whose per-element
        # == treats True == 1 — the jslt-differential-fuzz finding)
        for x, y in zip(a, b):
            if _lt(x, y):
                return True
            if _lt(y, x):
                return False
        return len(a) < len(b)
    if isinstance(a, dict):
        ka, kb = sorted(a.keys()), sorted(b.keys())
        if ka != kb:
            return ka < kb
        for k in ka:
            if _lt(a[k], b[k]):
                return True
            if _lt(b[k], a[k]):
                return False
        return False
    if a is None:
        return False
    if isinstance(a, bool):
        return (not a) and b
    return a < b


def _jq_eq(a, b):
    """jq value equality: type-strict (true != 1 — Python's bool/int
    equality must not leak through, found by the JSLT differential
    fuzz), numeric across int/float (1 == 1.0), deep for containers.
    _sort_key is the total order, so key equality IS value equality."""
    return _sort_key(a) == _sort_key(b)


def _type_name(v):
    return {0: "null", 1: "boolean", 2: "number", 3: "string",
            4: "array", 5: "object"}[_type_rank(v)]


def _type_rank(v):
    if v is None:
        return 0
    if isinstance(v, bool):
        return 1
    if isinstance(v, (int, float)):
        return 2
    if isinstance(v, str):
        return 3
    if isinstance(v, list):
        return 4
    return 5


def _arith_nums(op, a, b):
    for v in (a, b):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JqError(
                f"jq: {_type_name(a)} and {_type_name(b)} cannot be "
                f"{'added' if op == '+' else 'operated on with ' + op}")
    return a, b


def _arith(op, a, b):
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            out.update(b)
            return out
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        a, b = _arith_nums(op, a, b)
        return a + b
    if op == "-":
        if isinstance(a, list) and isinstance(b, list):
            return [x for x in a if x not in b]
        a, b = _arith_nums(op, a, b)
        return a - b
    if op == "*":
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                if isinstance(v, dict) and isinstance(out.get(k), dict):
                    out[k] = _arith("*", out[k], v)
                else:
                    out[k] = v
            return out
        # jq: string * n repeats, but n <= 0 yields null (not "")
        if isinstance(a, str) and isinstance(b, (int, float)):
            return a * int(b) if b > 0 else None
        if isinstance(b, str) and isinstance(a, (int, float)):
            return b * int(a) if a > 0 else None
        a, b = _arith_nums(op, a, b)
        return a * b
    if op == "/":
        if isinstance(a, str) and isinstance(b, str):
            return a.split(b)
        a, b = _arith_nums(op, a, b)
        if b == 0:
            raise JqError("jq: division by zero")
        return a / b
    if op == "%":
        # jq modulo is C-style TRUNCATED remainder: -10 % 3 == -1,
        # where Python's floored % gives 2
        a, b = _arith_nums(op, a, b)
        ia, ib = int(a), int(b)
        if ib == 0:
            raise JqError("jq: division by zero")
        return int(math.fmod(ia, ib))
    raise JqError(f"jq: bad arith {op}")


def _path_of(node, inp, env) -> list:
    """Resolve an lvalue expression to a concrete path list."""
    if node[0] == "identity":
        return []
    if node[0] == "index":
        base = _path_of(node[1], inp, env)
        key = _first_or_err(_eval(node[2], inp, env), 'object key')
        return base + [key]
    raise JqError("jq: unsupported assignment target")


def _paths_of(node, inp, env) -> Iterator[list]:
    """Generator form of :func:`_path_of` — yields EVERY concrete path
    a path expression denotes (``.a[]``, ``.a, .b``, pipes, select),
    powering jq's ``path()``, multi-path ``del()`` and ``pick()``."""
    tag = node[0]
    if tag == "identity":
        yield []
    elif tag == "index":
        for base in _paths_of(node[1], inp, env):
            cur = _get_in(inp, base)
            for k in _eval(node[2], inp, env):
                # jq: path(.a) errors on non-object/non-null bases
                # (round-8 fuzz — path(.a?) on [] must yield NOTHING,
                # the `?` suppressing this error, not ["a"])
                if isinstance(k, str):
                    if cur is not None and not isinstance(cur, dict):
                        raise JqError(
                            f"jq: cannot index {_type_name(cur)}"
                            f' with string "{k}"')
                elif isinstance(k, (int, float))                         and not isinstance(k, bool):
                    if cur is not None and not isinstance(cur, list):
                        raise JqError(
                            f"jq: cannot index {_type_name(cur)}"
                            " with number")
                yield base + [k]
    elif tag == "iterate":
        for base in _paths_of(node[1], inp, env):
            cur = _get_in(inp, base)
            if isinstance(cur, list):
                yield from (base + [i] for i in range(len(cur)))
            elif isinstance(cur, dict):
                yield from (base + [k] for k in cur.keys())
            elif cur is not None:
                raise JqError(
                    f"jq: cannot iterate {type(cur).__name__} in path")
    elif tag == "comma":
        yield from _paths_of(node[1], inp, env)
        yield from _paths_of(node[2], inp, env)
    elif tag == "pipe":
        for base in _paths_of(node[1], inp, env):
            sub = _get_in(inp, base)
            for rest in _paths_of(node[2], sub, env):
                yield base + rest
    elif tag == "try":
        try:
            yield from list(_paths_of(node[1], inp, env))
        except JqError:
            pass
    elif tag == "call" and node[1] == "select":
        for c in _eval(node[2][0], inp, env):
            if _truthy(c):
                yield []
    elif tag == "call" and node[1] == "getpath":
        for p in _eval(node[2][0], inp, env):
            yield list(p)
    elif tag == "call" and node[1] == "recurse" and not node[2]:
        # path(..): every path in document order, starting with []
        def walk(base, v):
            yield base
            if isinstance(v, list):
                for i, x in enumerate(v):
                    yield from walk(base + [i], x)
            elif isinstance(v, dict):
                for k, x in v.items():
                    yield from walk(base + [k], x)
        yield from walk([], inp)
    elif tag == "call" and node[1] == "empty" and not node[2]:
        return
    else:
        raise JqError("jq: invalid path expression")


def _delpaths(doc, ps):
    """Delete a set of concrete paths, longest-first so earlier
    deletions can't shift later paths (shared by delpaths/del)."""
    def seg_key(q):
        return (len(q), [(isinstance(x, str), x) for x in q])
    for p in sorted(ps, key=seg_key, reverse=True):
        doc = _del_in(doc, p)
    return doc


def _get_in(doc, path):
    cur = doc
    for k in path:
        if isinstance(cur, dict):
            cur = cur.get(k)
        elif isinstance(cur, list) and isinstance(k, int):
            cur = cur[k] if 0 <= k < len(cur) else None
        else:
            return None
    return cur


def _set_in(doc, path, value):
    if not path:
        return value
    head, rest = path[0], path[1:]
    if isinstance(head, int):
        if isinstance(doc, dict):
            # jq: setpath([0]; v) on an object is an ERROR, never a
            # silent clobber into a list
            raise JqError("jq: cannot index object with number")
        if doc is not None and not isinstance(doc, list):
            # only null auto-vivifies (round-8 fuzz: jq errors on
            # scalars — `false | .a = 1` is an error, not {"a": 1})
            raise JqError(
                f"jq: cannot index {_type_name(doc)} with number")
        out = list(doc) if isinstance(doc, list) else []
        if head < 0:
            # jq setpath normalises negative indices against the
            # CURRENT length; out of range is a jq error, not a crash
            head = len(out) + head
            if head < 0:
                raise JqError(
                    "jq: out of bounds negative array index")
        while len(out) <= head:
            out.append(None)
        out[head] = _set_in(out[head], rest, value)
        return out
    if isinstance(doc, list):
        raise JqError("jq: cannot index array with string")
    if doc is not None and not isinstance(doc, dict):
        raise JqError(
            f'jq: cannot index {_type_name(doc)} with string "{head}"')
    out = dict(doc) if isinstance(doc, dict) else {}
    out[head] = _set_in(out.get(head), rest, value)
    return out


def _del_in(doc, path):
    if not path:
        return None
    head = path[0]
    if isinstance(doc, list) and isinstance(head, int) and head < 0:
        head = len(doc) + head  # jq: negative indices delete from end
    if len(path) == 1:
        # deliberate deviation from the jq binary (locked by the r4
        # review contract, tests/test_jq.py delpaths_mixed_segment_
        # types): a segment that does not match the container type is
        # a tolerated no-op, not an error — delpaths over heterogeneous
        # path sets stays total
        if isinstance(doc, dict):
            out = dict(doc)
            out.pop(head, None)
            return out
        if isinstance(doc, list) and isinstance(head, int):
            return [x for i, x in enumerate(doc) if i != head]
        if doc is None or isinstance(doc, list):
            return doc
        # the tolerance is for CONTAINER/segment mismatches only;
        # deleting a field of a scalar errors like jq (round-8 fuzz)
        raise JqError(
            f"jq: cannot delete field of {_type_name(doc)}")
    if isinstance(doc, dict):
        out = dict(doc)
        if head in out:
            out[head] = _del_in(out[head], path[1:])
        return out
    if isinstance(doc, list) and isinstance(head, int) \
            and 0 <= head < len(doc):
        out = list(doc)
        out[head] = _del_in(out[head], path[1:])
        return out
    return doc


_NO_OUT = object()


def _assign(node, inp, env):
    op, target, rhs = node[1], node[2], node[3]
    if op == "=":
        # all target paths receive each RHS value (RHS evaluated
        # against the ORIGINAL input); one result per RHS output.
        # Paths resolve LAZILY on the first output: jq never touches
        # the target when the RHS stream is empty — `0 | .a = empty`
        # is empty, not an index error (round-8 fuzz)
        paths = None
        for v in _eval(rhs, inp, env):
            if paths is None:
                paths = list(_paths_of(target, inp, env))
            out = inp
            for pth in paths:
                out = _set_in(out, pth, v)
            yield out
    elif op == "|=":
        # jq 1.6+/1.7: the update uses the FIRST output only (ours
        # used every output, keeping the last — round-8 fuzz);
        # an EMPTY update stream deletes the path (1.7 semantics,
        # the map_values contract this engine already documents)
        out = inp
        for pth in list(_paths_of(target, inp, env)):
            cur = _get_in(out, pth)
            v = next(iter(_eval(rhs, cur, env)), _NO_OUT)
            if v is _NO_OUT:
                out = _delpaths(out, [pth])
            else:
                out = _set_in(out, pth, v)
        yield out
    elif op in ("+=", "-="):
        paths = None
        for v in _eval(rhs, inp, env):
            if paths is None:
                paths = list(_paths_of(target, inp, env))
            out = inp
            for pth in paths:
                # read from the RUNNING accumulator, not the original
                # input: jq reduces over paths, so duplicate targets
                # accumulate ({a:1} | (.a,.a) += 1 yields a=3)
                out = _set_in(
                    out, pth, _arith(op[0], _get_in(out, pth), v))
            yield out
    else:
        raise JqError(f"jq: bad assignment {op}")


def _jq_re(pat: str) -> str:
    """jq's Oniguruma named groups are (?<n>...); Python wants
    (?P<n>...) — leave lookbehinds (?<= / (?<! alone."""
    return re.sub(r"\(\?<(?![=!])", "(?P<", pat)


def _re_flags(flags, fn: str):
    """jq (Oniguruma) regex flag letters → (python_flags, global,
    ignore_empty).  Unsupported letters raise instead of silently
    changing the match semantics (jq manual `test/match/.. FLAGS`):
    g global, i case-insensitive, x extended, s single-line
    (Python's default), m dot-matches-newline, n skip empty
    matches, p = s+m."""
    f = 0
    glob = ignore_empty = False
    for c in (flags or ""):
        if c == "i":
            f |= re.IGNORECASE
        elif c == "x":
            f |= re.VERBOSE
        elif c in ("m", "p"):
            f |= re.DOTALL
        elif c == "s":
            pass  # ^ -> \A, $ -> \Z is Python's default mode
        elif c == "g":
            glob = True
        elif c == "n":
            ignore_empty = True
        else:
            raise JqError(f"jq: {fn}: unsupported regex flag {c!r}")
    return f, glob, ignore_empty


def _call(name, args, inp, env: _Env):
    if name in env.funcs:
        entry = env.funcs[name]
        params, body, closure_funcs = entry[0], entry[1], entry[2]
        # a filter-param closure carries the variables of its capture
        # site (4th slot); plain defs fall back to the caller's vars
        closure_vars = entry[3] if len(entry) > 3 else None
        if len(params) != len(args):
            raise JqError(f"jq: {name} expects {len(params)} args")

        def invoke(i, bound_vars, bound_funcs):
            if i == len(params):
                call_env = _Env(
                    bound_funcs,
                    dict(env.vars if closure_vars is None
                         else closure_vars))
                call_env.vars.update(bound_vars)
                yield from _eval(body, inp, call_env)
                return
            pname, a = params[i], args[i]
            if pname.startswith("$"):
                # value param: bind each OUTPUT of the argument (real
                # jq: f(1,2) with def f($a) runs the body per output)
                for v in _eval(a, inp, env):
                    yield from invoke(
                        i + 1, {**bound_vars, pname[1:]: v}, bound_funcs)
            else:
                # filter param: call-by-name — register the argument
                # AST as a zero-arg function closed over the CALLER's
                # funcs and vars, re-evaluated at every reference
                nf = dict(bound_funcs)
                nf[pname] = ([], a, env.funcs, dict(env.vars))
                yield from invoke(i + 1, bound_vars, nf)

        yield from invoke(0, {}, dict(closure_funcs))
        return

    def one(i=0):
        if i >= len(args):
            raise JqError(f"jq: {name} expects {i + 1} argument(s)")
        return _first_or_err(_eval(args[i], inp, env),
                             f"argument {i + 1} of {name}")

    def _num(v):
        # type holes here would surface as raw Python TypeErrors that
        # try/catch and `?` cannot intercept (fuzz-found vs jq 1.6)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JqError(f"jq: {_type_name(v)} cannot be used by {name}")
        return v

    def _arr(v):
        if not isinstance(v, list):
            raise JqError(f"jq: {_type_name(v)} cannot be {name}ed"
                          f" (array required)")
        return v

    def _obj(v):
        if not isinstance(v, dict):
            raise JqError(f"jq: {_type_name(v)} has no entries"
                          f" ({name} requires an object)")
        return v

    def _strv(v):
        # type holes here would surface as raw Python TypeErrors that
        # try/catch and `?` cannot intercept (round-8 fuzz findings on
        # the regex/string builtin family)
        if not isinstance(v, str):
            raise JqError(
                f"jq: {_type_name(v)} cannot be used by {name}"
                " (string required)")
        return v

    if name == "length":
        if isinstance(inp, bool):
            raise JqError("jq: boolean has no length")
        yield 0 if inp is None else (
            abs(inp) if isinstance(inp, (int, float)) else len(inp))
    elif name == "keys":
        if isinstance(inp, dict):
            yield sorted(inp.keys())
        elif isinstance(inp, list):
            yield list(range(len(inp)))
        else:
            raise JqError(f"jq: {_type_name(inp)} has no keys")
    elif name == "has":
        k = one()
        if inp is None:
            yield False
        elif isinstance(inp, dict):
            yield k in inp
        elif isinstance(inp, list):
            if not isinstance(k, int) or isinstance(k, bool):
                raise JqError(
                    "jq: Cannot check whether array has a "
                    + _type_name(k) + " key")
            yield 0 <= k < len(inp)
        else:
            raise JqError(
                f"jq: {_type_name(inp)} has no keys (has)")
    elif name == "del":
        # full path-expression form: del(.a[], .b) deletes every
        # denoted path (delpaths semantics)
        yield _delpaths(inp, list(_paths_of(args[0], inp, env)))
    elif name == "path":
        yield from _paths_of(args[0], inp, env)
    elif name == "pick":
        # jq 1.7: keep ONLY the denoted paths, null elsewhere
        out = None
        for p in _paths_of(args[0], inp, env):
            out = _set_in(out, p, _get_in(inp, p))
        yield out
    elif name == "map":
        out = []
        vals = inp.values() if isinstance(inp, dict) else _arr(inp)
        for x in vals:
            out.extend(_eval(args[0], x, env))
        yield out
    elif name == "map_values":
        # jq: def map_values(f): .[] |= f — each entry updated with
        # f's FIRST output; an empty output deletes the entry
        if isinstance(inp, dict):
            out_o = {}
            for k, v in inp.items():
                r = next(_eval(args[0], v, env), _NO_OUT)
                if r is not _NO_OUT:
                    out_o[k] = r
            yield out_o
        else:
            out_l = []
            for v in _arr(inp):
                r = next(_eval(args[0], v, env), _NO_OUT)
                if r is not _NO_OUT:
                    out_l.append(r)
            yield out_l
    elif name == "select":
        for c in _eval(args[0], inp, env):
            if _truthy(c):
                yield inp
    elif name == "add":
        if inp is None:
            raise JqError("jq: Cannot iterate over null (add)")
        else:
            vals = (list(inp.values()) if isinstance(inp, dict)
                    else _arr(inp))
            if not vals:
                yield None
            else:
                acc = vals[0]
                for x in vals[1:]:
                    acc = _arith("+", acc, x)
                yield acc
    elif name in ("any", "all"):
        # jq reduce semantics: any ORs / all ANDs over EVERY output of
        # the condition (any(gen; f) 2-arity included)
        agg = any if name == "any" else all
        if isinstance(inp, dict):
            vals = inp.values()
        elif len(args) == 2:
            vals = None  # 2-arity never iterates the input
        else:
            vals = _arr(inp)
        if len(args) == 2:
            yield agg(_truthy(c)
                      for v in _eval(args[0], inp, env)
                      for c in _eval(args[1], v, env))
        elif len(args) == 1:
            yield agg(_truthy(c)
                      for x in vals
                      for c in _eval(args[0], x, env))
        else:
            yield agg(_truthy(x) for x in vals)
    elif name == "range":
        # range(n) / range(lo; hi) / range(lo; hi; step) — floats
        # allowed, step respected (the 3-arg form used to ignore it)
        if len(args) == 1:
            lo, hi, step = 0, _num(one()), 1
        elif len(args) == 2:
            lo, hi, step = _num(one(0)), _num(one(1)), 1
        else:
            lo, hi, step = _num(one(0)), _num(one(1)), _num(one(2))
        if step > 0:
            x = lo
            while x < hi:
                yield x
                x += step
        elif step < 0:
            x = lo
            while x > hi:
                yield x
                x += step
        # step == 0: jq loops forever; emitting nothing is the safe
        # bounded behavior for an embedded interpreter
    elif name == "floor":
        yield math.floor(_num(inp))
    elif name == "ceil":
        yield math.ceil(_num(inp))
    elif name == "sqrt":
        v = _num(inp)
        # jq: sqrt of a negative is nan (prints as null), not an error
        yield math.sqrt(v) if v >= 0 else math.nan
    elif name == "fabs":
        yield abs(_num(inp))
    elif name in ("tostring", "tostring_i"):
        v = one() if args else inp
        yield _tostr(v)
    elif name == "tonumber":
        v = one() if args else inp
        if isinstance(v, bool) or not isinstance(v, (int, float, str)):
            raise JqError(
                f"jq: {_type_name(v)} cannot be parsed as a number")
        try:
            f = float(v)
        except ValueError as e:
            raise JqError(f"jq: tonumber: {e}") from None
        yield int(f) if f.is_integer() else f
    elif name == "type":
        yield {0: "null", 1: "boolean", 2: "number", 3: "string",
               4: "array", 5: "object"}[_type_rank(inp)]
    elif name == "not":
        yield not _truthy(inp)
    elif name == "empty":
        return
    elif name == "error":
        raise JqError(_tostr(one() if args else inp))
    elif name == "ascii_downcase":
        if not isinstance(inp, str):
            raise JqError(f"jq: {_type_name(inp)} cannot be downcased")
        yield inp.lower()
    elif name == "ascii_upcase":
        if not isinstance(inp, str):
            raise JqError(f"jq: {_type_name(inp)} cannot be upcased")
        yield inp.upper()
    elif name == "split":
        sep = one()
        if not isinstance(inp, str) or not isinstance(sep, str):
            raise JqError(
                "jq: split input and separator must be strings")
        # jq: splitting the EMPTY string yields [] (Python: [""])
        yield inp.split(sep) if inp else []
    elif name == "join":
        sep = _strv(one())
        vals = inp.values() if isinstance(inp, dict) else _arr(inp)

        def cell(x):
            # jq join: null -> "", scalars -> tostring, containers error
            if x is None:
                return ""
            if isinstance(x, str):
                return x
            if isinstance(x, (list, dict)):
                raise JqError(
                    f"jq: string and {_type_name(x)} cannot be added")
            return _tostr(x)
        yield sep.join(cell(x) for x in vals)
    elif name == "ltrimstr":
        s = one()
        yield inp[len(s):] if isinstance(inp, str) and \
            inp.startswith(s) else inp
    elif name == "rtrimstr":
        s = one()
        yield inp[:-len(s)] if isinstance(inp, str) and s and \
            inp.endswith(s) else inp
    elif name == "startswith":
        arg = one()
        if not isinstance(inp, str) or not isinstance(arg, str):
            raise JqError("jq: startswith() requires string inputs")
        yield inp.startswith(arg)
    elif name == "endswith":
        arg = one()
        if not isinstance(inp, str) or not isinstance(arg, str):
            raise JqError("jq: endswith() requires string inputs")
        yield inp.endswith(arg)
    elif name == "contains":
        # jq's DEEP containment: substring for strings, every element
        # of b contained in some element of a for arrays, per-key
        # recursive for objects, equality for scalars
        def deep_contains(a, b):
            if isinstance(a, str) and isinstance(b, str):
                return b in a
            if isinstance(a, list) and isinstance(b, list):
                return all(any(deep_contains(x, y) for x in a)
                           for y in b)
            if isinstance(a, dict) and isinstance(b, dict):
                return all(k in a and deep_contains(a[k], v)
                           for k, v in b.items())
            return _jq_eq(a, b)
        yield deep_contains(inp, one())
    elif name == "test":
        flags = one(1) if len(args) > 1 else ""
        f, _g, _n = _re_flags(flags, name)
        yield re.search(_jq_re(_strv(one())), _strv(inp), f) \
            is not None
    elif name in ("match", "capture", "scan"):
        _strv(inp)
        pat = _jq_re(_strv(one(0)))
        flags = one(1) if len(args) > 1 else ""
        f, glob, ignore_empty = _re_flags(flags, name)
        glob = name == "scan" or glob

        def mobj(m):
            names = {v: k for k, v in m.re.groupindex.items()}
            return {
                "offset": m.start(), "length": m.end() - m.start(),
                "string": m.group(0),
                "captures": [
                    {"offset": -1 if m.group(i) is None else m.start(i),
                     "length": 0 if m.group(i) is None
                     else m.end(i) - m.start(i),
                     "string": m.group(i),
                     "name": names.get(i)}
                    for i in range(1, (m.re.groups or 0) + 1)
                ],
            }
        matches = (re.finditer(pat, inp, f) if glob else
                   filter(None, [re.search(pat, inp, f)]))
        if ignore_empty:
            matches = (m for m in matches if m.group(0) != "")
        for m in matches:
            if name == "match":
                yield mobj(m)
            elif name == "capture":
                yield {k: v for k, v in m.groupdict().items()}
            else:  # scan: captures array when groups exist, else text
                yield (list(m.groups()) if m.re.groups
                       else m.group(0))
    elif name == "reverse":
        # jq's def is [.[length-1-range(0;length)]]: anything of
        # length 0 (null, 0, "", {}, []) reverses to [], and only a
        # NON-EMPTY non-array errors at the numeric indexing step
        if isinstance(inp, list):
            yield list(reversed(inp))
        elif isinstance(inp, bool):
            raise JqError("jq: boolean has no length")
        elif (inp is None or inp == 0 or
              (isinstance(inp, (str, dict)) and len(inp) == 0)):
            yield []
        else:
            raise JqError(
                f"jq: Cannot index {_type_name(inp)} with number")
    elif name == "sort":
        yield sorted(_arr(inp), key=_sort_key)
    elif name == "sort_by":
        # jq's def sorts by [f] — the array of ALL outputs of the key
        # expression (an empty stream sorts first, no error)
        yield sorted(_arr(inp), key=lambda x: _sort_key(
            list(_eval(args[0], x, env))))
    elif name == "unique":
        # consecutive _sort_key dedupe: json.dumps keys treated 1 and
        # 1.0 as distinct (jq: equal) — the sort is already total, so
        # equal values are adjacent
        out, last = [], None
        for x in sorted(_arr(inp), key=_sort_key):
            k = _sort_key(x)
            if not out or k != last:
                out.append(x)
                last = k
        yield out
    elif name == "min":
        v = _arr(inp)
        yield min(v, key=_sort_key) if v else None
    elif name == "max":
        v = _arr(inp)
        # stable-sort semantics: the LAST maximal element wins
        yield (sorted(v, key=_sort_key)[-1] if v else None)
    elif name == "first":
        if args:
            for v in _eval(args[0], inp, env):
                yield v
                return
        else:
            v = _arr(inp)
            yield v[0] if v else None
    elif name == "last":
        if args:
            # jq: def last(f): reduce f as $x (null; $x);
            lastv = None
            for lastv in _eval(args[0], inp, env):
                pass
            yield lastv
        else:
            v = _arr(inp)
            yield v[-1] if v else None
    elif name == "to_entries":
        # arrays are legal too (keys are indices) — jq's def goes
        # through keys_unsorted
        if isinstance(inp, list):
            yield [{"key": i, "value": v} for i, v in enumerate(inp)]
        else:
            yield [{"key": k, "value": v}
                   for k, v in _obj(inp).items()]
    elif name == "from_entries":
        out = {}
        for e in _arr(inp):
            if not isinstance(e, dict):
                # jq indexes each entry with "key": non-objects error
                # (round-8 fuzz: a list entry crashed with a raw
                # AttributeError)
                raise JqError(
                    f"jq: Cannot index {_type_name(e)}"
                    ' with string "key"')
            k = e.get("key", e.get("k"))
            if not isinstance(k, str):
                raise JqError(f"jq: Cannot use {_type_name(k)} as "
                              "object key")
            out[k] = e.get("value", e.get("v"))
        yield out
    elif name == "with_entries":
        # arrays are legal (to_entries index-key semantics)
        entries = (enumerate(inp) if isinstance(inp, list)
                   else _obj(inp).items())
        out = {}
        for k, v in entries:
            for e in _eval(args[0], {"key": k, "value": v}, env):
                nk = e.get("key", e.get("k"))
                if not isinstance(nk, str):
                    raise JqError(f"jq: Cannot use {_type_name(nk)} "
                                  "as object key")
                out[nk] = e.get("value", e.get("v"))
        yield out
    elif name == "tojson":
        yield _dumps_canon(inp)
    elif name == "fromjson":
        try:
            yield json.loads(_strv(inp))
        except ValueError:
            raise JqError(f"jq: {inp!r} cannot be parsed as JSON")
    elif name in ("group_by", "unique_by", "min_by", "max_by"):
        inp = _arr(inp)

        def key_of(x):
            # [f]: the array of all key outputs (jq's builtin defs)
            return _sort_key(list(_eval(args[0], x, env)))
        if name in ("min_by", "max_by"):
            if not inp:
                yield None
            elif name == "min_by":
                yield min(inp, key=key_of)  # first minimal (stable)
            else:
                yield sorted(inp, key=key_of)[-1]  # LAST maximal
        else:
            # decorate-sort-undecorate: the key expression (a full jq
            # sub-evaluation) runs exactly once per element
            decorated = sorted(((key_of(x), x) for x in inp),
                               key=lambda kv: kv[0])
            groups: list = []
            last_key = object()
            for k, x in decorated:
                if groups and k == last_key:
                    groups[-1].append(x)
                else:
                    groups.append([x])
                    last_key = k
            yield (groups if name == "group_by"
                   else [g[0] for g in groups])
    elif name == "flatten":
        depth = int(one()) if args else 1 << 30

        def flat(v, d):
            out = []
            for x in v:
                if isinstance(x, list) and d > 0:
                    out.extend(flat(x, d - 1))
                else:
                    out.append(x)
            return out
        yield flat(list(inp.values()) if isinstance(inp, dict)
                   else _arr(inp), depth)
    elif name == "abs":
        yield abs(_num(inp))
    elif name == "round":
        # jq rounds half away from zero (C round), not banker's
        v = _num(inp)
        yield (math.floor(v + 0.5) if v >= 0
               else math.ceil(v - 0.5))
    elif name == "pow":
        yield math.pow(one(0), one(1))
    elif name in ("log", "log2", "log10", "exp", "exp2", "exp10"):
        fns = {"log": math.log, "log2": math.log2, "log10": math.log10,
               "exp": math.exp, "exp2": lambda x: 2.0 ** x,
               "exp10": lambda x: 10.0 ** x}
        yield fns[name](inp)
    elif name == "isnan":
        yield isinstance(inp, float) and math.isnan(inp)
    elif name == "isinfinite":
        yield isinstance(inp, float) and math.isinf(inp)
    elif name == "infinite":
        yield math.inf
    elif name == "nan":
        yield math.nan
    elif name in ("trim", "ltrim", "rtrim"):
        if not isinstance(inp, str):
            raise JqError(f"jq: {name} input must be a string")
        yield {"trim": inp.strip, "ltrim": inp.lstrip,
               "rtrim": inp.rstrip}[name]()
    elif name in ("sub", "gsub"):
        if not isinstance(inp, str):
            raise JqError(
                f"jq: {_type_name(inp)} cannot be matched, as it is"
                " not a string")
        pat = _jq_re(_strv(one(0)))
        flags = one(2) if len(args) > 2 else ""
        f, glob, ignore_empty = _re_flags(flags, name)
        matches = list(re.finditer(pat, inp, f))
        if ignore_empty:
            matches = [m for m in matches if m.group(0) != ""]
        if not (name == "gsub" or glob):
            matches = matches[:1]

        # jq evaluates the replacement PER MATCH with the named
        # captures as the input ({name: captured}); a replacement
        # emitting k values fans out into the cartesian product of
        # results, exactly like real jq.  Iterative (a corpus doc can
        # carry 10^5+ matches — recursion would blow the stack), with
        # a join fast path for the ubiquitous single-value replacement.
        rep_lists = []
        for m in matches:
            cap = dict(m.groupdict())
            vals = []
            for r in _eval(args[1], cap, env):
                if not isinstance(r, str):
                    raise JqError(
                        f"jq: {name} replacement must be a string")
                vals.append(r)
            rep_lists.append(vals)
        if all(len(v) == 1 for v in rep_lists):
            parts, last = [], 0
            for m, vals in zip(matches, rep_lists):
                parts.append(inp[last:m.start()])
                parts.append(vals[0])
                last = m.end()
            parts.append(inp[last:])
            yield "".join(parts)
        else:
            acc, last = [""], 0
            for m, vals in zip(matches, rep_lists):
                seg = inp[last:m.start()]
                acc = [p + seg + v for p in acc for v in vals]
                last = m.end()
            tail = inp[last:]
            for p in acc:
                yield p + tail
    elif name == "splits":
        # manual scan, not re.split: Python's split EMITS capture
        # groups into the result, jq never does
        _strv(inp)
        pat = _jq_re(_strv(one(0)))
        flags = one(1) if len(args) > 1 else ""
        f, _g, ignore_empty = _re_flags(flags, name)
        last = 0
        for m in re.finditer(pat, inp, f):
            if ignore_empty and m.group(0) == "":
                continue
            yield inp[last:m.start()]
            last = m.end()
        yield inp[last:]
    elif name == "ascii":
        cp = int(_num(inp))
        if not 0 <= cp < 0x110000:
            raise JqError(f"jq: ascii: codepoint {cp} out of range")
        yield chr(cp)
    elif name == "utf8bytelength":
        yield len(_strv(inp).encode("utf-8"))
    elif name == "explode":
        yield [ord(c) for c in _strv(inp)]
    elif name == "implode":
        if not isinstance(inp, list) or any(
                isinstance(c, bool) or not isinstance(c, int)
                or not 0 <= c < 0x110000
                for c in inp):
            raise JqError("jq: implode input must be an array of"
                          " codepoints")
        yield "".join(chr(c) for c in inp)
    elif name == "todate":
        import datetime as _dt
        yield _dt.datetime.fromtimestamp(
            int(_num(inp)), _dt.timezone.utc)             .strftime("%Y-%m-%dT%H:%M:%SZ")
    elif name == "fromdate":
        import datetime as _dt
        try:
            yield int(_dt.datetime.strptime(
                _strv(inp), "%Y-%m-%dT%H:%M:%SZ")
                .replace(tzinfo=_dt.timezone.utc).timestamp())
        except ValueError:
            raise JqError(
                f'jq: date "{inp}" does not match format'
                ' "%Y-%m-%dT%H:%M:%SZ"')
    elif name == "todateiso8601":
        yield from _call("todate", args, inp, env)
    elif name == "fromdateiso8601":
        yield from _call("fromdate", args, inp, env)
    elif name in ("gmtime", "localtime"):
        # jq broken-down time: [year, month(0-11), day, hour, min,
        # sec (may be fractional), wday, yday(0-based)]
        import time as _time

        t = float(inp)
        st = (_time.gmtime(int(t)) if name == "gmtime"
              else _time.localtime(int(t)))
        # tm_wday is Monday=0; jq uses Sunday=0
        yield [st.tm_year, st.tm_mon - 1, st.tm_mday, st.tm_hour,
               st.tm_min, st.tm_sec + (t - int(t)),
               (st.tm_wday + 1) % 7, st.tm_yday - 1]
    elif name == "mktime":
        import calendar as _cal

        if not isinstance(inp, list) or len(inp) < 6:
            raise JqError("jq: mktime requires a broken-down time array")
        y, mo, d, h, mi, sec = inp[:6]
        yield _cal.timegm((int(y), int(mo) + 1, int(d), int(h),
                           int(mi), int(sec), 0, 0, 0))
    elif name in ("strftime", "strflocaltime"):
        import time as _time

        fmt = one()
        if isinstance(inp, (int, float)):
            st = (_time.gmtime(int(inp)) if name == "strftime"
                  else _time.localtime(int(inp)))
        elif isinstance(inp, list) and len(inp) >= 8:
            y, mo, d, h, mi, sec, wd, yd = inp[:8]
            st = _time.struct_time((
                int(y), int(mo) + 1, int(d), int(h), int(mi),
                int(sec), (int(wd) - 1) % 7, int(yd) + 1, 0))
        else:
            raise JqError(
                f"jq: {name} requires a number or broken-down time")
        yield _time.strftime(fmt, st)
    elif name == "strptime":
        import time as _time

        if not isinstance(inp, str):
            raise JqError("jq: strptime requires a string input")
        st = _time.strptime(inp, one())
        yield [st.tm_year, st.tm_mon - 1, st.tm_mday, st.tm_hour,
               st.tm_min, st.tm_sec, (st.tm_wday + 1) % 7,
               st.tm_yday - 1]
    elif name == "now":
        import time as _time

        yield _time.time()
    # --- SQL-style builtins (jq manual: INDEX/IN + deprecated
    # GROUP_BY/UNIQUE_BY/ANY/ALL aliases) ---
    elif name == "IN":
        if len(args) == 1:
            yield any(_jq_eq(v, inp) for v in _eval(args[0], inp, env))
        else:
            # def IN(src; s): any(src == s; .) — cartesian equality
            vals = list(_eval(args[1], inp, env))
            yield any(_jq_eq(a, b) for a in _eval(args[0], inp, env)
                      for b in vals)
    elif name == "INDEX":
        if len(args) == 1:
            stream, idx = ("iterate", ("identity",)), args[0]
        else:
            stream, idx = args[0], args[1]
        out = {}
        for row in _eval(stream, inp, env):
            for k in _eval(idx, row, env):
                out[k if isinstance(k, str) else _tostr(k)] = row
        yield out
    elif name == "GROUP_BY":
        yield from _call("group_by", args, inp, env)
    elif name == "UNIQUE_BY":
        yield from _call("unique_by", args, inp, env)
    elif name == "ANY":
        yield from _call("any", args, inp, env)
    elif name == "ALL":
        yield from _call("all", args, inp, env)
    elif name in ("objects", "arrays", "booleans", "numbers",
                  "strings", "nulls", "values", "scalars",
                  "iterables"):
        ok = {
            "objects": isinstance(inp, dict),
            "arrays": isinstance(inp, list),
            "booleans": isinstance(inp, bool),
            "numbers": isinstance(inp, (int, float))
            and not isinstance(inp, bool),
            "strings": isinstance(inp, str),
            "nulls": inp is None,
            "values": inp is not None,
            "scalars": not isinstance(inp, (dict, list)),
            "iterables": isinstance(inp, (dict, list)),
        }[name]
        if ok:
            yield inp
    elif name == "recurse":
        if not args:
            def walk(v):
                yield v
                if isinstance(v, dict):
                    for x in v.values():
                        yield from walk(x)
                elif isinstance(v, list):
                    for x in v:
                        yield from walk(x)
            yield from walk(inp)
        else:
            def rec(v):
                yield v
                for nxt in _eval(args[0], v, env):
                    if len(args) > 1 and not any(
                            _truthy(c)
                            for c in _eval(args[1], nxt, env)):
                        continue
                    yield from rec(nxt)
            yield from rec(inp)
    elif name == "limit":
        k = int(one(0))
        if k > 0:
            for i, v in enumerate(_eval(args[1], inp, env)):
                yield v
                if i + 1 >= k:
                    break
    elif name == "until":
        v = inp
        while not any(_truthy(c) for c in _eval(args[0], v, env)):
            v = _first_or_err(_eval(args[1], v, env), 'update expression')
        yield v
    elif name == "while":
        v = inp
        while any(_truthy(c) for c in _eval(args[0], v, env)):
            yield v
            v = _first_or_err(_eval(args[1], v, env), 'update expression')
    elif name == "getpath":
        p = _first_or_err(_eval(args[0], inp, env), 'path expression')
        v = inp
        for seg in p:
            if isinstance(v, dict) and isinstance(seg, str):
                v = v.get(seg)
            elif isinstance(v, list) and isinstance(seg, int):
                v = v[seg] if -len(v) <= seg < len(v) else None
            elif v is None:
                v = None
            else:
                raise JqError(
                    f"jq: Cannot index {_type_name(v)} with "
                    f"{_type_name(seg)} (getpath)")
        yield v
    elif name == "setpath":
        # both arguments are STREAMS; jq iterates the value outermost
        # (round-8 fuzz: setpath(["a"]; range(0;3)) emits 3 results)
        for v in _eval(args[1], inp, env):
            for pth in _eval(args[0], inp, env):
                yield _set_in(inp, pth, v)
    elif name == "delpaths":
        for ps in _eval(args[0], inp, env):
            yield _delpaths(inp, ps)
    elif name in ("paths", "leaf_paths"):
        def pwalk(v, pre):
            if isinstance(v, dict):
                items = v.items()
            elif isinstance(v, list):
                items = enumerate(v)
            else:
                return
            for k, x in items:
                p = pre + [k]
                if name == "paths" or not isinstance(x, (dict, list)):
                    yield p, x
                yield from pwalk(x, p)
        if name == "paths" and args:
            # jq: paths(f) selects paths whose VALUE satisfies f
            for p, x in pwalk(inp, []):
                if any(_truthy(r) for r in _eval(args[0], x, env)):
                    yield p
        else:
            for p, x in pwalk(inp, []):
                if name == "leaf_paths" and (x is None or x is False):
                    continue
                yield p
    elif name == "nth":
        if len(args) == 1:
            # jq: def nth($n): .[$n] — negative indices count from
            # the end, out-of-range is null
            n = int(one())
            if not isinstance(inp, list):
                raise JqError("jq: nth input must be an array")
            i = n if n >= 0 else len(inp) + n
            yield inp[i] if 0 <= i < len(inp) else None
        else:
            n = int(one(0))
            if n < 0:
                raise JqError("jq: nth doesn't support negative indices")
            for i, v in enumerate(_eval(args[1], inp, env)):
                if i == n:
                    yield v
                    break
    elif name == "in":
        container = one()
        yield (inp in container) if isinstance(container, dict) else (
            isinstance(inp, int) and 0 <= inp < len(container))
    elif name == "inside":
        big = one()
        yield from _eval(("call", "contains", [("lit", inp)]), big, env)
    elif name == "env":
        import os as _os

        yield dict(_os.environ)
    elif name == "transpose":
        if not isinstance(inp, list) or not all(
                isinstance(r, list) for r in inp):
            raise JqError("jq: transpose input must be a list of lists")
        if not inp:
            yield []
        else:
            n = max(len(r) for r in inp)
            yield [[r[i] if i < len(r) else None for r in inp]
                   for i in range(n)]
    elif name == "combinations":
        # jq: 0-arity = cartesian product over an array of iterables;
        # combinations(n) = combinations of n COPIES OF THE INPUT
        # (manual: . as $dot | [range(n) | $dot] | combinations)
        import itertools as _it

        rows = [inp] * int(one()) if args else inp
        gens = []
        for x in rows:
            if isinstance(x, list):
                gens.append(x)
            elif isinstance(x, dict):
                gens.append(list(x.values()))
            else:
                raise JqError(
                    f"jq: cannot iterate over {type(x).__name__}")
        for combo in _it.product(*gens):
            yield list(combo)
    elif name == "walk":
        def wapply(v):
            if isinstance(v, dict):
                v = {k: wapply(x) for k, x in v.items()}
            elif isinstance(v, list):
                v = [wapply(x) for x in v]
            return _first_or_err(_eval(args[0], v, env), 'filter')
        yield wapply(inp)
    elif name in ("indices", "index", "rindex"):
        needle = one()
        hits: list = []
        if isinstance(inp, str):
            if not isinstance(needle, str) or not needle:
                hits = []
            else:
                start = 0
                while True:
                    i = inp.find(needle, start)
                    if i < 0:
                        break
                    hits.append(i)
                    start = i + 1
        elif isinstance(inp, list):
            if isinstance(needle, list):
                if needle:
                    n = len(needle)
                    hits = [i for i in range(len(inp) - n + 1)
                            if _jq_eq(inp[i:i + n], needle)]
            else:
                hits = [i for i, x in enumerate(inp)
                        if _jq_eq(x, needle)]
        elif inp is None:
            yield None
            return
        else:
            raise JqError(f"jq: {name} input must be string or array")
        if name == "indices":
            yield hits
        elif name == "index":
            yield hits[0] if hits else None
        else:
            yield hits[-1] if hits else None
    elif name == "repeat":
        # jq: def repeat(f): def _r: f | (., _r); _r; — recurses into
        # EVERY output of a multi-output f, depth-first.  Infinite;
        # callers bound it with limit/first/until.  Iterative stack of
        # generators (recursion blows Python's limit around 1k steps).
        stack = [_eval(args[0], inp, env)]
        while stack:
            advanced = False
            for w in stack[-1]:
                yield w
                stack.append(_eval(args[0], w, env))
                advanced = True
                break
            if not advanced:
                stack.pop()
    elif name in ("debug", "stderr"):
        import sys as _sys

        if name == "debug":
            msg = _first_or_err(_eval(args[0], inp, env),
                                'error message') if args else inp
            _sys.stderr.write(
                json.dumps(["DEBUG:", msg], default=str) + "\n")
        else:
            _sys.stderr.write(json.dumps(inp, default=str))
        yield inp
    elif name == "toarray":
        yield inp if isinstance(inp, list) else [inp]
    elif name in ("halt_error", "halt"):
        if name == "halt":
            raise JqHalt("jq: halt")
        raise JqHalt(inp if isinstance(inp, str)
                     else json.dumps(inp, default=str))
    elif name == "input_line_number":
        yield 0
    elif name == "tostream":
        def tstream(v, pre):
            if isinstance(v, (dict, list)) and len(v) > 0:
                items = (list(v.items()) if isinstance(v, dict)
                         else list(enumerate(v)))
                for k, x in items:
                    yield from tstream(x, pre + [k])
                yield [pre + [items[-1][0]]]
            else:
                yield [pre, v]
        yield from tstream(inp, [])
    elif name == "fromstream":
        acc: list = [None, False]
        for ev in _eval(args[0], inp, env):
            if not isinstance(ev, list) or not ev:
                raise JqError("jq: fromstream event must be a list")
            if len(ev) >= 2:
                p, leaf = ev[0], ev[1]
                if len(p) == 0:
                    yield leaf
                else:
                    acc[0] = _set_in(acc[0], p, leaf)
                    acc[1] = True
            elif len(ev[0]) <= 1 and acc[1]:
                yield acc[0]
                acc[0], acc[1] = None, False
    elif name == "truncate_stream":
        depth = inp
        if not isinstance(depth, int):
            raise JqError("jq: truncate_stream input must be a number")
        for ev in _eval(args[0], None, env):
            if isinstance(ev, list) and ev and len(ev[0]) > depth:
                yield [ev[0][depth:]] + ev[1:]
    else:
        raise JqError(f"jq: unknown function {name}")



def _first_or_err(it, what):
    v = next(it, _NO_OUT)
    if v is _NO_OUT:
        raise JqError(f"jq: {what} produced no output")
    return v


_NO_OUT = object()


def _sort_key(v):
    """A totally-ordered key matching jq's value ordering: type rank
    first, then element-wise recursion for arrays and (sorted keys,
    then values) for objects.  The old json.dumps key compared arrays
    as STRINGS, so e.g. [] sorted after [1.5, 0] ('[' < '1'...) —
    found by the jq-1.6 differential fuzz."""
    tr = _type_rank(v)
    if isinstance(v, list):
        return (tr, [_sort_key(x) for x in v])
    if isinstance(v, dict):
        ks = sorted(v.keys())
        return (tr, [[(3, k) for k in ks],
                     [_sort_key(v[k]) for k in ks]])
    if v is None:
        return (tr, 0)
    if isinstance(v, bool):
        return (tr, int(v))
    return (tr, v)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def compile_jq(
    src: str,
    loader: Callable[[str], str] | None = None,
) -> Callable[[Any], list]:
    """Compile a jq program to ``fn(value) -> [results]``.

    ``loader`` resolves ``import "path" as ns;`` references to source text
    (the reference inlines imports at build time, Common.java:803-846 —
    pass a loader that reads the spec's ``scriptImports``)."""
    _, imports, defs, body = _Parser(_lex(src)).program()

    funcs: dict[str, tuple] = {}
    for path, ns in imports:
        if loader is None:
            raise JqError(f"jq: import {path!r} needs a loader")
        sub = loader(path)
        _, sub_imports, sub_defs, _sub_body = _Parser(
            _lex(sub + "\n.")).program()
        for dname, dparams, dbody in sub_defs:
            funcs[f"{ns}::{dname}"] = (dparams, dbody, funcs)
    for dname, dparams, dbody in defs:
        funcs[dname] = (dparams, dbody, funcs)

    def run(value):
        try:
            return list(_eval(body, value, _Env(funcs, {})))
        except JqHalt as e:
            # surfaced only here: halt bypasses every try/catch/`?`
            raise JqError(str(e))

    return run
