"""JSLT-subset interpreter tests (reference: $jslt stage/operator
docs/aggregation_stages.md:245-277 + docs/aggregation_operators.md:1176;
custom functions docs/custom_jslt.md; the app8/35-39 reducer corpus
shape)."""

import json

import pytest

from pincette_json_streams_spark.functions.jslt_subset import (
    JsltError,
    compile_jslt,
)


def jslt(src, value, loader=None):
    return compile_jslt(src, loader)(value)


class TestCore:
    def test_paths(self):
        assert jslt(".", {"a": 1}) == {"a": 1}
        assert jslt(".a.b", {"a": {"b": 2}}) == 2
        assert jslt(".a", {}) is None
        assert jslt(".a[0]", {"a": [9, 8]}) == 9
        assert jslt(".a[-1]", {"a": [9, 8]}) == 8
        assert jslt(".a[1:]", {"a": [1, 2, 3]}) == [2, 3]

    def test_pipe_and_object(self):
        out = jslt('.state | {"value": .value + 1, * : .}',
                   {"state": {"value": 4, "_id": "x"}})
        assert out == {"value": 5, "_id": "x"}

    def test_null_value_drops_key(self):
        # the put-reducer idiom: {"_command": null, *: .}
        out = jslt('.command | {"_command": null, * : .}',
                   {"command": {"_command": "put", "v": 1, "_id": "a"}})
        assert out == {"v": 1, "_id": "a"}

    def test_matcher_skips_explicit_keys(self):
        out = jslt('{"a": 99, * : .}', {"a": 1, "b": 2})
        assert out == {"a": 99, "b": 2}

    def test_if_else(self):
        src = 'if (.x > 2) "big" else "small"'
        assert jslt(src, {"x": 5}) == "big"
        assert jslt(src, {"x": 1}) == "small"

    def test_let_and_vars(self):
        assert jslt("let n = .a\n.b + $n", {"a": 1, "b": 2}) == 3

    def test_for_array(self):
        assert jslt("[for (.xs) . * 2]", {"xs": [1, 2]}) == [2, 4]
        assert jslt("[for (.xs) . if (. > 1)]", {"xs": [1, 2, 3]}) == \
            [2, 3]

    def test_for_object(self):
        out = jslt('{for (.o) .key : .value + 1}', {"o": {"a": 1}})
        assert out == {"a": 2}

    def test_object_plus_merge_left_wins(self):
        assert jslt('{"a": 1} + {"a": 2, "b": 3}', None) == \
            {"a": 1, "b": 3}

    def test_string_concat(self):
        assert jslt('"v=" + .x', {"x": 7}) == "v=7"

    def test_defs_and_imports(self):
        assert jslt("def incr(v) $v + 1\nincr(.x)", {"x": 4}) == 5
        loader = {"../common/op.jslt":
                  "def decr(value) $value - 1\n"
                  "def incr(value) $value + 1"}.get
        src = ('import "../common/op.jslt" as op\n'
               '.state | {"value" : op:incr(.value), * : .}')
        assert jslt(src, {"state": {"value": 4, "_id": "a"}},
                    loader) == {"value": 5, "_id": "a"}


class TestBuiltins:
    def test_core_builtins(self):
        assert jslt("size(.a)", {"a": [1, 2]}) == 2
        assert jslt("string(5)", None) == "5"
        assert jslt('number("5")', None) == 5
        assert jslt("not(.a)", {"a": False}) is True
        assert jslt('join(.a, "-")', {"a": ["x", "y"]}) == "x-y"
        assert jslt('split("a,b", ",")', None) == ["a", "b"]
        assert jslt('lowercase("AB")', None) == "ab"
        assert jslt('contains("a", ["a", "b"])', None) is True
        assert jslt('is-object(.)', {}) is True

    def test_custom_functions(self):
        assert jslt('base64-decode(base64-encode("hi"))', None) == "hi"
        assert jslt('uri-encode("a b/c")', None) == "a%20b%2Fc"
        assert jslt('uri-decode("a%20b")', None) == "a b"
        assert jslt('substr("abcdef", 1, 3)', None) == "bc"
        assert jslt('substr("abcdef", 4)', None) == "ef"
        assert jslt('pointer("a", "b")', None) == "/a/b"
        assert jslt('get-pointer(., "/a/b")', {"a": {"b": 7}}) == 7
        assert jslt('get-pointer(., "/x", 42)', {}) == 42
        out = jslt('set-pointer(., "/a/b", 9)', {"a": {"b": 1, "c": 2}})
        assert out == {"a": {"b": 9, "c": 2}}
        assert jslt('parse-iso-instant("2024-03-15T12:30:45Z")',
                    None) == 1710505845
        import uuid as uuid_mod
        uuid_mod.UUID(jslt("uuid()", None))

    def test_unknown_function_raises(self):
        with pytest.raises(JsltError):
            jslt("nope(.)", {})


class TestSparkIntegration:
    def test_jslt_stage(self, spark, people):
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        out = compile_pipeline(
            people.filter("_id='p1'"),
            [{"$jslt": {"script":
                        '{"n": uppercase(.name), "a2": .age * 2}',
                        "schema": "n string, a2 int"}}],
        ).collect()
        assert out[0]["n"] == "ALICE" and out[0]["a2"] == 68

    def test_jslt_expression_operator(self, spark):
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        df = spark.createDataFrame([(5,)], "x int")
        col = compile_expr(
            {"$jslt": {"input": "$x", "script": ". + 1"}}, ctx_for(df))
        assert df.select(col.alias("v")).collect()[0]["v"] == "6"

    def test_jslt_reducer(self, spark):
        from pincette_json_streams_spark.plans.planner import Application

        commands = spark.createDataFrame(
            [("a1", "put", 7, {"sub": "system"}),
             ("a1", "bump", 0, {"sub": "system"})],
            "_id string, _command string, v int, _jwt map<string,string>",
        )
        app = Application(
            {"application": "j", "parts": [
                {"type": "aggregate", "aggregateType": "thing",
                 "commands": {
                     "put": {"jslt":
                             '.command | {"_command": null, * : .}'},
                     "bump": {"jslt":
                              '.state | {"v": .v + 1, * : .}'},
                 }},
            ]},
            {"j-thing-command": commands},
        )
        aggs = [json.loads(r["value"]) for r in
                app.streams["j-thing-aggregate"].collect()]
        by_seq = sorted(aggs, key=lambda a: a["_seq"])
        assert [a["v"] for a in by_seq] == [7, 8]


class TestSpecCompletion:
    """Remaining public-spec surface: capture/replace, matcher
    exclusions, comprehension filters, fallback, time and collection
    built-ins (docs/custom_jslt.md + the JSLT language reference)."""

    def test_capture_named_groups(self):
        out = jslt(r'capture(., "(?P<year>\\d{4})-(?P<month>\\d{2})")',
                   "2024-07-15")
        assert out == {"year": "2024", "month": "07"}
        assert jslt(r'capture(., "(?P<x>z)")', "abc") == {}
        assert jslt(r'capture(.missing, "x")', {}) is None

    def test_replace(self):
        assert jslt(r'replace(., "\\s+", "-")', "a  b c") == "a-b-c"
        assert jslt(r'replace(.missing, "x", "y")', {}) is None

    def test_matcher_exclusions(self):
        out = jslt('{* - b, "c" : .}', {"a": 1, "b": 2, "c": 3, "d": 4})
        assert out == {"a": 1, "d": 4}
        # exclusions compose with explicit keys
        out = jslt('{"a": 99, * - d : .}',
                   {"a": 1, "b": 2, "d": 4})
        assert out == {"a": 99, "b": 2}

    def test_matcher_matrix(self):
        """Round-9 lock for the matcher/fallthrough corner the
        differential fuzz now covers (16k generated cases, 0
        divergences vs our jq and the jq binary): explicit keys shadow
        the matcher EVEN when their value is null (the pair drops but
        the key stays claimed), matched nulls drop, the matcher expr
        runs with the matched VALUE as context, non-object context
        yields only the explicit pairs, and nested templates each
        match against their own context."""
        # null-valued explicit pair still shadows the matched key
        out = jslt('{"a": null, * : .}', {"a": 1, "b": 2})
        assert out == {"b": 2}
        # matched null values drop like explicit nulls
        out = jslt('{* : .}', {"a": None, "b": 2})
        assert out == {"b": 2}
        # matcher expr context = the matched value
        out = jslt('{* : . + 10}', {"a": 1, "b": 2})
        assert out == {"a": 11, "b": 12}
        # a matcher value transformed TO null drops the key
        out = jslt('{* : .x}', {"a": {"x": 5}, "b": {"y": 1}})
        assert out == {"a": 5}
        # non-object context: matcher contributes nothing
        assert jslt('{"k": 1, * : .}', [1, 2]) == {"k": 1}
        assert jslt('{"k": 1, * : .}', None) == {"k": 1}
        # nested templates: inner matcher sees the INNER context
        out = jslt('{"inner": (.a | {* : .}), * - a : .}',
                   {"a": {"x": 1}, "b": 2})
        assert out == {"inner": {"x": 1}, "b": 2}

    def test_object_for_with_filter(self):
        out = jslt('{for (.) .key : .value if (.value > 1)}',
                   {"a": 1, "b": 2, "c": 3})
        assert out == {"b": 2, "c": 3}

    def test_object_for_duplicate_key_null_omission(self):
        """Null-valued PAIRS are omitted BEFORE insertion (JSLT spec),
        so a later null duplicate cannot erase an earlier value, while
        a later non-null duplicate overwrites — the corner the
        object-for fuzz grammar caught in its own jq renderer (which
        dropped nulls AFTER last-wins from_entries)."""
        assert jslt('{for ([7, null]) "s" : .}', None) == {"s": 7}
        assert jslt('{for ([null, 7]) "s" : .}', None) == {"s": 7}
        assert jslt('{for ([7, 8]) "s" : .}', None) == {"s": 8}
        assert jslt('{for ([null]) "s" : .}', None) == {}

    def test_fallback(self):
        assert jslt('fallback(.a, .b, "dflt")', {"b": 5}) == 5
        assert jslt('fallback(.a, .b)', {}) is None
        assert jslt('fallback(.a, "x")', {"a": 0}) == 0  # 0 has a value

    def test_number_with_fallback_and_binary_minmax(self):
        assert jslt('number(., -1)', "no") == -1
        assert jslt('number(.)', "2.5") == 2.5
        assert jslt('min(3, 7)', None) == 3
        assert jslt('max(3, 7)', None) == 7
        assert jslt('mod(7, 3)', None) == 1

    def test_collections(self):
        assert jslt('flatten(.)', [1, [2, [3, 4]], 5]) == [1, 2, 3, 4, 5]
        assert jslt('all(.)', [True, 1, "x"]) is True
        assert jslt('all(.)', [True, 0]) is False
        assert jslt('any(.)', [False, 0, 2]) is True
        assert jslt('zip(.a, .b)', {"a": [1, 2], "b": ["x", "y"]}) == \
            [[1, "x"], [2, "y"]]
        assert jslt('zip-with-index(.)', ["a", "b"]) == \
            [{"index": 0, "value": "a"}, {"index": 1, "value": "b"}]
        assert jslt('index-of(., 7)', [5, 7, 9]) == 1
        assert jslt('index-of(., 8)', [5, 7, 9]) == -1
        assert jslt('array(.)', {"a": 1}) == [{"key": "a", "value": 1}]

    def test_json_roundtrip(self):
        assert jslt('from-json(.)', '{"a": 1}') == {"a": 1}
        assert jslt('from-json(., "bad")', "{nope") == "bad"
        assert json.loads(jslt('to-json(.)', {"a": [1, 2]})) == \
            {"a": [1, 2]}

    def test_time_functions(self):
        t = jslt('parse-time(., "yyyy-MM-dd\'T\'HH:mm:ss")',
                 "1970-01-02T00:00:00")
        assert t == 86400.0
        assert jslt('format-time(., "yyyy-MM-dd")', 86400) == "1970-01-02"
        assert jslt('parse-time(., "yyyy", -1)', "junk") == -1
        now = jslt("now()", None)
        assert isinstance(now, float) and now > 1e9

    def test_hashes_and_types(self):
        assert jslt('sha256-hex(.)', "abc") == (
            "ba7816bf8f01cfea414140de5dae2223"
            "b00361a396177a9cb410ff61f20015ad")
        h1 = jslt("hash-int(.)", {"b": 1, "a": [2]})
        h2 = jslt("hash-int(.)", {"a": [2], "b": 1})
        assert h1 == h2 and isinstance(h1, int) and h1 >= 0
        assert jslt("is-integral(.)", 4.0) is True
        assert jslt("is-decimal(.)", 4.5) is True
        assert jslt("is-integral(.)", "4") is False


class TestRound4Builtins:
    """parse-url + random (JSLT language reference) — the last two
    builtins from the published function list."""

    def test_parse_url_full(self):
        out = jslt(
            'parse-url(.)',
            "https://u:pw@example.com:8443/a/b?x=1&x=2&y=#frag")
        assert out == {
            "scheme": "https", "userinfo": "u:pw",
            "host": "example.com", "port": 8443, "path": "/a/b",
            "query": "x=1&x=2&y=",
            "parameters": {"x": ["1", "2"], "y": [""]},
            "fragment": "frag",
        }

    def test_parse_url_minimal(self):
        assert jslt('parse-url(.)', "http://example.com") == {
            "scheme": "http", "host": "example.com"}
        assert jslt('parse-url(.)', None) is None

    def test_random_in_unit_interval(self):
        v = jslt('random()', None)
        assert isinstance(v, float) and 0.0 <= v < 1.0


class TestJavaNamedGroups:
    def test_capture_java_syntax(self):
        # JSLT is Java-regex flavored: (?<name>...) must work
        assert jslt('capture(., "(?<u>[a-z]+)@(?<d>[a-z.]+)")',
                    "me@ex.io") == {"u": "me", "d": "ex.io"}
        # Python spelling keeps working too
        assert jslt('capture(., "(?P<x>[0-9]+)")', "a42") == {"x": "42"}


class TestParseUrlEdge:
    def test_out_of_range_port_is_omitted(self):
        out = jslt('parse-url(.)', "http://host:99999/x")
        assert out["host"] == "host" and "port" not in out


class TestRound5Additions:
    def test_sha512_hex(self):
        import hashlib
        assert jslt('sha512-hex("x")', {}) == \
            hashlib.sha512(b"x").hexdigest()

    def test_print_passthrough(self):
        assert jslt('print(.a)', {"a": 7}) == 7
        assert jslt('print(.a, "v: ")', {"a": 7}) == 7


class TestForArrayObjectInput:
    def test_object_input_converts_to_kv_pairs(self):
        """JSLT reference: array-for over an object iterates
        {"key", "value"} objects, exactly like the object-for."""
        from pincette_json_streams_spark.functions.jslt_subset import (
            compile_jslt,
        )
        assert compile_jslt('[for (.) .key]')({"a": 1, "b": 2}) == \
            ["a", "b"]
        assert compile_jslt('[for (.) .value]')({"a": 1, "b": 2}) == \
            [1, 2]
        # arrays unchanged
        assert compile_jslt('[for (.) . * 2]')([1, 2]) == [2, 4]


class TestArithmeticStrictness:
    def test_non_numeric_mul_sub_div_error(self):
        import pytest

        from pincette_json_streams_spark.functions.jslt_subset import (
            JsltError, compile_jslt,
        )
        for src in ('5 * "x"', '"x" - 1', 'true * 2', '[1] / 2'):
            with pytest.raises(JsltError):
                compile_jslt(src)(None)
        # null propagation and numeric paths unchanged
        assert compile_jslt('null * 2')(None) is None
        assert compile_jslt('3 * 2')(None) == 6
        assert compile_jslt('7 / 2')(None) == 3.5


class TestTypeStrictEquality:
    """jslt-differential-fuzz findings (round 8): booleans are their
    own type in JSLT equality — Python's True == 1 must not leak."""

    def test_bool_number_distinct(self):
        from pincette_json_streams_spark.functions.jslt_subset import (
            compile_jslt,
        )
        assert compile_jslt('true == 1')(None) is False
        assert compile_jslt('false == 0')(None) is False
        assert compile_jslt('true != 1')(None) is True
        assert compile_jslt('[true] == [1]')(None) is False
        assert compile_jslt('1 == 1.0')(None) is True
        assert compile_jslt('"1" == 1')(None) is False

    def test_membership_type_strict(self):
        from pincette_json_streams_spark.functions.jslt_subset import (
            compile_jslt,
        )
        assert compile_jslt('contains(true, [1, 2])')(None) is False
        assert compile_jslt('contains(1, [true, 1.0])')(None) is True
        assert compile_jslt('index-of([true, 1], 1)')(None) == 1
        assert compile_jslt('index-of([1], true)')(None) == -1


class TestHostileTypeMatrix:
    """Round-8 sweep: every builtin / operator shape crossed with every
    hostile literal must yield a VALUE or a catchable JsltError — never
    a raw Python exception (which would kill a Spark executor task
    with an opaque stack instead of surfacing through try/fallback).
    The same sweep found 329 TypeError/AttributeError holes before the
    null-propagation tables and operator type guards."""

    HOSTILE = ['null', 'true', '0', '-3', '2.5', '""', '"x y"',
               '[]', '[1, "a"]', '{}', '{"a": 1}']
    SHAPES = [
        "size(X)", "string(X)", "number(X, 0)", "boolean(X)", "not(X)",
        "round(X)", "floor(X)", "ceiling(X)", "lowercase(X)",
        "uppercase(X)", "trim(X)", 'split(X, ",")', 'split("a,b", X)',
        'join(X, "-")', "join([1,2], X)", "contains(X, [1])",
        "contains(1, X)", "flatten(X)", "sum(X)", "min(X, 1)",
        "max(X, 1)", "mod(X, 2)", "mod(7, X)", 'test(X, "a")',
        'test("a", X)', 'capture(X, "(?<x>a)")', 'replace(X, "a", "b")',
        'replace("aa", X, "b")', 'starts-with(X, "a")',
        'starts-with("ab", X)', 'ends-with(X, "a")', "is-integral(X)",
        'get-key(X, "a")', 'get-key({"a":1}, X)', "error(X)",
        "array(X)", "from-json(X)", "to-json(X)", "sha256-hex(X)",
        "hash-int(X)", "zip(X, [1])", "zip([1], X)",
        "zip-with-index(X)", "index-of(X, 1)",
        'parse-time(X, "yyyy")', 'format-time(X, "yyyy")',
        "parse-url(X)", "fallback(X, 1)", "substr(X, 0, 2)",
        'substr("abc", X, 2)', "base64-encode(X)", "base64-decode(X)",
        "uri-encode(X)", "uri-decode(X)", 'get-pointer(X, "/a")',
        "parse-iso-instant(X)", "all(X)", "any(X)",
        "X + 1", "1 + X", "X * 2", "X - 1", "X / 2", "2 / X",
        "X < 1", "X and true", "[for (X) .]",
        '{for (X) string(.key // 0): .value}', "X[0]", "X[0:2]",
        ".a[X]",
    ]

    def test_no_raw_exceptions(self):
        import itertools

        from pincette_json_streams_spark.functions.jslt_subset import (
            JsltError, compile_jslt,
        )
        crashes = []
        for tpl, lit in itertools.product(self.SHAPES, self.HOSTILE):
            prog = tpl.replace("X", lit)
            try:
                compile_jslt(prog)({"a": [1, 2]})
            except (JsltError, RecursionError):
                pass
            except Exception as e:  # noqa: BLE001 — a crash IS a bug
                crashes.append((prog, f"{type(e).__name__}: {e}"))
        assert not crashes, crashes[:10]

    def test_null_propagation_conventions(self):
        from pincette_json_streams_spark.functions.jslt_subset import (
            compile_jslt,
        )
        # JSLT's documented rule: string/number functions return null
        # on null input; the boolean predicates return false
        for prog in ("round(null)", "lowercase(null)", "trim(null)",
                     'replace(null, "a", "b")', "min(null, 1)",
                     "mod(null, 2)", "[for (null) .]", "-null",
                     "null[0:2]"):
            assert compile_jslt(prog)(None) is None, prog
        for prog in ('test(null, "a")', 'starts-with(null, "a")',
                     'ends-with(null, "a")'):
            assert compile_jslt(prog)(None) is False, prog
