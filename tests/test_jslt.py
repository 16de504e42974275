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
