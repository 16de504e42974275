"""JQ-subset interpreter tests (reference: docs/index.md:11 — JQ is the
preferred script language; $jq stage docs/aggregation_stages.md:245-277,
operator docs/aggregation_operators.md:1163; reducer wiring
App.java:793-812)."""

import json

import pytest

from pincette_json_streams_spark.functions.jq_subset import (
    JqError,
    compile_jq,
)


def jq(src, value, loader=None):
    return compile_jq(src, loader)(value)


class TestCore:
    def test_identity_and_paths(self):
        assert jq(".", {"a": 1}) == [{"a": 1}]
        assert jq(".a", {"a": 1}) == [1]
        assert jq(".a.b", {"a": {"b": 2}}) == [2]
        assert jq(".a", {}) == [None]
        assert jq(".[1]", [10, 20, 30]) == [20]
        assert jq(".[-1]", [10, 20]) == [20]
        assert jq(".[1:3]", [0, 1, 2, 3]) == [[1, 2]]

    def test_iteration_and_pipe(self):
        assert jq(".[]", [1, 2, 3]) == [1, 2, 3]
        assert jq(".a[] | . * 2", {"a": [1, 2]}) == [2, 4]
        assert jq(".[] | .x", [{"x": 1}, {"x": 2}]) == [1, 2]

    def test_comma_stream(self):
        assert jq(".a, .b", {"a": 1, "b": 2}) == [1, 2]

    def test_construction(self):
        assert jq("{x: .a, y: 2}", {"a": 1}) == [{"x": 1, "y": 2}]
        assert jq("[.a, .b]", {"a": 1, "b": 2}) == [[1, 2]]
        assert jq("{a}", {"a": 5, "b": 6}) == [{"a": 5}]
        assert jq('{("k" + "1"): 2}', None) == [{"k1": 2}]

    def test_arithmetic_jq_semantics(self):
        assert jq(".a + .b", {"a": {"x": 1}, "b": {"y": 2}}) == \
            [{"x": 1, "y": 2}]
        assert jq(".a + .b", {"a": [1], "b": [2]}) == [[1, 2]]
        assert jq('"a" + "b"', None) == ["ab"]
        assert jq(".a - .b", {"a": [1, 2, 3], "b": [2]}) == [[1, 3]]
        assert jq("5 % 3", None) == [2]
        assert jq('"a,b,c" / ","', None) == [["a", "b", "c"]]

    def test_null_plus(self):
        assert jq(".missing + 1", {}) == [1]
        assert jq("null + {a: 1}", None) == [{"a": 1}]

    def test_conditionals(self):
        src = 'if .x > 2 then "big" elif .x > 0 then "small" else "neg" end'
        assert jq(src, {"x": 5}) == ["big"]
        assert jq(src, {"x": 1}) == ["small"]
        assert jq(src, {"x": -1}) == ["neg"]

    def test_alternative(self):
        assert jq(".a // 42", {}) == [42]
        assert jq(".a // 42", {"a": 7}) == [7]

    def test_variables(self):
        assert jq(".a as $x | .b + $x", {"a": 1, "b": 2}) == [3]

    def test_reduce(self):
        assert jq("reduce .[] as $x (0; . + $x)", [1, 2, 3, 4]) == [10]

    def test_assignment(self):
        assert jq(".a = 5", {"a": 1, "b": 2}) == [{"a": 5, "b": 2}]
        assert jq(".a.b = 1", {}) == [{"a": {"b": 1}}]
        assert jq(".a |= . + 1", {"a": 1}) == [{"a": 2}]
        assert jq(".a += 2", {"a": 1}) == [{"a": 3}]

    def test_string_interpolation(self):
        assert jq('"v=\\(.x + 1)"', {"x": 1}) == ["v=2"]

    def test_try_optional(self):
        assert jq(".a?", 5) == []
        with pytest.raises(JqError):
            jq(".a", 5)


class TestBuiltins:
    def test_collection_fns(self):
        assert jq("length", [1, 2, 3]) == [3]
        assert jq("length", "abcd") == [4]
        assert jq("keys", {"b": 1, "a": 2}) == [["a", "b"]]
        assert jq('has("a")', {"a": 1}) == [True]
        assert jq("map(. * 2)", [1, 2]) == [[2, 4]]
        assert jq(".[] | select(. > 1)", [1, 2, 3]) == [2, 3]
        assert jq("add", [1, 2, 3]) == [6]
        assert jq("reverse", [1, 2]) == [[2, 1]]
        assert jq("sort", [3, 1, 2]) == [[1, 2, 3]]
        assert jq("sort_by(.x)", [{"x": 2}, {"x": 1}]) == \
            [[{"x": 1}, {"x": 2}]]
        assert jq("unique", [2, 1, 2]) == [[1, 2]]
        assert jq("min, max", [3, 1, 2]) == [1, 3]

    def test_del(self):
        assert jq("del(.b)", {"a": 1, "b": 2}) == [{"a": 1}]
        assert jq(".command | del(._command)",
                  {"command": {"_command": "put", "v": 1}}) == [{"v": 1}]

    def test_strings(self):
        assert jq("ascii_upcase", "ab") == ["AB"]
        assert jq('split(",")', "a,b") == [["a", "b"]]
        assert jq('join("-")', ["a", "b"]) == ["a-b"]
        assert jq('ltrimstr("pre")', "prefix") == ["fix"]
        assert jq('test("\\\\d+")', "a1") == [True]
        assert jq("tostring", 5) == ["5"]
        assert jq("tonumber", "5.5") == [5.5]

    def test_entries(self):
        assert jq("to_entries", {"a": 1}) == [[{"key": "a", "value": 1}]]
        assert jq("from_entries",
                  [{"key": "a", "value": 1}]) == [{"a": 1}]

    def test_type_and_range(self):
        assert jq("type", [1]) == ["array"]
        assert jq("[range(3)]", None) == [[0, 1, 2]]
        assert jq("empty", 1) == []


class TestDefsAndImports:
    def test_def(self):
        assert jq("def incr: . + 1; .x | incr", {"x": 4}) == [5]

    def test_def_with_params(self):
        assert jq("def addn($n): . + $n; .x | addn(10)", {"x": 4}) == [14]

    def test_import_namespace(self):
        # the reference's app38 reducer shape
        # (src/test/resources/app38/reducers/plus.jq)
        loader = {"../common/op.jq":
                  "def decr: . - 1;\ndef incr: . + 1;"}.get
        src = ('import "../common/op.jq" as op;\n'
               '.state + { "value" : .state.value | op::incr }')
        out = jq(src, {"state": {"value": 4, "_id": "a"},
                       "command": {}}, loader)
        assert out == [{"value": 5, "_id": "a"}]


class TestSparkIntegration:
    def test_jq_expression_operator(self, spark):
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        df = spark.createDataFrame([(5,)], "x int")
        col = compile_expr(
            {"$jq": {"input": "$x", "script": ". + 1"}}, ctx_for(df))
        assert df.select(col.alias("v")).collect()[0]["v"] == "6"

    def test_jq_stage(self, spark, people):
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        out = compile_pipeline(
            people.filter("_id='p1'"),
            [{"$jq": "{_id, shout: (.name | ascii_upcase)}"}],
        ).collect()
        assert json.loads(out[0]["value"]) == {"_id": "p1",
                                               "shout": "ALICE"}
        assert out[0]["_id"] == "p1"

    def test_jq_stage_typed(self, spark, people):
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        out = compile_pipeline(
            people.filter("_id='p2'"),
            [{"$jq": {"script": "{n: (.age + 1)}",
                      "schema": "n int"}}],
        ).collect()
        assert out[0]["n"] == 29

    def test_jq_reducer_in_aggregate(self, spark):
        from pincette_json_streams_spark.plans.planner import Application

        commands = spark.createDataFrame(
            [("a1", "plus", {"sub": "system"}),
             ("a1", "plus", {"sub": "system"}),
             ("a1", "minus", {"sub": "system"})],
            "_id string, _command string, _jwt map<string,string>",
        )
        app = Application(
            {"application": "calc", "parts": [
                {"type": "aggregate", "aggregateType": "counter",
                 "commands": {
                     "plus": ".state + {value: ((.state.value // 0) + 1)}",
                     "minus": ".state + {value: ((.state.value // 0) - 1)}",
                 }},
            ]},
            {"calc-counter-command": commands},
        )
        aggs = [json.loads(r["value"]) for r in
                app.streams["calc-counter-aggregate"].collect()]
        assert [a["value"] for a in sorted(aggs,
                                           key=lambda a: a["_seq"])] == \
            [1, 2, 1]


class TestBuiltins17:
    """jq 1.6/1.7 builtin batch added in round 4 (public jq manual) —
    the long tail a production jq script port actually hits."""

    def test_json_roundtrip(self):
        assert jq('tojson', {"a": [1, "x"]}) == ['{"a":[1,"x"]}']
        assert jq('fromjson', '{"a":1}') == [{"a": 1}]
        assert jq('.a | tojson | fromjson', {"a": [1]}) == [[1]]

    def test_group_unique_min_max_by(self):
        data = [{"k": "a", "v": 1}, {"k": "b", "v": 2},
                {"k": "a", "v": 3}]
        assert jq('group_by(.k) | map(length)', data) == [[2, 1]]
        assert jq('unique_by(.k) | map(.v)', data) == [[1, 2]]
        assert jq('min_by(.v).v', data) == [1]
        assert jq('max_by(.v).v', data) == [3]
        assert jq('min_by(.v)', []) == [None]

    def test_flatten(self):
        assert jq('flatten', [1, [2, [3]]]) == [[1, 2, 3]]
        assert jq('flatten(1)', [1, [2, [3]]]) == [[1, 2, [3]]]

    def test_math(self):
        assert jq('abs', -3) == [3]
        assert jq('round', 2.5) == [3]
        assert jq('round', -2.5) == [-3]          # away from zero
        assert jq('pow(2; 10)', None) == [1024.0]
        assert jq('log10', 1000.0) == [3.0]
        assert jq('exp2', 3.0) == [8.0]
        assert jq('isnan', float("nan")) == [True]
        assert jq('isinfinite', float("inf")) == [True]
        assert jq('infinite > 1e308', None) == [True]

    def test_strings(self):
        assert jq('trim', "  x ") == ["x"]
        assert jq('ltrim', " x ") == ["x "]
        assert jq('rtrim', " x ") == [" x"]
        assert jq('sub("a"; "b")', "banana") == ["bbnana"]
        assert jq('gsub("a"; "b")', "banana") == ["bbnbnb"]
        assert jq('gsub("[0-9]+"; "#")', "a1b22c") == ["a#b#c"]
        assert jq('[splits(", *")]', "a, b,c") == [["a", "b", "c"]]
        assert jq('explode', "ab") == [[97, 98]]
        assert jq('implode', [97, 98]) == ["ab"]
        assert jq('ascii', 65) == ["A"]

    def test_dates(self):
        assert jq('todate', 0) == ["1970-01-01T00:00:00Z"]
        assert jq('fromdate', "2001-09-09T01:46:40Z") == [1000000000]
        assert jq('todate | fromdate', 1000000000) == [1000000000]

    def test_type_filters(self):
        vals = [1, "a", None, [2], {"b": 3}, True]
        assert jq('[.[] | numbers]', vals) == [[1]]
        assert jq('[.[] | strings]', vals) == [["a"]]
        assert jq('[.[] | nulls]', vals) == [[None]]
        assert jq('[.[] | booleans]', vals) == [[True]]
        assert jq('[.[] | arrays]', vals) == [[[2]]]
        assert jq('[.[] | objects]', vals) == [[{"b": 3}]]
        assert jq('[.[] | scalars]', vals) == [[1, "a", None, True]]

    def test_recurse(self):
        doc = {"a": {"b": 1}, "c": [2]}
        assert jq('[recurse | numbers]', doc) == [[1, 2]]
        assert jq('[recurse(if . < 8 then . * 2 else empty end)]',
                  1) == [[1, 2, 4, 8]]

    def test_limit_until_while(self):
        assert jq('[limit(3; range(100))]', None) == [[0, 1, 2]]
        assert jq('[limit(0; range(5))]', None) == [[]]
        assert jq('until(. > 10; . * 2)', 1) == [16]
        assert jq('[while(. < 10; . * 3)]', 1) == [[1, 3, 9]]

    def test_paths(self):
        doc = {"a": {"b": 1}, "c": [9]}
        assert jq('[paths]', doc) == \
            [[["a"], ["a", "b"], ["c"], ["c", 0]]]
        assert jq('[leaf_paths]', doc) == [[["a", "b"], ["c", 0]]]
        assert jq('getpath(["a", "b"])', doc) == [1]
        assert jq('getpath(["a", "z"])', doc) == [None]
        assert jq('setpath(["a", "b"]; 7) | .a.b', doc) == [7]
        assert jq('delpaths([["a", "b"], ["c"]])', doc) == [{"a": {}}]

    def test_with_entries(self):
        assert jq('with_entries(.value += 1)', {"a": 1, "b": 2}) == \
            [{"a": 2, "b": 3}]


class TestRegexFamily:
    """jq regex builtins: match/capture/scan and test flags."""

    def test_test_flags(self):
        assert jq('test("ABC"; "i")', "xabcx") == [True]
        assert jq('test("ABC")', "xabcx") == [False]

    def test_match(self):
        m = jq('match("a(?<mid>[0-9]+)b")', "xa42bx")[0]
        assert m["offset"] == 1 and m["length"] == 4
        assert m["string"] == "a42b"
        assert m["captures"][0] == {"offset": 2, "length": 2,
                                    "string": "42", "name": "mid"}
        assert jq('[match("[0-9]"; "g") | .string]', "a1b2") == \
            [["1", "2"]]

    def test_capture(self):
        assert jq('capture("(?<u>[a-z]+)@(?<d>[a-z.]+)")',
                  "mail me@ex.io now") == [{"u": "me", "d": "ex.io"}]

    def test_scan(self):
        assert jq('[scan("[0-9]+")]', "a12b345") == [["12", "345"]]
        assert jq('[scan("([a-z])([0-9])")]', "a1 b2") == \
            [[["a", "1"], ["b", "2"]]]


class TestReviewRegressionsR4:
    """Round-4 adversarial-review locks."""

    def test_named_groups_in_sub_gsub_test_splits(self):
        # Oniguruma (?<n>...) must translate in EVERY regex builtin
        assert jq('sub("(?<a>b)"; "X")', "abc") == ["aXc"]
        assert jq('gsub("(?<d>[0-9])"; "#")', "a1b2") == ["a#b#"]
        assert jq('test("(?<a>b)")', "abc") == [True]
        # capture groups are NOT emitted into the pieces (unlike
        # Python's re.split)
        assert jq('[splits("(?<s>,)")]', "a,b") == [["a", "b"]]

    def test_gsub_null_flags(self):
        assert jq('gsub("b"; "X"; null)', "abcb") == ["aXcX"]
        assert jq('sub("b"; "X"; null)', "abcb") == ["aXcb"]

    def test_delpaths_mixed_segment_types(self):
        assert jq('delpaths([["a"], [0]])', {"a": 1}) == [{}]
        assert jq('delpaths([["a", 0], ["b"]])',
                  {"a": [9, 8], "b": 2}) == [{"a": [8]}]


class TestReviewRegressionsR5:
    """Round-5 ADVICE locks: per-match replacement + regex flags."""

    def test_sub_replacement_sees_captures(self):
        # jq's standard idiom: the replacement is evaluated PER MATCH
        # with {name: captured} as the input
        assert jq('sub("(?<x>b)"; "[" + .x + "]")', "abc") == ["a[b]c"]
        assert jq('gsub("(?<v>[aeiou])"; "<" + .v + ">")',
                  "hello") == ["h<e>ll<o>"]

    def test_sub_replacement_fanout(self):
        # a replacement emitting k values fans out (real jq behavior)
        assert jq('sub("b"; "x", "y")', "ab") == ["ax", "ay"]

    def test_sub_replacement_backslash_literal(self):
        # backslashes in the replacement are literal, never \1 refs
        assert jq(r'sub("b"; "\\d")', "ab") == ["a\\d"]

    def test_splits_honours_flags(self):
        assert jq('[splits("a"; "i")]', "bAc") == [["b", "c"]]
        assert jq('[splits("A")]', "bAc") == [["b", "c"]]

    def test_flags_extended_and_dotall(self):
        # x: extended (whitespace ignored); m: dot matches newline
        assert jq('test("b c"; "x")', "abc") == [True]
        assert jq('test("a.c"; "m")', "a\nc") == [True]
        assert jq('test("a.c")', "a\nc") == [False]

    def test_unsupported_flag_raises(self):
        with pytest.raises(JqError):
            jq('test("a"; "q")', "abc")
        with pytest.raises(JqError):
            jq('[splits("a"; "q")]', "bac")
        with pytest.raises(JqError):
            jq('gsub("a"; "x"; "q")', "bac")


class TestFormatStrings:
    """jq @format strings + $__loc__ (jq manual 'Format strings and
    escaping')."""

    def test_formats_as_filters(self):
        assert jq('@base64', "hello") == ["aGVsbG8="]
        assert jq('@base64d', "aGVsbG8=") == ["hello"]
        assert jq('@uri', "a b&c") == ["a%20b%26c"]
        assert jq('@html', "<b>&") == ["&lt;b&gt;&amp;"]
        assert jq('@text', 42) == ["42"]
        assert jq('@json', {"a": [1, "x"]}) == ['{"a":[1,"x"]}']
        assert jq('@sh', "it's") == ["'it'\\''s'"]

    def test_csv_tsv_rows(self):
        assert jq('@csv', [1, 'a,"b"', None, True]) == \
            ['1,"a,""b""",,true']
        assert jq('@tsv', ["a\tb", 2, None]) == ["a\\tb\t2\t"]
        with pytest.raises(JqError):
            jq('@csv', "not an array")
        with pytest.raises(JqError):
            jq('@csv', [[1]])

    def test_format_prefixed_strings_escape_only_interpolations(self):
        # literal segments stay raw; \(...) goes through the format
        assert jq('@uri "https://x?q=\\(.q)&n=\\(.n)"',
                  {"q": "a b", "n": 2}) == ["https://x?q=a%20b&n=2"]
        assert jq('@base64 "tok \\(.u)"', {"u": "x"}) == ["tok eA=="]

    def test_loc(self):
        assert jq('$__loc__', None) == [{"file": "<stdin>", "line": 1}]
        assert jq('.a\n| $__loc__', {"a": 1}) == \
            [{"file": "<stdin>", "line": 2}]

    def test_unknown_format_raises(self):
        with pytest.raises(JqError):
            jq('@nope', "x")


class TestReviewRegressionsR5b:
    """Second round-5 review batch."""

    def test_gsub_many_matches_no_recursion_limit(self):
        # 100k matches must not blow the stack (corpus docs do this)
        s = "a" * 100_000
        assert jq('gsub("a"; "b")', s) == ["b" * 100_000]
        assert jq('gsub("(?<x>a)"; .x + "!")', "aaa") == ["a!a!a!"]

    def test_gsub_fanout_order_preserved(self):
        assert jq('gsub("b"; "x", "y")', "bb") == \
            ["xx", "xy", "yx", "yy"]
        # replacement emitting nothing -> no results (jq empty rules)
        assert jq('sub("b"; empty)', "ab") == []

    def test_base64d_non_utf8_raises(self):
        # base64 of bytes 0xff 0xfe — valid base64, not valid UTF-8;
        # real jq errors instead of emitting replacement chars
        with pytest.raises(JqError):
            jq('@base64d', "//4=")

    def test_at_json_non_serializable_raises(self):
        from pincette_json_streams_spark.functions.jq_subset import _eval  # noqa
        with pytest.raises(JqError):
            jq('@json', {1, 2} if False else object())

    def test_base64d_invalid_raises(self):
        with pytest.raises(JqError):
            jq('@base64d', "!!!")
        # unpadded input still decodes (inverse of @base64's padding)
        assert jq('@base64d', "aGVsbG8") == ["hello"]


class TestRound5Builtins:
    """Round-5 builtin batch: paths-as-generators, stream functions,
    deep containment, env — checked against the jq manual examples."""

    def test_nth_in_inside(self):
        assert jq('nth(1; .[])', [1, 2, 3]) == [2]
        assert jq('nth(1)', [1, 2, 3]) == [2]
        assert jq('in({"a":1})', "a") == [True]
        assert jq('in([9,8])', 1) == [True]
        assert jq('inside([1,2,3])', [1, 2]) == [True]
        assert jq('inside("abc")', "bc") == [True]

    def test_deep_contains(self):
        assert jq('contains([1])', [1, 2]) == [True]
        assert jq('contains({"a":{"b":1}})',
                  {"a": {"b": 1}, "c": 2}) == [True]
        # jq manual: element containment is recursive, substrings count
        assert jq('contains(["baz", "bar"])',
                  ["foobar", "foobaz", "blarp"]) == [True]

    def test_paths_as_generators(self):
        assert jq('path(.a.b)', {"a": {"b": 1}}) == [["a", "b"]]
        assert jq('[path(.a[])]', {"a": [9, 8]}) == [[["a", 0], ["a", 1]]]
        assert jq('del(.a, .c)', {"a": 1, "b": 2, "c": 3}) == [{"b": 2}]
        assert jq('del(.[] | select(. == 2))', [1, 2, 3, 2]) == [[1, 3]]
        assert jq('pick(.a, .c)', {"a": 1, "b": 2, "c": 3}) == \
            [{"a": 1, "c": 3}]

    def test_walk_transpose_combinations(self):
        assert jq('walk(if type == "number" then . + 1 else . end)',
                  {"a": [1, {"b": 2}]}) == [{"a": [2, {"b": 3}]}]
        assert jq('transpose', [[1], [2, 3]]) == [[[1, 2], [None, 3]]]
        assert jq('[combinations]', [[1, 2], [3, 4]]) == \
            [[[1, 3], [1, 4], [2, 3], [2, 4]]]

    def test_indices_index_rindex(self):
        assert jq('indices(",")', "a,b,c") == [[1, 3]]
        assert jq('indices([1,2])', [0, 1, 2, 1, 2]) == [[1, 3]]
        assert jq('index(",")', "a,b") == [1]
        assert jq('rindex(",")', "a,b,c") == [3]

    def test_repeat_bounded_by_limit(self):
        assert jq('[limit(3; repeat(. * 2))]', 1) == [[2, 4, 8]]

    def test_repeat_recurses_into_every_output(self):
        # jq: def repeat(f): def _r: f | (., _r); _r; — depth-first
        # over ALL outputs of a multi-output f (real-jq verified order)
        assert jq('[limit(5; repeat(. * 2, . + 1))]', 1) == \
            [[2, 4, 8, 16, 32]]
        assert jq('[limit(4; repeat(if . < 2 then .+1, 10 else empty '
                  'end))]', 0) == [[1, 2, 10, 10]]

    def test_repeat_deep_chain_no_recursion_limit(self):
        assert jq('[limit(5000; repeat(. + 1))] | length', 0) == [5000]

    def test_any_all_multi_output_conditions(self):
        assert jq('any(.[]; . > 2)', [1, 2, 3]) == [True]
        assert jq('all(.[]; . > 0)', [1, 2, 3]) == [True]
        # all() must AND over EVERY output of the condition
        assert jq('all((true,false))', [1]) == [False]

    def test_stream_functions(self):
        assert jq('[tostream]', {"a": [1, 2]}) == \
            [[[["a", 0], 1], [["a", 1], 2], [["a", 1]], [["a"]]]]
        v = {"a": [1, 2], "b": {"c": 3}}
        assert jq('fromstream(tostream)', v) == [v]
        assert jq('fromstream(tostream)', 42) == [42]
        # the jq-manual truncate_stream example, literally
        assert jq('[1|truncate_stream([[0],1],[[1,0],2],[[1,0]],[[1]])]',
                  None) == [[[[0], 2], [[0]]]]

    def test_env_and_halt(self):
        assert jq('$ENV | type', None) == ["object"]
        assert jq('env | type', None) == ["object"]
        with pytest.raises(JqError, match="boom"):
            jq('halt_error', "boom")

    def test_arity_errors_are_jq_errors(self):
        with pytest.raises(JqError):
            jq('ltrimstr()', "x")


class TestReviewRegressionsR5c:
    """Third round-5 review batch — negative indices, object
    iteration, combinations(n), try/catch."""

    def test_combinations_n_copies_of_input(self):
        # jq manual: combinations(n) = n copies of the input
        assert jq('[combinations(2)]', [0, 1]) == \
            [[[0, 0], [0, 1], [1, 0], [1, 1]]]
        with pytest.raises(JqError):
            jq('combinations', [1, 2])  # scalar rows cannot iterate

    def test_any_all_iterate_object_values(self):
        assert jq('any', {"a": False}) == [False]
        assert jq('all', {"a": False}) == [False]
        assert jq('all', {"a": 0}) == [True]  # 0 is truthy in jq

    def test_negative_indices_in_paths(self):
        assert jq('del(.[-1])', [1, 2, 3]) == [[1, 2]]
        assert jq('del(.a[0].b)', {"a": [{"b": 1, "c": 2}]}) == \
            [{"a": [{"c": 2}]}]
        assert jq('nth(-1)', [1, 2, 3]) == [3]
        assert jq('setpath([-1]; 9)', [1, 2, 3]) == [[1, 2, 9]]
        # pick on null with a negative index is a CATCHABLE jq error
        assert jq('[try pick(.[-1])]', [1, 2, 3]) == [[]]

    def test_try_catch(self):
        assert jq('try transpose catch "bad"', [[1], 2]) == ["bad"]
        # lazy: outputs before the error survive (real jq behavior)
        assert jq('[try (1, error("x"))]', None) == [[1]]
        assert jq('[try (1, 2, error("x")) catch "c"]', None) == \
            [[1, 2, "c"]]
        assert jq('[(1, error("x"), 3)?]', None) == [[1]]
        assert jq('try error("x") catch .', None) == ["x"]
        assert jq('try .a', {"a": 1}) == [1]
        # keyword fields need the quoted form, exactly like real jq
        assert jq('."try"', {"try": 5}) == [5]

    def test_transpose_rejects_non_arrays(self):
        with pytest.raises(JqError):
            jq('transpose', [[1], 2])


class TestPathProperties:
    """Hypothesis locks for the generator-path machinery: random docs
    and paths through setpath/getpath/delpaths/pick."""

    @staticmethod
    def _json_values():
        from hypothesis import strategies as st
        scalars = st.one_of(
            st.none(), st.booleans(),
            st.integers(min_value=-1000, max_value=1000),
            st.text(max_size=6))
        return st.recursive(
            scalars,
            lambda c: st.one_of(
                st.lists(c, max_size=4),
                st.dictionaries(st.text(min_size=1, max_size=4), c,
                                max_size=4)),
            max_leaves=12)

    @staticmethod
    def _paths():
        from hypothesis import strategies as st
        return st.lists(
            st.one_of(st.text(min_size=1, max_size=4),
                      st.integers(min_value=0, max_value=3)),
            min_size=1, max_size=4)

    def test_setpath_getpath_roundtrip(self):
        from hypothesis import given, settings

        @settings(max_examples=150, deadline=None)
        @given(self._json_values(), self._paths(), self._json_values())
        def prop(doc, path, value):
            from pincette_json_streams_spark.functions.jq_subset import (
                _get_in, _set_in,
            )
            try:
                updated = _set_in(doc, path, value)
            except JqError:
                return  # structurally impossible path: jq-level error
            assert _get_in(updated, path) == value
        prop()

    def test_delpaths_removes(self):
        from hypothesis import given, settings

        @settings(max_examples=150, deadline=None)
        @given(self._json_values(), self._paths())
        def prop(doc, path):
            from pincette_json_streams_spark.functions.jq_subset import (
                _del_in, _get_in,
            )
            before = _get_in(doc, path)
            try:
                after = _del_in(doc, path)
            except JqError:
                # round-8 narrowing: deleting a field of a SCALAR
                # (top-level or nested under the path) errors like jq;
                # the mixed-segment tolerance covers container/segment
                # mismatches only
                return
            if before is not None and isinstance(doc, (dict, list)):
                got = _get_in(after, path)
                # deleting a list element shifts later siblings into
                # the slot, so only assert the CONTAINER shrank or the
                # dict key vanished
                if isinstance(doc, dict) and isinstance(path[0], str):
                    if len(path) == 1:
                        assert path[0] not in after
                    else:
                        assert got != before or \
                            _get_in(doc, path[:-1]) != \
                            _get_in(after, path[:-1])
        prop()

    def test_pick_preserves_picked_values(self):
        from hypothesis import given, settings

        @settings(max_examples=100, deadline=None)
        @given(self._json_values())
        def prop(doc):
            from pincette_json_streams_spark.functions.jq_subset import (
                compile_jq,
            )
            if not isinstance(doc, dict) or not doc:
                return
            key = sorted(doc.keys())[0]
            # JSON-escape the key (control characters etc.) — the
            # program text must be valid jq source
            picked = compile_jq(f'pick(.{json.dumps(key)})')(doc)
            assert picked == [{key: doc[key]}] or (
                # jq pick returns null-shaped containers for nested
                # misses; top-level single key is exact
                picked[0][key] == doc[key])
        prop()


class TestSetpathTypeMismatch:
    """R5 final review lock: jq ERRORS on container/segment type
    mismatch in set paths — never a silent clobber."""

    def test_int_into_object_raises(self):
        with pytest.raises(JqError):
            jq('setpath([0]; "v")', {"x": 1})
        with pytest.raises(JqError):
            jq('.[0] = 5', {"x": 1})

    def test_string_into_array_raises(self):
        with pytest.raises(JqError):
            jq('setpath(["a"]; 1)', [1, 2])

    def test_null_still_creates_containers(self):
        assert jq('setpath([0]; "v")', None) == [["v"]]
        assert jq('setpath(["a"]; 1)', None) == [{"a": 1}]


class TestFunctionClosures:
    """jq function-parameter semantics: $x value params bind each
    output of the argument; bare params are call-by-name closures;
    defs may appear anywhere an expression starts."""

    def test_filter_param_call_by_name(self):
        assert jq('def f(g): [g, g]; f(1,2)', None) == [[1, 2, 1, 2]]
        assert jq('def twice(f): f | f; twice(. * 2)', 5) == [20]

    def test_value_param_binds_each_output(self):
        assert jq('def f($a): $a + 1; [f(1,2)]', None) == [[2, 3]]

    def test_closure_captures_caller_vars(self):
        assert jq('def apply(f): 0 | f; 5 as $v | apply($v + 1)',
                  None) == [6]

    def test_local_def_and_recursion_through_param(self):
        assert jq('def rpt(f): def _r: ., (f | _r); _r; '
                  '[limit(4; 1 | rpt(. * 2))]', None) == [[1, 2, 4, 8]]

    def test_local_def_scoping(self):
        assert jq('def f: 1; [f, (def f: 2; f), f]', None) == [[1, 2, 1]]

    def test_mixed_params(self):
        assert jq('def pick2(f; $d): (f // $d); '
                  '{"a":1} | [pick2(.a; 9), pick2(.b; 9)]',
                  None) == [[1, 9]]


class TestForeachLabelDestructure:
    """jq control structures: foreach, label/break, destructuring
    patterns (jq manual)."""

    def test_foreach_running_state(self):
        assert jq('[foreach .[] as $i (0; . + $i)]',
                  [1, 2, 3]) == [[1, 3, 6]]

    def test_foreach_extract(self):
        assert jq('[foreach .[] as $i (0; . + $i; [$i, .])]',
                  [1, 2]) == [[[1, 1], [2, 3]]]

    def test_label_break(self):
        assert jq('[label $out | 1, 2, break $out, 3]', None) == [[1, 2]]
        assert jq('[label $out | foreach .[] as $i '
                  '(0; . + $i; if . > 3 then ., break $out '
                  'else empty end)]', [1, 2, 3, 4]) == [[6]]

    def test_destructuring_patterns(self):
        assert jq('. as [$a, $b] | $a + $b', [1, 2]) == [3]
        assert jq('. as {a: $x} | $x', {"a": 5}) == [5]
        assert jq('. as {$a} | $a', {"a": 7}) == [7]
        # missing parts bind null, never error
        assert jq('. as [$a, $b] | [$a, $b]', [1]) == [[1, None]]
        assert jq('reduce .[] as [$k, $v] ({}; .[$k] = $v)',
                  [["a", 1], ["b", 2]]) == [{"a": 1, "b": 2}]

    def test_differential_fuzz_locks(self):
        """Fixes found by the jq-1.6 differential fuzz
        (scripts/fuzz_jq_differential.py), locked without the binary:
        3-arg range honors its step; sort orders arrays element-wise
        (not by their JSON string); map iterates object VALUES; jq
        value ordering in min/max ties (max keeps the LAST maximal);
        type errors are catchable JqErrors, not Python crashes."""
        from pincette_json_streams_spark.functions.jq_subset import JqError
        assert jq("[range(0; 7; 2)]", None) == [[0, 2, 4, 6]]
        assert jq("[range(4; 0; -2)]", None) == [[4, 2]]
        assert jq("sort", [[1.5, 0], []]) == [[[], [1.5, 0]]]
        assert jq("map(. + 1)", {"a": 1, "b": 2}) == [[2, 3]]
        assert jq("map_values(. + 1)", {"a": 1}) == [{"a": 2}]
        assert jq("map_values(select(. > 1))", [1, 2]) == [[2]]
        assert jq('max_by(.a)',
                  [{"a": 1, "i": 0}, {"a": 1, "i": 1}]) == \
            [{"a": 1, "i": 1}]
        assert jq('min_by(.a)',
                  [{"a": 1, "i": 0}, {"a": 1, "i": 1}]) == \
            [{"a": 1, "i": 0}]
        assert jq("to_entries", ["x"]) == [[{"key": 0, "value": "x"}]]
        assert jq("flatten", {"a": 1, "b": [2]}) == [[1, 2]]
        assert jq('has("a")', None) == [False]
        # catchable type errors (were raw TypeErrors/crashes)
        for prog, val in [("with_entries(.)", True), ("sqrt", [1]),
                          ("reverse", {"a": 1}), ("tonumber", {}),
                          ('. + 1', "s"), ("add", None),
                          ("ascii_downcase", {})]:
            with pytest.raises(JqError):
                jq(prog, val)
        # sqrt of a negative is nan (prints null), not an error
        import math
        assert math.isnan(jq("sqrt", -3)[0])
        # an empty key stream in a by-key sorts FIRST, never errors
        assert jq('sort_by(.a?)', [{"a": 2}, "s"]) == [["s", {"a": 2}]]

    def test_empty_key_pattern_is_catchable(self):
        # a key expression producing NO outputs must raise a JqError
        # (catchable), not a PEP-479 RuntimeError escaping try/catch
        from pincette_json_streams_spark.functions.jq_subset import JqError
        with pytest.raises(JqError):
            jq('. as {(empty): $v} | $v', {"a": 1})
        assert jq('try (. as {(empty): $v} | $v) catch "caught"',
                  {"a": 1}) == ["caught"]

    def test_last_of_filter_and_paths_filter(self):
        assert jq('last(1,2,3)', None) == [3]
        assert jq('[paths(type == "number")]',
                  {"a": 1, "b": {"c": 2}}) == [[["a"], ["b", "c"]]]


class TestArithEdges:
    def test_string_times_nonpositive_is_null(self):
        assert jq('"x" * 0', None) == [None]
        assert jq('"x" * -1', None) == [None]
        assert jq('3 * "x"', None) == ["xxx"]

    def test_truncated_modulo(self):
        # jq % is C-style truncated remainder, not Python floored
        assert jq('-10 % 3', None) == [-1]
        assert jq('10 % -3', None) == [1]


class TestTimeBuiltins:
    """jq time family — examples straight from the jq manual."""

    def test_gmtime_mktime_roundtrip(self):
        assert jq('gmtime', 1500000000) == \
            [[2017, 6, 14, 2, 40, 0, 5, 194]]
        assert jq('gmtime | mktime', 1500000000) == [1500000000]

    def test_strftime_number_and_broken_down(self):
        assert jq('strftime("%Y-%m-%dT%H:%M:%SZ")',
                  1500000000) == ["2017-07-14T02:40:00Z"]
        assert jq('gmtime | strftime("%Y-%m-%d")',
                  1500000000) == ["2017-07-14"]

    def test_strptime(self):
        assert jq('strptime("%Y-%m-%dT%H:%M:%SZ")',
                  "2015-03-05T23:51:47Z") == \
            [[2015, 2, 5, 23, 51, 47, 4, 63]]
        assert jq('strptime("%Y-%m-%dT%H:%M:%SZ") | mktime',
                  "2015-03-05T23:51:47Z") == [1425599507]

    def test_iso8601_aliases_and_now(self):
        assert jq('todateiso8601', 1500000000) == \
            ["2017-07-14T02:40:00Z"]
        assert jq('fromdateiso8601', "2017-07-14T02:40:00Z") == \
            [1500000000]
        assert jq('now | type', None) == ["number"]


class TestSqlStyleBuiltins:
    def test_in(self):
        assert jq('IN(1,2)', 1) == [True]
        assert jq('IN(1,2)', 3) == [False]
        assert jq('IN(.[]; 2, 9)', [1, 2, 3]) == [True]

    def test_index(self):
        assert jq('INDEX(.id)',
                  [{"id": "a", "v": 1}, {"id": "b", "v": 2}]) == \
            [{"a": {"id": "a", "v": 1}, "b": {"id": "b", "v": 2}}]

    def test_deprecated_aliases(self):
        assert jq('GROUP_BY(.a) | length',
                  [{"a": 1}, {"a": 2}, {"a": 1}]) == [2]
        assert jq('UNIQUE_BY(.a) | length', [{"a": 1}, {"a": 1}]) == [1]
        assert jq('ANY', [True, False]) == [True]
        assert jq('ALL', [True, False]) == [False]


class TestTypeStrictEquality:
    """jslt-differential-fuzz findings (round 8): Python's bool/int
    equality (True == 1) must not leak into jq value equality, and
    text rendering canonicalizes integral floats like the binary."""

    def test_bool_number_distinct(self):
        assert jq('true == 1', None) == [False]
        assert jq('false == 0', None) == [False]
        assert jq('true != 1', None) == [True]
        assert jq('[true] == [1]', None) == [False]
        assert jq('{"a": true} == {"a": 1}', None) == [False]

    def test_numeric_equality_across_int_float(self):
        assert jq('1 == 1.0', None) == [True]
        assert jq('[1] == [1.0]', None) == [True]
        assert jq('0 == -0.0', None) == [True]

    def test_membership_and_dedupe(self):
        assert jq('index(true)', [1]) == [None]
        assert jq('index(1)', [True, 1]) == [1]
        assert jq('IN(1)', True) == [False]
        assert jq('unique', [1, 1.0, True]) == [[True, 1]]
        assert jq('contains([1])', [True]) == [False]
        assert jq('contains([1])', [True, 1]) == [True]

    def test_sort_ranks_bools_inside_arrays(self):
        # _lt used Python list < (element == leaks); jq ranks
        # true < 1 by type
        assert jq('sort', [[1], [True]]) == [[[True], [1]]]

    def test_tostring_canonicalizes_integral_floats(self):
        # jq renders 5.0 as "5", -0.0 as "-0"; values in flight keep
        # their float identity (5.0 + 1 stays numeric)
        assert jq('(2.5 + 2.5) | tostring', None) == ["5"]
        assert jq('(0 * -2.5) | tostring', None) == ["-0"]
        assert jq('[5.0, 2.5] | tojson', None) == ["[5,2.5]"]
        assert jq('{"a": 1.0} | tojson', None) == ['{"a":1}']
        assert jq('@json "x\\(5.0)"', None) == ["x5"]
        assert jq('2.5 | tostring', None) == ["2.5"]


class TestRound8FuzzFindings:
    """Widened-grammar differential fuzz (round 8): assignment
    machinery, path type checks, halt semantics, string-family type
    guards, interpolation lexing — all locked binary-independent."""

    def test_update_assign_first_output_and_empty_delete(self):
        # jq 1.7: |= uses the FIRST output; an empty update deletes
        assert jq(".a |= (range(0; 3))", {"a": 9}) == [{"a": 0}]
        assert jq(".a |= empty", {"a": 9, "b": 1}) == [{"b": 1}]

    def test_assignment_multi_path_and_lazy_target(self):
        assert jq("(.a, .b) = 1", {}) == [{"a": 1, "b": 1}]
        # RHS first: an empty RHS never touches an invalid target
        assert jq(".a = empty", 0) == []
        assert jq(".a = (select(false))", 0) == []

    def test_assignment_errors_on_scalars(self):
        for prog, inp in ((".a = 1", False), (".a += 1", "x"),
                          (".a |= .", 5), (".[0] = 5", 3)):
            with pytest.raises(JqError):
                jq(prog, inp)
        # null still auto-vivifies
        assert jq(".a = 1", None) == [{"a": 1}]
        assert jq(".[0] = 5", None) == [[5]]

    def test_path_type_checks(self):
        assert jq("[path(.a?)]", []) == [[]]
        assert jq("[path(.a?)]", False) == [[]]
        assert jq("[path(.a?)]", None) == [[["a"]]]
        with pytest.raises(JqError):
            jq("path(.a)", [1])

    def test_setpath_delpaths_stream_their_arguments(self):
        assert jq('setpath((["a"],["b"]); range(0;2))', None) == [
            {"a": 0}, {"b": 0}, {"a": 1}, {"b": 1}]
        assert jq('delpaths([["a"]], [["b"]])',
                  {"a": 1, "b": 2}) == [{"b": 2}, {"a": 1}]

    def test_delpaths_scalar_field_errors(self):
        # container/segment mismatches stay tolerated (r4 contract),
        # but deleting a field OF A SCALAR errors like jq
        with pytest.raises(JqError):
            jq('delpaths([["a"]])', 7)
        with pytest.raises(JqError):
            jq('delpaths([["a","b"]])', {"a": 5})
        assert jq('delpaths([["a"], [0]])', {"a": 1}) == [{}]

    def test_halt_error_uncatchable(self):
        for prog in ("halt_error?", 'try (halt_error) catch "c"',
                     "(halt_error) // 1"):
            with pytest.raises(JqError):
                jq(prog, True)

    def test_string_family_type_guards(self):
        # non-string inputs raise JqError (catchable), never TypeError
        for prog, inp in (('sub("a"; "b")?', {}), ("fromjson?", {}),
                          ("explode?", -3), ('split(" ")?', {}),
                          ("implode?", "abc"), ("fromdate?", "bad"),
                          ('startswith("a")?', 3), ("[splits(0)]?", "x"),
                          ('test("a")?', [1])):
            assert jq(prog, inp) == []

    def test_split_empty_string(self):
        assert jq('split(" ")', "") == [[]]
        assert jq('split(" ")', "a b") == [["a", "b"]]

    def test_join_jq_semantics(self):
        # null -> "", scalars -> tostring, container elements error
        assert jq('join("-")', [1, None, True, "x"]) == ["1--true-x"]
        assert jq('join("-")', {}) == [""]
        with pytest.raises(JqError):
            jq('join("-")', [["a"]])

    def test_recurse_dotdot_and_paths(self):
        assert jq("[..]", {"a": [1]}) == [[{"a": [1]}, [1], 1]]
        assert jq("[path(..)]", {"a": [1]}) == [[[], ["a"], ["a", 0]]]

    def test_utf8bytelength_and_misc(self):
        assert jq("utf8bytelength", "hi") == [2]
        assert jq("input_line_number", False) == [0]

    def test_string_interpolation_nested_quotes(self):
        assert jq('@text "v=\\(getpath(["a"]) | tostring)"',
                  {"c": 1}) == ["v=null"]
        assert jq('"x=\\("in(ner)" + "s")"', None) == ["x=in(ner)s"]
        assert jq('"a=\\("q=\\(1+1)")"', None) == ["a=q=2"]

    def test_infinite_rendering(self):
        assert jq("infinite | tostring",
                  None) == ["1.7976931348623157e+308"]
        assert jq("nan | tostring", None) == ["null"]
