"""Expression-operator compiler tests (SURVEY.md §2.6;
reference spec /root/reference/docs/aggregation_operators.md)."""

import pytest
from pyspark.sql import functions as F

from pincette_json_streams_spark.operators.context import ctx_for
from pincette_json_streams_spark.operators.expressions import compile_expr


def ev(df, expr, n=1):
    """Evaluate one Mongo expression over df, return first n values."""
    col = compile_expr(expr, ctx_for(df))
    vals = [r[0] for r in df.select(col.alias("v")).collect()]
    return vals[0] if n == 1 else vals[:n]


def one(spark, **cols):
    return spark.createDataFrame([tuple(cols.values())],
                                 list(cols.keys()))


class TestArithmetic:
    def test_basics(self, spark):
        df = one(spark, a=7.0, b=2.0)
        assert ev(df, {"$add": ["$a", "$b", 1]}) == 10.0
        assert ev(df, {"$subtract": ["$a", "$b"]}) == 5.0
        assert ev(df, {"$multiply": ["$a", "$b"]}) == 14.0
        assert ev(df, {"$divide": ["$a", "$b"]}) == 3.5
        assert ev(df, {"$mod": [7, 2]}) == 1
        assert ev(df, {"$abs": -3}) == 3
        assert ev(df, {"$pow": [2, 10]}) == 1024.0
        assert ev(df, {"$sqrt": 16}) == 4.0

    def test_rounding(self, spark):
        df = one(spark, x=2.567)
        assert ev(df, {"$round": ["$x", 2]}) == 2.57
        assert ev(df, {"$trunc": ["$x", 2]}) == 2.56
        assert ev(df, {"$ceil": "$x"}) == 3.0
        assert ev(df, {"$floor": "$x"}) == 2.0

    def test_logs(self, spark):
        import math
        df = one(spark, x=100.0)
        assert ev(df, {"$log10": "$x"}) == pytest.approx(2.0)
        assert ev(df, {"$ln": "$x"}) == pytest.approx(math.log(100))
        assert ev(df, {"$log": ["$x", 10]}) == pytest.approx(2.0)
        assert ev(df, {"$exp": 0}) == 1.0


class TestStrings:
    def test_concat_case(self, spark):
        df = one(spark, s="Hello", t="World")
        assert ev(df, {"$concat": ["$s", " ", "$t"]}) == "Hello World"
        assert ev(df, {"$toUpper": "$s"}) == "HELLO"
        assert ev(df, {"$toLower": "$s"}) == "hello"
        assert ev(df, {"$strLenCP": "$s"}) == 5

    def test_substr_index(self, spark):
        df = one(spark, s="abcdef")
        assert ev(df, {"$substrCP": ["$s", 1, 3]}) == "bcd"
        assert ev(df, {"$indexOfCP": ["$s", "cd"]}) == 2
        assert ev(df, {"$indexOfCP": ["$s", "zz"]}) == -1

    def test_split_trim_replace(self, spark):
        df = one(spark, s="  a,b,c  ")
        assert ev(df, {"$split": [{"$trim": {"input": "$s"}}, ","]}) == \
            ["a", "b", "c"]
        assert ev(df, {"$ltrim": {"input": "$s"}}) == "a,b,c  "
        assert ev(df, {"$rtrim": {"input": "$s"}}) == "  a,b,c"
        assert ev(df, {"$replaceAll": {"input": "aXbXc", "find": "X",
                                       "replacement": "-"}}) == "a-b-c"
        assert ev(df, {"$replaceOne": {"input": "aXbXc", "find": "X",
                                       "replacement": "-"}}) == "a-bXc"

    def test_regex(self, spark):
        df = one(spark, s="order-123-x")
        assert ev(df, {"$regexMatch": {"input": "$s",
                                       "regex": "\\d+"}}) is True
        found = ev(df, {"$regexFind": {"input": "$s", "regex": "\\d+"}})
        assert found["match"] == "123"
        assert ev(df, {"$regexFindAll": {"input": "a1b22",
                                         "regex": "\\d+"}}) == ["1", "22"]

    def test_base64_uri(self, spark):
        df = one(spark, s="hi there/x")
        assert ev(df, {"$base64Decode":
                       {"$base64Encode": "$s"}}) == "hi there/x"
        assert ev(df, {"$uriEncode": "$s"}) == "hi%20there%2Fx"
        assert ev(df, {"$uriDecode": {"$uriEncode": "$s"}}) == "hi there/x"

    def test_strcasecmp(self, spark):
        df = one(spark, a="ABC", b="abd")
        assert ev(df, {"$strcasecmp": ["$a", "$b"]}) == -1
        assert ev(df, {"$strcasecmp": ["$a", "abc"]}) == 0


class TestArrays:
    def test_core(self, spark, people):
        df = people.filter("_id = 'p1'")
        assert ev(df, {"$size": "$tags"}) == 2
        assert ev(df, {"$arrayElemAt": ["$tags", 0]}) == "red"
        assert ev(df, {"$arrayElemAt": ["$tags", -1]}) == "blue"
        assert ev(df, {"$first": "$tags"}) == "red"
        assert ev(df, {"$last": "$tags"}) == "blue"
        assert ev(df, {"$in": ["red", "$tags"]}) is True
        assert ev(df, {"$indexOfArray": ["$tags", "blue"]}) == 1
        assert ev(df, {"$isArray": "$tags"}) is True
        assert ev(df, {"$isArray": "$name"}) is False
        assert ev(df, {"$reverseArray": "$tags"}) == ["blue", "red"]
        assert ev(df, {"$slice": ["$tags", 1]}) == ["red"]
        assert ev(df, {"$concatArrays": ["$tags", ["x"]]}) == \
            ["red", "blue", "x"]

    def test_lambda_ops(self, spark):
        df = one(spark, a=[1, 2, 3, 4])
        assert ev(df, {"$filter": {"input": "$a", "as": "x",
                                   "cond": {"$gt": ["$$x", 2]}}}) == [3, 4]
        assert ev(df, {"$map": {"input": "$a", "as": "x",
                                "in": {"$multiply": ["$$x", 10]}}}) == \
            [10, 20, 30, 40]
        assert ev(df, {"$reduce": {"input": "$a", "initialValue": 0,
                                   "in": {"$add":
                                          ["$$value", "$$this"]}}}) == 10

    def test_range_zip(self, spark):
        df = one(spark, n=3)
        assert ev(df, {"$range": [0, 6, 2]}) == [0, 2, 4]
        z = ev(df, {"$zip": {"inputs": [[1, 2], [3, 4]]}})
        assert [list(t) for t in z] == [[1, 3], [2, 4]]

    def test_zip_empty_input(self, spark):
        # sequence(1, 0) would infer step -1 and crash on element_at(_, 0);
        # an empty input array must zip to an empty result
        df = one(spark, a=[1, 2])
        assert ev(df, {"$zip": {"inputs": [[], [3, 4]]}}) == []
        assert ev(df, {"$zip": {"inputs": [[]]}}) == []
        z = ev(df, {"$zip": {"inputs": ["$a", [9]]}})
        assert [list(t) for t in z] == [[1, 9]]

    def test_elem_match(self, spark):
        df = one(spark, a=[1, 5, 9])
        assert ev(df, {"$elemMatch": ["$a", {"$gt": 4}]}) == 5
        # no matching element: missing (NULL), not INVALID_ARRAY_INDEX
        assert ev(df, {"$elemMatch": ["$a", {"$gt": 100}]}) is None

    def test_set_ops(self, spark):
        df = one(spark, a=[1, 2, 2, 3], b=[2, 3, 4])
        assert sorted(ev(df, {"$setUnion": ["$a", "$b"]})) == [1, 2, 3, 4]
        assert sorted(ev(df, {"$setIntersection": ["$a", "$b"]})) == [2, 3]
        assert ev(df, {"$setDifference": ["$a", "$b"]}) == [1]
        assert ev(df, {"$setIsSubset": [[2, 3], "$a"]}) is True
        assert ev(df, {"$setEquals": [[3, 2, 1], [1, 2, 3]]}) is True
        assert ev(df, {"$allElementsTrue": [[True, True]]}) is True
        assert ev(df, {"$allElementsTrue": [[True, False]]}) is False
        assert ev(df, {"$anyElementTrue": [[False, True]]}) is True

    def test_object_array_conversion(self, spark):
        df = one(spark, x=1)
        arr = ev(df, {"$objectToArray": {"a": 1, "b": 2}})
        assert [(e["k"], e["v"]) for e in arr] == [("a", 1), ("b", 2)]
        obj = ev(df, {"$arrayToObject": [[{"k": "a", "v": 10}]]})
        assert obj["a"] == 10

    def test_sort_ext(self, spark):
        # $sort expression operator (extension: sorts an array value,
        # docs/aggregation_operators.md:1204)
        df = one(spark, a=[3, 1, 2])
        assert ev(df, {"$sort": {"input": "$a"}}) == [1, 2, 3]
        assert ev(df, {"$sort": {"input": "$a",
                                 "direction": "desc"}}) == [3, 2, 1]


class TestConditionals:
    def test_cond_ifnull_switch(self, spark):
        df = spark.createDataFrame([(5, None)], "a int, b string")
        assert ev(df, {"$cond": [{"$gt": ["$a", 3]}, "big", "small"]}) == \
            "big"
        assert ev(df, {"$cond": {"if": {"$lt": ["$a", 3]},
                                 "then": "y", "else": "n"}}) == "n"
        assert ev(df, {"$ifNull": ["$b", "dflt"]}) == "dflt"
        assert ev(df, {"$switch": {
            "branches": [{"case": {"$eq": ["$a", 1]}, "then": "one"},
                         {"case": {"$eq": ["$a", 5]}, "then": "five"}],
            "default": "other"}}) == "five"

    def test_comparison(self, spark):
        df = one(spark, a=2, b=3)
        assert ev(df, {"$cmp": ["$a", "$b"]}) == -1
        assert ev(df, {"$cmp": ["$b", "$a"]}) == 1
        assert ev(df, {"$cmp": ["$a", "$a"]}) == 0
        assert ev(df, {"$eq": ["$a", 2]}) is True
        assert ev(df, {"$ne": ["$a", 2]}) is False
        assert ev(df, {"$and": [{"$gt": ["$b", "$a"]}, True]}) is True
        assert ev(df, {"$or": [False, {"$gte": ["$a", 2]}]}) is True
        assert ev(df, {"$not": [{"$lt": ["$a", 1]}]}) is True


class TestLetAndVariables:
    def test_let(self, spark):
        df = one(spark, price=100.0)
        assert ev(df, {"$let": {
            "vars": {"disc": 0.1},
            "in": {"$multiply": ["$price",
                                 {"$subtract": [1, "$$disc"]}]}}}) == 90.0

    def test_nested_let(self, spark):
        df = one(spark, x=1)
        assert ev(df, {"$let": {
            "vars": {"a": 2},
            "in": {"$let": {"vars": {"b": {"$add": ["$$a", 3]}},
                            "in": {"$add": ["$$a", "$$b"]}}}}}) == 7

    def test_literal(self, spark):
        df = one(spark, x=1)
        assert ev(df, {"$literal": "$x"}) == "$x"
        assert ev(df, {"$literal": {"a": 1}})["a"] == 1


class TestDates:
    def test_iso8601_family(self, spark):
        # reference extension ops (docs/aggregation_operators.md:514-614)
        df = one(spark, ts="2024-03-15T12:30:45Z")
        assert ev(df, {"$toYear": "$ts"}) == 2024
        assert ev(df, {"$toMonth": "$ts"}) == 3
        assert ev(df, {"$toDay": "$ts"}) == 15
        millis = ev(df, {"$toEpochMillis": "$ts"})
        assert millis == 1710505845000
        assert ev(df, {"$toEpochSeconds": "$ts"}) == 1710505845
        assert ev(df, {"$fromEpochMillis": millis}) == \
            "2024-03-15T12:30:45Z"
        assert ev(df, {"$fromEpochSeconds": 1710505845}) == \
            "2024-03-15T12:30:45Z"
        assert ev(df, {"$toDate": "$ts"}).year == 2024


class TestTypes:
    def test_conversions(self, spark):
        df = one(spark, s="42", d=3.99)
        assert ev(df, {"$toInt": "$s"}) == 42
        assert ev(df, {"$toInt": "$d"}) == 3  # truncation, not rounding
        assert ev(df, {"$toLong": "$d"}) == 3
        assert ev(df, {"$toDouble": "$s"}) == 42.0
        assert ev(df, {"$toString": 42}) == "42"
        assert ev(df, {"$toBool": 1}) is True
        assert ev(df, {"$convert": {"input": "$s", "to": "int"}}) == 42

    def test_type_of(self, spark):
        df = one(spark, s="x", n=1.5, a=[1])
        assert ev(df, {"$type": "$s"}) == "string"
        assert ev(df, {"$type": "$n"}) == "double"
        assert ev(df, {"$type": "$a"}) == "array"


class TestObjects:
    def test_merge_objects(self, spark, people):
        df = people.filter("_id='p1'")
        m = ev(df, {"$mergeObjects": ["$address", {"country": "BE"}]})
        assert m["city"] == "Ghent" and m["country"] == "BE"


class TestTrig:
    def test_trig(self, spark):
        import math
        df = one(spark, x=0.5)
        assert ev(df, {"$sin": "$x"}) == pytest.approx(math.sin(0.5))
        assert ev(df, {"$atan2": [1, 1]}) == pytest.approx(math.pi / 4)
        assert ev(df, {"$degreesToRadians": 180}) == pytest.approx(math.pi)
        assert ev(df, {"$radiansToDegrees": math.pi}) == pytest.approx(180)


class TestJsonStringOps:
    def test_json_roundtrip(self, spark):
        df = one(spark, x=1)
        s = ev(df, {"$jsonToString": {"a": 1, "b": "x"}})
        assert '"a":1' in s.replace(" ", "")


class TestJesOps:
    def test_uuid_ops(self, spark):
        import uuid as uuid_mod
        df = one(spark, x="hello")
        u = ev(df, {"$jes-uuid": None})
        uuid_mod.UUID(u)  # parses
        nu = ev(df, {"$jes-name-uuid": {"scope": "ent", "key": "$x"}})
        assert nu == str(uuid_mod.uuid5(uuid_mod.NAMESPACE_URL,
                                        "ent:hello"))

    def test_href(self, spark):
        df = one(spark, x=1)
        assert ev(df, {"$jes-href": {"app": "myapp", "type": "order",
                                     "id": "42"}}) == "/myapp/order/42"
        assert ev(df, {"$jes-href": {"app": "myapp",
                                     "type": "order"}}) == "/myapp/order"

    def test_ops_predicates(self, spark):
        df = spark.createDataFrame(
            [([{"op": "add", "path": "/a"},
               {"op": "remove", "path": "/b"}],)],
            "_ops array<struct<op:string, path:string>>")
        assert ev(df, {"$jes-added": "/a"}) is True
        assert ev(df, {"$jes-added": "/b"}) is False
        assert ev(df, {"$jes-removed": "/b"}) is True
        assert ev(df, {"$jes-changed": "/a"}) is True


class TestDateArithmetic:
    """MongoDB 5.0 date arithmetic extensions ($dateTrunc/$dateAdd/
    $dateSubtract/$dateDiff, boundary-crossing semantics)."""

    def _eval(self, spark, expr):
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        df = spark.range(1)
        return df.select(
            compile_expr(expr, ctx_for(df)).alias("v")).collect()[0]["v"]

    def test_trunc_units_and_bins(self, spark):
        t = "2024-03-15T13:47:29Z"
        assert self._eval(spark, {"$dateTrunc": {
            "date": t, "unit": "day"}}) == "2024-03-15T00:00:00Z"
        assert self._eval(spark, {"$dateTrunc": {
            "date": t, "unit": "month"}}) == "2024-03-01T00:00:00Z"
        assert self._eval(spark, {"$dateTrunc": {
            "date": t, "unit": "minute",
            "binSize": 15}}) == "2024-03-15T13:45:00Z"
        assert self._eval(spark, {"$dateTrunc": {
            "date": t, "unit": "hour",
            "binSize": 6}}) == "2024-03-15T12:00:00Z"

    def test_add_subtract(self, spark):
        t = "2024-01-31T10:00:00Z"
        assert self._eval(spark, {"$dateAdd": {
            "startDate": t, "unit": "month",
            "amount": 1}}) == "2024-02-29T10:00:00Z"   # month clamp
        assert self._eval(spark, {"$dateSubtract": {
            "startDate": t, "unit": "day",
            "amount": 31}}) == "2023-12-31T10:00:00Z"

    def test_diff_counts_boundaries(self, spark):
        # 23:59 -> 00:01 crosses one day boundary (Mongo semantics)
        assert self._eval(spark, {"$dateDiff": {
            "startDate": "2024-01-01T23:59:00Z",
            "endDate": "2024-01-02T00:01:00Z", "unit": "day"}}) == 1
        # under one full day elapsed, still 1
        assert self._eval(spark, {"$dateDiff": {
            "startDate": "2024-01-01T00:00:00Z",
            "endDate": "2024-03-01T00:00:00Z", "unit": "month"}}) == 2
        # ISO weeks: Sun 2024-01-07 -> Mon 2024-01-08 crosses a week
        assert self._eval(spark, {"$dateDiff": {
            "startDate": "2024-01-07T12:00:00Z",
            "endDate": "2024-01-08T12:00:00Z", "unit": "week"}}) == 1
        assert self._eval(spark, {"$dateDiff": {
            "startDate": "2024-01-01T12:00:00Z",
            "endDate": "2024-01-07T12:00:00Z", "unit": "week"}}) == 0

    def test_bad_units_raise(self, spark):
        import pytest
        from pincette_json_streams_spark.operators.expressions import (
            UnsupportedExpression,
        )
        with pytest.raises(UnsupportedExpression):
            self._eval(spark, {"$dateTrunc": {
                "date": "2024-01-01T00:00:00Z", "unit": "month",
                "binSize": 2}})
        with pytest.raises(UnsupportedExpression):
            self._eval(spark, {"$dateDiff": {
                "startDate": "2024-01-01T00:00:00Z",
                "endDate": "2024-01-02T00:00:00Z", "unit": "fortnight"}})


class TestModernExpressionOps:
    """MongoDB 5.x expression extensions: $sortArray, N-array ops,
    $getField/$setField/$unsetField, $dateToString/$dateFromString."""

    def _eval(self, spark, expr):
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        df = spark.range(1)
        r = df.select(
            compile_expr(expr, ctx_for(df)).alias("v")).collect()[0]["v"]
        return r

    def test_sort_array(self, spark):
        assert self._eval(spark, {"$sortArray": {
            "input": [3, 1, 2], "sortBy": 1}}) == [1, 2, 3]
        assert self._eval(spark, {"$sortArray": {
            "input": [3, 1, 2], "sortBy": -1}}) == [3, 2, 1]

    def test_array_n_ops(self, spark):
        arr = [5, 1, 4, 2, 3]
        assert self._eval(spark, {"$minN": {"input": arr, "n": 2}}) \
            == [1, 2]
        assert self._eval(spark, {"$maxN": {"input": arr, "n": 2}}) \
            == [5, 4]
        assert self._eval(spark, {"$firstN": {"input": arr, "n": 3}}) \
            == [5, 1, 4]
        assert self._eval(spark, {"$lastN": {"input": arr, "n": 3}}) \
            == [4, 2, 3]
        # n beyond the array length: whole array, order preserved
        assert self._eval(spark, {"$lastN": {"input": arr, "n": 9}}) \
            == arr

    def test_field_ops(self, spark):
        doc = {"a": 1, "b": "x"}
        assert self._eval(spark, {"$getField": {
            "field": "b", "input": {"$literal": doc}}}) == "x"
        got = self._eval(spark, {"$setField": {
            "field": "c", "input": {"$literal": doc}, "value": 9}})
        assert got.asDict() == {"a": 1, "b": "x", "c": 9}
        got2 = self._eval(spark, {"$unsetField": {
            "field": "a", "input": {"$literal": doc}}})
        assert got2.asDict() == {"b": "x"}
        got3 = self._eval(spark, {"$setField": {
            "field": "b", "input": {"$literal": doc},
            "value": "$$REMOVE"}})
        assert got3.asDict() == {"a": 1}

    def test_date_to_from_string(self, spark):
        assert self._eval(spark, {"$dateToString": {
            "date": "2024-03-05T07:08:09Z",
            "format": "%Y/%m/%d %H:%M"}}) == "2024/03/05 07:08"
        assert self._eval(spark, {"$dateFromString": {
            "dateString": "05-03-2024 07:08:09",
            "format": "%d-%m-%Y %H:%M:%S"}}) == "2024-03-05T07:08:09Z"
        # roundtrip without explicit format (ISO)
        assert self._eval(spark, {"$dateFromString": {
            "dateString": "2024-03-05T07:08:09Z"}}) \
            == "2024-03-05T07:08:09Z"
        # onNull fallback
        assert self._eval(spark, {"$dateToString": {
            "date": None, "format": "%Y", "onNull": "none"}}) == "none"

    def test_unsupported_specifier(self, spark):
        import pytest
        from pincette_json_streams_spark.operators.expressions import (
            UnsupportedExpression,
        )
        with pytest.raises(UnsupportedExpression):
            self._eval(spark, {"$dateToString": {
                "date": "2024-01-01T00:00:00Z", "format": "%Q"}})


class TestDateDiffProperty:
    def test_matches_python_boundary_count(self, spark):
        """Property: $dateDiff equals a pure-python boundary-crossing
        reference for random UTC instant pairs across all units."""
        import datetime as dt
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )

        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)

        def ref(s, e, unit):
            if unit == "year":
                return e.year - s.year
            if unit == "quarter":
                return (e.year * 4 + (e.month - 1) // 3) \
                    - (s.year * 4 + (s.month - 1) // 3)
            if unit == "month":
                return (e.year * 12 + e.month) - (s.year * 12 + s.month)
            if unit == "week":      # ISO weeks (Monday boundaries)
                def wk(t):
                    days = (t - epoch).days
                    return (days + 3) // 7
                return wk(e) - wk(s)
            width = {"day": 86_400_000, "hour": 3_600_000,
                     "minute": 60_000, "second": 1000}[unit]
            def ms(t):
                return int((t - epoch).total_seconds() * 1000)
            return ms(e) // width - ms(s) // width

        df = spark.range(1)
        ctx = ctx_for(df)

        @settings(max_examples=15, deadline=None,
                  suppress_health_check=list(HealthCheck))
        @given(st.integers(0, 2_000_000_000),
               st.integers(0, 2_000_000_000),
               st.sampled_from(["year", "quarter", "month", "week",
                                "day", "hour", "minute", "second"]))
        def check(s_sec, e_sec, unit):
            s = epoch + dt.timedelta(seconds=s_sec)
            e = epoch + dt.timedelta(seconds=e_sec)
            iso = "%Y-%m-%dT%H:%M:%SZ"
            got = df.select(compile_expr({"$dateDiff": {
                "startDate": s.strftime(iso),
                "endDate": e.strftime(iso), "unit": unit,
            }}, ctx).alias("v")).collect()[0]["v"]
            assert got == ref(s, e, unit), (s, e, unit)

        check()


class TestDateParts:
    """Canonical MongoDB date-part operators ($year..$isoDayOfWeek,
    $dateToParts/$dateFromParts) — UTC, over the engine's ISO strings."""

    def test_parts_of_instant(self, spark):
        df = one(spark, t="2024-03-05T14:07:09.250Z")  # a Tuesday
        assert ev(df, {"$year": "$t"}) == 2024
        assert ev(df, {"$month": "$t"}) == 3
        assert ev(df, {"$dayOfMonth": "$t"}) == 5
        assert ev(df, {"$hour": "$t"}) == 14
        assert ev(df, {"$minute": "$t"}) == 7
        assert ev(df, {"$second": "$t"}) == 9
        assert ev(df, {"$millisecond": "$t"}) == 250
        assert ev(df, {"$dayOfWeek": "$t"}) == 3      # Sun=1 -> Tue=3
        assert ev(df, {"$isoDayOfWeek": "$t"}) == 2   # Mon=1 -> Tue=2
        assert ev(df, {"$dayOfYear": "$t"}) == 65

    def test_week_variants(self, spark):
        # 2024-01-01 is a Monday: before the first Sunday -> $week 0,
        # but ISO week 1 of 2024
        df = one(spark, t="2024-01-01T00:00:00Z")
        assert ev(df, {"$week": "$t"}) == 0
        assert ev(df, {"$isoWeek": "$t"}) == 1
        assert ev(df, {"$isoWeekYear": "$t"}) == 2024
        # 2021-01-01 is a Friday: ISO week 53 of ISO year 2020
        df = one(spark, t="2021-01-01T00:00:00Z")
        assert ev(df, {"$isoWeek": "$t"}) == 53
        assert ev(df, {"$isoWeekYear": "$t"}) == 2020
        # 2023-01-01 is a Sunday: $week 1 immediately
        df = one(spark, t="2023-01-01T00:00:00Z")
        assert ev(df, {"$week": "$t"}) == 1
        assert ev(df, {"$dayOfWeek": "$t"}) == 1

    def test_date_object_form_and_tz(self, spark):
        df = one(spark, t="2024-03-05T00:00:00Z")
        assert ev(df, {"$year": {"date": "$t", "timezone": "UTC"}}) == 2024
        # round 4: named zones extract in local wall clock (NY is UTC-5
        # on March 5 -> still March 4 locally)
        assert ev(df, {"$dayOfMonth": {
            "date": "$t", "timezone": "America/New_York"}}) == 4

    def test_date_to_parts(self, spark):
        df = one(spark, t="2024-03-05T14:07:09.250Z")
        p = ev(df, {"$dateToParts": {"date": "$t"}}).asDict()
        assert p == {"year": 2024, "month": 3, "day": 5, "hour": 14,
                     "minute": 7, "second": 9, "millisecond": 250}
        iso = ev(df, {"$dateToParts": {"date": "$t",
                                       "iso8601": True}}).asDict()
        assert iso["isoWeekYear"] == 2024 and iso["isoWeek"] == 10
        assert iso["isoDayOfWeek"] == 2

    def test_date_from_parts_roundtrip(self, spark):
        df = one(spark, y=2024, mo=3, d=5)
        out = ev(df, {"$dateFromParts": {
            "year": "$y", "month": "$mo", "day": "$d",
            "hour": 14, "minute": 7, "second": 9, "millisecond": 250}})
        assert out == "2024-03-05T14:07:09.250Z"
        # iso8601 variant: ISO year 2024, week 10, Tuesday
        out = ev(df, {"$dateFromParts": {
            "isoWeekYear": 2024, "isoWeek": 10, "isoDayOfWeek": 2}})
        assert out == "2024-03-05T00:00:00Z"
        # defaults: month/day default to 1
        assert ev(df, {"$dateFromParts": {"year": 2024}}) == \
            "2024-01-01T00:00:00Z"


class TestRand:
    def test_rand_uniform_and_sample_rate(self, spark):
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        from pincette_json_streams_spark.operators.match import (
            compile_query,
        )
        df = spark.range(2000).toDF("i")
        vals = [r["v"] for r in df.select(
            compile_expr({"$rand": {}}, ctx_for(df)).alias("v")).collect()]
        assert all(0 <= v < 1 for v in vals)
        assert len(set(vals)) > 1900  # actually random per row
        n = df.filter(compile_query({"$sampleRate": 0.25},
                                    ctx_for(df))).count()
        assert 300 < n < 700  # ~500 expected


class TestIsNumber:
    def test_is_number(self, spark):
        df = spark.createDataFrame(
            [(3, 2.5, "7", None)],
            "i int, d double, s string, n string")
        assert ev(df, {"$isNumber": "$i"}) is True
        assert ev(df, {"$isNumber": "$d"}) is True
        assert ev(df, {"$isNumber": "$s"}) is False
        assert ev(df, {"$isNumber": "$n"}) is False
        assert ev(df, {"$isNumber": [["$i"]]}) is False  # array arg


class TestTimezones:
    """Per-operator timezone support (MongoDB shape, round 4): date
    parts extract in the given zone's wall clock; $dateFromParts
    re-anchors wall-clock parts from the zone to UTC.  Java zone
    rules drive DST."""

    def test_date_parts_in_zone(self, spark):
        df = one(spark, t="2024-06-30T23:30:00Z")
        # Brussels is UTC+2 in summer: 23:30Z = 01:30 next day local
        assert ev(df, {"$hour": {"date": {"$toDate": "$t"},
                                 "timezone": "Europe/Brussels"}}) == 1
        assert ev(df, {"$dayOfMonth": {"date": {"$toDate": "$t"},
                                       "timezone": "Europe/Brussels"}}) == 1
        assert ev(df, {"$month": {"date": {"$toDate": "$t"},
                                  "timezone": "Europe/Brussels"}}) == 7
        # fixed offsets work too
        assert ev(df, {"$hour": {"date": {"$toDate": "$t"},
                                 "timezone": "+05:30"}}) == 5
        # UTC spellings unchanged
        assert ev(df, {"$hour": {"date": {"$toDate": "$t"},
                                 "timezone": "UTC"}}) == 23

    def test_date_from_parts_in_zone(self, spark):
        df = one(spark, x=1)
        # 01:30 Brussels summer local == 23:30Z the previous day
        assert ev(df, {"$dateFromParts": {
            "year": 2024, "month": 7, "day": 1, "hour": 1, "minute": 30,
            "timezone": "Europe/Brussels"}}) == "2024-06-30T23:30:00Z"
        # winter: UTC+1
        assert ev(df, {"$dateFromParts": {
            "year": 2024, "month": 1, "day": 1, "hour": 1,
            "timezone": "Europe/Brussels"}}) == "2024-01-01T00:00:00Z"
        # overflow carry still composes with the zone shift
        assert ev(df, {"$dateFromParts": {
            "year": 2023, "month": 13, "day": 1, "hour": 1,
            "timezone": "Europe/Brussels"}}) == "2024-01-01T00:00:00Z"

    def test_non_constant_timezone_raises(self, spark):
        import pytest
        from pincette_json_streams_spark.operators.expressions import (
            UnsupportedExpression,
        )
        df = one(spark, x=1)
        with pytest.raises(UnsupportedExpression):
            ev(df, {"$hour": {"date": "$$NOW", "timezone": 5}})


class TestTimezonesCalendarMath:
    """$dateAdd/$dateDiff/$dateTrunc with a timezone: calendar math on
    the zone's wall clock (DST-aware, Mongo shape)."""

    def test_date_add_day_across_dst(self, spark):
        df = one(spark, x=1)
        # Brussels 2024-03-31 (spring forward): "one day later" at the
        # same local wall clock is only 23 real hours
        assert ev(df, {"$dateAdd": {
            "startDate": {"$toDate": "2024-03-30T12:00:00Z"},
            "unit": "day", "amount": 1,
            "timezone": "Europe/Brussels"}}) == "2024-03-31T11:00:00Z"
        # UTC path unchanged: exactly 24 h
        assert ev(df, {"$dateAdd": {
            "startDate": {"$toDate": "2024-03-30T12:00:00Z"},
            "unit": "day", "amount": 1}}) == "2024-03-31T12:00:00Z"

    def test_date_diff_boundaries_in_zone(self, spark):
        df = one(spark, x=1)
        # 21:00Z = 23:00 June 1 Brussels; 23:00Z = 01:00 June 2 local:
        # one local-midnight boundary crossed, zero UTC boundaries
        args = {"startDate": {"$toDate": "2024-06-01T21:00:00Z"},
                "endDate": {"$toDate": "2024-06-01T23:00:00Z"},
                "unit": "day"}
        assert ev(df, {"$dateDiff": dict(args)}) == 0
        assert ev(df, {"$dateDiff": dict(args,
                                         timezone="Europe/Brussels")}) == 1

    def test_date_trunc_in_zone(self, spark):
        df = one(spark, x=1)
        # local midnight in Brussels (summer, UTC+2) is 22:00Z
        assert ev(df, {"$dateTrunc": {
            "date": {"$toDate": "2024-06-15T13:45:00Z"}, "unit": "day",
            "timezone": "Europe/Brussels"}}) == "2024-06-14T22:00:00Z"
        assert ev(df, {"$dateTrunc": {
            "date": {"$toDate": "2024-06-15T13:45:00Z"},
            "unit": "day"}}) == "2024-06-15T00:00:00Z"
        # binSize path honors the zone too (2-hour bins on local clock)
        assert ev(df, {"$dateTrunc": {
            "date": {"$toDate": "2024-06-15T13:45:00Z"}, "unit": "hour",
            "binSize": 2, "timezone": "+05:30"}}) == "2024-06-15T12:30:00Z"

    def test_date_to_from_string_in_zone(self, spark):
        df = one(spark, x=1)
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-06-15T22:30:00Z"},
            "format": "%Y-%m-%d %H:%M",
            "timezone": "Europe/Brussels"}}) == "2024-06-16 00:30"
        assert ev(df, {"$dateFromString": {
            "dateString": "2024-06-16 00:30", "format": "%Y-%m-%d %H:%M",
            "timezone": "Europe/Brussels"}}) == "2024-06-15T22:30:00Z"
        # round trip through the zone is identity
        assert ev(df, {"$dateFromString": {
            "dateString": {"$dateToString": {
                "date": {"$toDate": "2024-03-31T05:15:00Z"},
                "format": "%d/%m/%Y %H:%M:%S",
                "timezone": "Asia/Kolkata"}},
            "format": "%d/%m/%Y %H:%M:%S",
            "timezone": "Asia/Kolkata"}}) == "2024-03-31T05:15:00Z"

    def test_date_to_string_offset_specifiers(self, spark):
        # Mongo %z = +HHMM, %Z = SIGNED MINUTES offset as a number
        # (docs.mongodb.com $dateToString) — NOT a zone name
        df = one(spark, x=1)
        base = {"date": {"$toDate": "2024-06-15T12:00:00Z"}}
        assert ev(df, {"$dateToString": {
            **base, "format": "%H:%M %z",
            "timezone": "Asia/Kolkata"}}) == "17:30 +0530"
        assert ev(df, {"$dateToString": {
            **base, "format": "%H:%M %Z",
            "timezone": "Asia/Kolkata"}}) == "17:30 +330"
        assert ev(df, {"$dateToString": {
            **base, "format": "%Z",
            "timezone": "America/New_York"}}) == "-240"
        assert ev(df, {"$dateToString": {
            **base, "format": "%z%Z"}}) == "+0000+0"

    def test_date_to_string_escaped_percent_z(self, spark):
        # R5 review lock: %%z is the LITERAL "%z", never the offset
        df = one(spark, x=1)
        base = {"date": {"$toDate": "2024-06-15T12:00:00Z"}}
        assert ev(df, {"$dateToString": {
            **base, "format": "%%z",
            "timezone": "Asia/Kolkata"}}) == "%z"
        assert ev(df, {"$dateToString": {
            **base, "format": "%%Z %z",
            "timezone": "Asia/Kolkata"}}) == "%Z +0530"

    def test_date_from_string_own_offset_not_double_shifted(self, spark):
        # R5 ADVICE lock: a dateString carrying its own offset keeps
        # the parsed instant — the timezone argument must not shift it
        # a second time (Mongo outright rejects the combination)
        df = one(spark, x=1)
        for s in ("2024-06-15T12:00:00+05:00",
                  "2024-06-15T12:00:00+0500"):
            assert ev(df, {"$dateFromString": {
                "dateString": s,
                "timezone": "Europe/Brussels"}}) == "2024-06-15T07:00:00Z"
        assert ev(df, {"$dateFromString": {
            "dateString": "2024-06-15T12:00:00Z",
            "timezone": "Asia/Kolkata"}}) == "2024-06-15T12:00:00Z"
        # offset-free strings still get the wall-clock interpretation
        assert ev(df, {"$dateFromString": {
            "dateString": "2024-06-15T12:00:00",
            "timezone": "+05:00"}}) == "2024-06-15T07:00:00Z"
        # plain dates must NOT false-positive as offset-bearing
        assert ev(df, {"$dateFromString": {
            "dateString": "2020-01-05", "format": "%Y-%m-%d",
            "timezone": "+05:00"}}) == "2020-01-04T19:00:00Z"


class TestTimezonePropertyVsZoneinfo:
    """Property lock: zone-aware operators agree with Python zoneinfo
    over instants straddling both 2024 DST transitions in three zones
    (one batched Spark job per operator, not per instant)."""

    ZONES = ["Europe/Brussels", "America/New_York", "Asia/Kolkata"]

    def _instants(self):
        from datetime import datetime, timedelta, timezone
        bases = [datetime(2024, 3, 30, 0, 17, tzinfo=timezone.utc),
                 datetime(2024, 10, 26, 0, 17, tzinfo=timezone.utc),
                 datetime(2024, 11, 2, 0, 17, tzinfo=timezone.utc)]
        return [b + timedelta(hours=h) for b in bases
                for h in range(0, 48, 5)]

    def test_parts_and_trunc_match_zoneinfo(self, spark):
        from datetime import timezone as _tz
        from zoneinfo import ZoneInfo
        insts = self._instants()
        df = spark.createDataFrame(
            [(d.strftime("%Y-%m-%dT%H:%M:%SZ"),) for d in insts],
            "t string")
        for tz in self.ZONES:
            zi = ZoneInfo(tz)
            exprs = {
                "h": {"$hour": {"date": {"$toDate": "$t"},
                                "timezone": tz}},
                "dom": {"$dayOfMonth": {"date": {"$toDate": "$t"},
                                        "timezone": tz}},
                "tr": {"$dateTrunc": {"date": {"$toDate": "$t"},
                                      "unit": "day", "timezone": tz}},
            }
            from pincette_json_streams_spark.operators.context import (
                ctx_for,
            )
            from pincette_json_streams_spark.operators.expressions import (
                compile_expr,
            )
            got = df.select(*[
                compile_expr(e, ctx_for(df)).alias(k)
                for k, e in exprs.items()
            ]).collect()
            for d, row in zip(insts, got):
                loc = d.astimezone(zi)
                assert row["h"] == loc.hour, (tz, d)
                assert row["dom"] == loc.day, (tz, d)
                mid = loc.replace(hour=0, minute=0, second=0,
                                  microsecond=0,
                                  tzinfo=None).replace(tzinfo=zi)
                want = mid.astimezone(_tz.utc).strftime(
                    "%Y-%m-%dT%H:%M:%SZ")
                assert row["tr"] == want, (tz, d, row["tr"], want)

    def test_date_add_subday_units_ignore_timezone(self, spark):
        # Mongo: timezone affects CALENDAR units only; adding 2 hours is
        # exactly 2 real hours even across a DST change in the zone
        df = one(spark, x=1)
        assert ev(df, {"$dateAdd": {
            "startDate": {"$toDate": "2024-03-31T00:30:00Z"},
            "unit": "hour", "amount": 2,
            "timezone": "Europe/Brussels"}}) == "2024-03-31T02:30:00Z"
        assert ev(df, {"$dateAdd": {
            "startDate": {"$toDate": "2024-03-31T00:30:00Z"},
            "unit": "minute", "amount": 90,
            "timezone": "Europe/Brussels"}}) == "2024-03-31T02:00:00Z"

    def test_date_to_string_offset_specifier_in_zone(self, spark):
        df = one(spark, x=1)
        # %z renders the ZONE's offset at that instant, DST-correct
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-06-15T12:00:00Z"},
            "format": "%H:%M %z",
            "timezone": "Europe/Brussels"}}) == "14:00 +0200"
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-01-15T12:00:00Z"},
            "format": "%H:%M %z",
            "timezone": "Europe/Brussels"}}) == "13:00 +0100"
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-06-15T12:00:00Z"},
            "format": "%z",
            "timezone": "America/New_York"}}) == "-0400"
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-06-15T12:00:00Z"},
            "format": "%z", "timezone": "+05:30"}}) == "+0530"
        # %z stays fine in UTC
        assert ev(df, {"$dateToString": {
            "date": {"$toDate": "2024-06-15T12:00:00Z"},
            "format": "%z"}}) == "+0000"


class TestHostileSpecMatrix:
    """Round-8 sweep: every registered operator crossed with malformed
    argument shapes must either compile or raise UnsupportedExpression
    naming the operator — never a raw Python traceback from inside a
    handler (the sweep found 48 operators leaking TypeError/KeyError/
    IndexError on specs like {$cond: true} or {$dateTrunc: null})."""

    HOSTILE = [None, True, 0, -3, 2.5, "", "x", [], [1], {"$x": 1},
               "$a", "$b", "$d", "$missing", ["$a"], ["$a", "$b"],
               ["$a", 1, None]]

    def test_no_raw_exceptions_at_compile(self, spark):
        from pincette_json_streams_spark.operators.context import (
            ctx_for,
        )
        from pincette_json_streams_spark.operators.expressions import (
            OPERATORS, UnsupportedExpression, compile_expr,
        )
        df = spark.createDataFrame(
            [(1, "s", 2.5, [1, 2], {"k": "v"})],
            "a long, b string, c double, d array<long>, "
            "e map<string,string>")
        ctx = ctx_for(df)
        crashes = []
        for op in sorted(OPERATORS):
            for arg in self.HOSTILE:
                try:
                    compile_expr({op: arg}, ctx)
                except UnsupportedExpression:
                    pass  # a NAMED spec error is the contract
                except Exception as e:  # noqa: BLE001
                    crashes.append(
                        (op, repr(arg)[:25], type(e).__name__))
        assert not crashes, crashes[:10]
