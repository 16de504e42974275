"""Validator composition tests (docs/validator.md: conditions/$code,
macros, include, ref, nested validators)."""

from pincette_json_streams_spark.operators.stages import (
    PipelineContext,
    compile_pipeline,
)


def validate(df, spec):
    out = compile_pipeline(df, [{"$validate": spec}], PipelineContext())
    return {r["_id"]: r.asDict(recursive=True) for r in out.collect()}


class TestValidator:
    def test_code_and_location(self, spark):
        df = spark.createDataFrame([("a", 5), ("b", 50)],
                                   "_id string, qty int")
        got = validate(df, {"conditions": [
            {"qty": {"$lte": 10, "$code": "TOOBIG"}}]})
        assert got["a"]["_error"] is False and got["a"]["errors"] is None
        assert got["b"]["errors"] == [{"location": "/qty",
                                       "code": "TOOBIG"}]

    def test_apply_only_if_present(self, spark):
        df = spark.createDataFrame([("a", None), ("b", "x")],
                                   "_id string, opt string")
        got = validate(df, {"conditions": [
            {"opt": {"$regex": "^y", "$code": "BAD"}}]})
        # absent field -> condition does not fire (docs/validator.md:3)
        assert got["a"]["_error"] is False
        assert got["b"]["_error"] is True

    def test_exists_fires_on_absence(self, spark):
        df = spark.createDataFrame([("a", None)], "_id string, req string")
        got = validate(df, {"conditions": [
            {"req": {"$exists": True, "$code": "REQ"}}]})
        assert got["a"]["errors"][0]["code"] == "REQ"

    def test_macros(self, spark):
        df = spark.createDataFrame([("a", "zz")], "_id string, v string")
        got = validate(df, {
            "macros": {"vals": {"$in": ["x", "y"]}},
            "conditions": [{"v": "_vals_"}],
        })
        assert got["a"]["_error"] is True

    def test_include_merges_conditions(self, spark):
        df = spark.createDataFrame([("a", 50, "zz")],
                                   "_id string, qty int, v string")
        # the spec loader inlines included files to dicts; the validator
        # merges their conditions and macros
        got = validate(df, {
            "include": [{"macros": {"vals": {"$in": ["x"]}},
                         "conditions": [{"v": "_vals_"}]}],
            "conditions": [{"qty": {"$lte": 10, "$code": "TOOBIG"}}],
        })
        codes = {e["code"] for e in got["a"]["errors"]}
        assert codes == {None, "TOOBIG"}

    def test_nested_and_ref(self, spark):
        df = spark.createDataFrame(
            [("a", ("Ghent", "9000")), ("b", ("X", "nope"))],
            "_id string, address struct<city:string, zip:string>",
        )
        nested = {"conditions": [{"zip": {"$regex": "^[0-9]{4}$",
                                          "$code": "ZIP"}}]}
        got = validate(df, {"conditions": [{"address": {"ref": nested}}]})
        assert got["a"]["_error"] is False
        assert got["b"]["errors"] == [{"location": "/address/zip",
                                       "code": "ZIP"}]
