"""Plugin registry: the engine's extensibility surface (reference:
docs/plugins.md:3-13 — plugins contribute stages, expression operators,
match operators and JSLT functions; Plugins.java:29,70-71)."""

import pytest
from pyspark.sql import functions as F

from pincette_json_streams_spark import plugins
from pincette_json_streams_spark.operators.expressions import (
    UnsupportedExpression,
)
from pincette_json_streams_spark.operators.stages import (
    PipelineContext,
    compile_pipeline,
)


@pytest.fixture
def clean():
    names = ["$double", "$tripled", "$divisibleBy", "reverse-words"]
    yield
    for n in names:
        plugins.unregister(n)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "one two"), (2, "three four"), (3, "five six")],
        "n int, words string",
    )


def test_custom_stage(spark, clean):
    plugins.register_stage(
        "$double", lambda df, spec, pctx: df.withColumn(
            spec["as"], F.col(spec["field"]) * 2)
    )
    out = compile_pipeline(
        _docs(spark),
        [{"$double": {"field": "n", "as": "n2"}},
         {"$match": {"n2": {"$gte": 4}}}],
        PipelineContext(),
    )
    assert sorted(r.n2 for r in out.collect()) == [4, 6]


def test_custom_expression_operator(spark, clean):
    from pincette_json_streams_spark.operators.expressions import compile_expr

    plugins.register_operator(
        "$tripled",
        lambda args, ctx: compile_expr(args, ctx) * 3,
    )
    out = compile_pipeline(
        _docs(spark),
        [{"$project": {"_id": 0, "t": {"$tripled": "$n"}}}],
        PipelineContext(),
    )
    assert sorted(r.t for r in out.collect()) == [3, 6, 9]


def test_custom_match_operator(spark, clean):
    plugins.register_match_operator(
        "$divisibleBy", lambda col, arg, ctx: col % arg == 0
    )
    out = compile_pipeline(
        _docs(spark),
        [{"$match": {"n": {"$divisibleBy": 3}}}],
        PipelineContext(),
    )
    assert [r.n for r in out.collect()] == [3]


def test_custom_jslt_function(spark, clean):
    plugins.register_jslt_function(
        "reverse-words", lambda s: " ".join(reversed(s.split()))
    )
    out = compile_pipeline(
        _docs(spark),
        [{"$jslt": {"script": '{"r": reverse-words(.words)}',
                    "schema": "r string"}}],
        PipelineContext(),
    )
    assert sorted(r.r for r in out.collect()) == [
        "four three", "six five", "two one"]


def test_unknown_still_raises(spark, clean):
    with pytest.raises(UnsupportedExpression):
        compile_pipeline(_docs(spark), [{"$nope": {}}],
                         PipelineContext()).collect()


def test_plugin_cannot_shadow_core(spark, clean):
    # registering a name the core already owns is inert: core wins
    plugins.register_stage("$match", lambda df, spec, pctx: df.limit(0))
    try:
        out = compile_pipeline(
            _docs(spark), [{"$match": {"n": 1}}], PipelineContext())
        assert out.count() == 1
    finally:
        plugins.unregister("$match")


def test_entry_point_loader_runs():
    # no plugins installed in this environment: loader returns 0, no error
    assert plugins.load_entry_point_plugins() == 0
