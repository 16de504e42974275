"""Golden source x sink matrix (the reference's primary coverage
strategy, SURVEY.md §5: apps 2/3/9-31 pair every stream-part source kind
with every sink kind; merge and join over all source kinds).  One
compact identity-pipeline app per combination, batch-executed."""

import pytest

from pincette_json_streams_spark.plans.planner import Application

PIPE = [{"$match": {"v": {"$gte": 0}}}]  # identity-ish (app28-31 pattern)


@pytest.fixture(scope="module")
def msgs(spark):
    return spark.createDataFrame(
        [("m1", 1), ("m2", 2), ("m3", 3)], "_id string, v int"
    )


def run(spec_parts, catalog):
    app = Application({"application": "gx", "parts": spec_parts}, catalog)
    return app


class TestSourceSinkMatrix:
    @pytest.mark.parametrize("source_key", ["fromTopic", "fromCollection"])
    @pytest.mark.parametrize("sink_key", ["toTopic", "toCollection"])
    def test_stream_part_combinations(self, msgs, source_key, sink_key):
        app = run([{"type": "stream", "name": "s", source_key: "src",
                    sink_key: "out", "pipeline": PIPE}], {"src": msgs})
        assert app.run_batch()["out"].count() == 3

    def test_from_stream_to_topic(self, msgs):
        app = run([
            {"type": "stream", "name": "a", "fromTopic": "src",
             "pipeline": PIPE},
            {"type": "stream", "name": "b", "fromStream": "a",
             "toTopic": "out", "pipeline": PIPE},
        ], {"src": msgs})
        assert app.run_batch()["out"].count() == 3

    def test_collection_source_stringifies_id(self, msgs):
        # fromCollection makes _id the message key as a string
        app = run([{"type": "stream", "name": "s",
                    "fromCollection": "src", "toTopic": "out",
                    "pipeline": []}], {"src": msgs})
        out = app.run_batch()["out"]
        assert dict(out.dtypes)["_id"] == "string"

    @pytest.mark.parametrize("source_list_key,source_key", [
        ("fromTopics", "fromTopic"),
        ("fromStreams", "fromStream"),
        ("fromCollections", "fromCollection"),
    ])
    def test_merge_over_source_kinds(self, msgs, source_list_key,
                                     source_key):
        parts = []
        if source_key == "fromStream":
            parts = [
                {"type": "stream", "name": "x", "fromTopic": "src",
                 "pipeline": PIPE},
                {"type": "stream", "name": "y", "fromTopic": "src",
                 "pipeline": PIPE},
                {"type": "merge", "name": "m",
                 source_list_key: ["x", "y"], "toTopic": "out"},
            ]
            catalog = {"src": msgs}
        else:
            parts = [{"type": "merge", "name": "m",
                      source_list_key: ["s1", "s2"], "toTopic": "out"}]
            catalog = {"s1": msgs, "s2": msgs}
        app = run(parts, catalog)
        assert app.run_batch()["out"].count() == 6

    def test_merge_mismatched_schemas_union_by_name(self, spark, msgs):
        other = spark.createDataFrame([("m9", "x")],
                                      "_id string, extra string")
        app = run([{"type": "merge", "name": "m",
                    "fromTopics": ["a", "b"], "toTopic": "out"}],
                  {"a": msgs, "b": other})
        out = app.run_batch()["out"]
        assert out.count() == 4
        assert set(out.columns) == {"_id", "v", "extra"}

    def test_join_over_stream_sources(self, spark, msgs):
        other = spark.createDataFrame([("m1", "L1"), ("m3", "L3")],
                                      "ref string, label string")
        app = run([
            {"type": "stream", "name": "left_s", "fromTopic": "src",
             "pipeline": PIPE},
            {"type": "join", "name": "j", "toTopic": "out",
             "left": {"fromStream": "left_s", "on": "$_id"},
             "right": {"fromTopic": "other", "on": "$ref"}},
        ], {"src": msgs, "other": other})
        out = app.run_batch()["out"].collect()
        assert sorted(r["_id"] for r in out) == ["m1", "m3"]
        # {_id, left, right} message shape (App.java:433-447)
        assert all(set(r.asDict()) == {"_id", "left", "right"}
                   for r in out)

    def test_join_without_window_is_unbounded(self, spark, msgs):
        # app34 pattern: window-less join = infinite buffer semantics
        other = spark.createDataFrame([("m2", "z")],
                                      "ref string, tag string")
        app = run([
            {"type": "join", "name": "j", "toTopic": "out",
             "left": {"fromTopic": "src", "on": "$_id"},
             "right": {"fromTopic": "other", "on": "$ref"}},
        ], {"src": msgs, "other": other})
        assert app.run_batch()["out"].count() == 1

    def test_unconsumed_stream_is_compiled_but_unsunk(self, msgs):
        app = run([
            {"type": "stream", "name": "dangling", "fromTopic": "src",
             "pipeline": PIPE},
            {"type": "stream", "name": "sunk", "fromTopic": "src",
             "toTopic": "out", "pipeline": PIPE},
        ], {"src": msgs})
        sinks = app.run_batch()
        assert "out" in sinks and "dangling" not in sinks
        assert app.stream("dangling").count() == 3
