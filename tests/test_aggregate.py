"""Event-sourcing aggregate tests (SURVEY.md §2.8;
reference spec /root/reference/docs/state.md)."""

import json

from pincette_json_streams_spark.streaming.aggregate import (
    compile_aggregate_batch,
    reduce_commands,
)
from pincette_json_streams_spark.plans.planner import Application


class TestReduceCommands:
    def test_put_command(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "name": "x", "v": 1}],
            None, "app-type",
        )
        purposes = [r["purpose"] for r in out]
        assert purposes == ["command", "aggregate", "event", "event-full",
                            "reply"]
        agg = out[1]["doc"]
        assert agg["_seq"] == 0 and agg["name"] == "x"
        assert agg["_type"] == "app-type"

    def test_seq_increments_and_ops_diff(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1},
             {"_id": "a1", "_command": "put", "v": 2, "w": 9}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["_seq"] for a in aggs] == [0, 1]
        events = [r["doc"] for r in out if r["purpose"] == "event"]
        ops2 = events[1]["_ops"]
        assert {"op": "replace", "path": "/v", "value": 2} in ops2
        assert {"op": "add", "path": "/w", "value": 9} in ops2

    def test_unchanged_put_only_replies(self):
        c = {"_id": "a1", "_command": "put", "v": 1}
        out = reduce_commands(None, [c, dict(c)], None, "t")
        purposes = [r["purpose"] for r in out]
        # second identical put -> no new event, just command+reply
        assert purposes == ["command", "aggregate", "event", "event-full",
                            "reply", "command", "reply"]

    def test_delete_command(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1},
             {"_id": "a1", "_command": "delete"}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["_deleted"] is True

    def test_patch_command(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1},
             {"_id": "a1", "_command": "patch",
              "_ops": [{"op": "replace", "path": "/v", "value": 5}]}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["v"] == 5 and aggs[-1]["_seq"] == 1

    def test_event_full_before_after(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1},
             {"_id": "a1", "_command": "put", "v": 2}],
            None, "t",
        )
        fulls = [r["doc"] for r in out if r["purpose"] == "event-full"]
        assert fulls[1]["_before"]["v"] == 1
        assert fulls[1]["_after"]["v"] == 2


class TestAggregatePart:
    def test_batch_aggregate(self, spark):
        commands = spark.createDataFrame(
            [("a1", "put", 10), ("a2", "put", 5), ("a1", "put", 20)],
            "_id string, _command string, v int",
        )
        app = Application(
            {"application": "shop", "parts": [
                {"type": "aggregate", "aggregateType": "cart"},
            ]},
            {"shop-cart-command": commands},
        )
        aggs = app.streams["shop-cart-aggregate"].collect()
        by_id = {}
        for r in aggs:
            doc = json.loads(r["value"])
            by_id.setdefault(doc["_id"], []).append(doc)
        assert [d["v"] for d in by_id["a1"]] == [10, 20]
        assert [d["_seq"] for d in by_id["a1"]] == [0, 1]
        assert by_id["a2"][0]["v"] == 5

        events = app.streams["shop-cart-event"].collect()
        assert all("_ops" in json.loads(r["value"]) for r in events)
