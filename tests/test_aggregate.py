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


class TestAdmission:
    """Command admission: ACL, _seq lock, validators, preprocessors
    (docs/state.md:53-232)."""

    def test_acl_denies_without_role(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "_jwt": {"sub": "sys0"},
              "v": 1, "_acl": {"put": ["writer"]}},
             {"_id": "a1", "_command": "put", "v": 2,
              "_jwt": {"sub": "u1", "roles": ["reader"]}}],
            None, "t",
        )
        replies = [r["doc"] for r in out if r["purpose"] == "reply"]
        assert replies[-1].get("_error") is True
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert len(aggs) == 1 and aggs[0]["v"] == 1

    def test_acl_role_match_and_write_fallback(self):
        state_cmds = [
            {"_id": "a1", "_command": "put", "v": 1,
             "_acl": {"write": ["editor"]}},
            # no `patch` entry -> write fallback, role matches
            {"_id": "a1", "_command": "patch",
             "_jwt": {"sub": "u1", "roles": ["editor"]},
             "_ops": [{"op": "replace", "path": "/v", "value": 9}]},
        ]
        out = reduce_commands(None, state_cmds, None, "t")
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["v"] == 9

    def test_acl_system_bypass(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1,
              "_acl": {"put": ["writer"]}},
             {"_id": "a1", "_command": "put", "v": 2,
              "_acl": {"put": ["writer"]},
              "_jwt": {"sub": "system"}}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [1, 2]

    def test_seq_lock_ignores_stale_command(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1},
             # instance _seq is 0; a stale _seq -> ignored outright
             {"_id": "a1", "_command": "put", "v": 2, "_seq": 5},
             {"_id": "a1", "_command": "put", "v": 3, "_seq": 0}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [1, 3]
        purposes = [r["purpose"] for r in out]
        assert purposes.count("reply") == 2  # stale command: no reply at all

    def test_validator_rejects_to_reply(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "qty": 50},
             {"_id": "a1", "_command": "put", "qty": 5}],
            None, "t",
            validators={"put": {"conditions": [
                {"qty": {"$lte": 10, "$code": "TOOBIG"}},
            ]}},
        )
        replies = [r["doc"] for r in out if r["purpose"] == "reply"]
        assert replies[0]["_error"] is True
        assert replies[0]["errors"] == [
            {"location": "/qty", "code": "TOOBIG"}]
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert len(aggs) == 1 and aggs[0]["qty"] == 5

    def test_validator_sees_state(self):
        # value may only grow: validator references the current state
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 10},
             {"_id": "a1", "_command": "put", "v": 3},
             {"_id": "a1", "_command": "put", "v": 20}],
            None, "t",
            validators={"put": {"conditions": [
                {"$expr": {"$or": [
                    {"$eq": [{"$ifNull": ["$_state.v", None]}, None]},
                    {"$gt": ["$v", "$_state.v"]},
                ]}, "v": {"$exists": True}},
            ]}},
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [10, 20]

    def test_preprocessor_transforms_and_drops(self):
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "put", "v": 1, "drop": True},
             {"_id": "a1", "_command": "put", "v": 2}],
            None, "t",
            part_preprocessor=[
                {"$match": {"drop": {"$exists": False}}},
                {"$set": {"v2": {"$multiply": ["$v", 10]}}},
            ],
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert len(aggs) == 1
        assert aggs[0]["v"] == 2 and aggs[0]["v2"] == 20
        # dropped command still echoes on the command stream
        assert [r["purpose"] for r in out].count("command") == 2

    def test_jslt_script_reducer(self):
        from pincette_json_streams_spark.streaming.reducers import (
            pipeline_reducer,
        )
        reducer = pipeline_reducer({"scale": {"jslt":
            '{"_id": .command._id, "v": .command.v * 3}'}})
        out = reduce_commands(
            None, [{"_id": "a1", "_command": "scale", "v": 7}],
            reducer, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[0]["v"] == 21

    def test_jq_script_reducer(self):
        from pincette_json_streams_spark.streaming.reducers import (
            pipeline_reducer,
        )
        reducer = pipeline_reducer(
            {"add": '.state + {v: ((.state.v // 0) + .command.inc)}'})
        out = reduce_commands(
            None,
            [{"_id": "a1", "_command": "add", "inc": 4},
             {"_id": "a1", "_command": "add", "inc": 5}],
            reducer, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [4, 9]


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

    def test_unique_expression_converges_instances(self, spark):
        """Distinct _ids sharing a business key fold into ONE instance
        whose _id is the first command's (docs/state.md:176-197)."""
        commands = spark.createDataFrame(
            [("c1", "put", "alice", 1), ("c2", "put", "alice", 2),
             ("c3", "put", "bob", 7)],
            "_id string, _command string, user string, v int",
        )
        app = Application(
            {"application": "shop", "parts": [
                {"type": "aggregate", "aggregateType": "acct",
                 "uniqueExpression": "$user"},
            ]},
            {"shop-acct-command": commands},
        )
        aggs = [json.loads(r["value"])
                for r in app.streams["shop-acct-aggregate"].collect()]
        by_user = {}
        for d in aggs:
            by_user.setdefault(d["user"], []).append(d)
        assert len({d["_id"] for d in by_user["alice"]}) == 1
        assert sorted(d["_seq"] for d in by_user["alice"]) == [0, 1]
        assert by_user["bob"][0]["_seq"] == 0
