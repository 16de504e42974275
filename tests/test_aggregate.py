"""Event-sourcing aggregate tests (SURVEY.md §2.8;
reference spec /root/reference/docs/state.md)."""

import json

import pytest

from pincette_json_streams_spark.streaming.aggregate import (
    compile_aggregate_batch,
    reduce_commands,
)
from pincette_json_streams_spark.plans.planner import Application

# commands need a principal: no _jwt -> 403 Forbidden (app8 3_error fixture)
JWT = {"_jwt": {"sub": "system"}}


class TestReduceCommands:
    def test_put_command(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "name": "x", "v": 1}],
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
            [{**JWT, "_id": "a1", "_command": "put", "v": 1},
             {**JWT, "_id": "a1", "_command": "put", "v": 2, "w": 9}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["_seq"] for a in aggs] == [0, 1]
        events = [r["doc"] for r in out if r["purpose"] == "event"]
        ops2 = events[1]["_ops"]
        assert {"op": "replace", "path": "/v", "value": 2} in ops2
        assert {"op": "add", "path": "/w", "value": 9} in ops2

    def test_unchanged_put_only_replies(self):
        c = {**JWT, "_id": "a1", "_command": "put", "v": 1}
        out = reduce_commands(None, [c, dict(c)], None, "t")
        purposes = [r["purpose"] for r in out]
        # second identical put -> no new event, just command+reply
        assert purposes == ["command", "aggregate", "event", "event-full",
                            "reply", "command", "reply"]

    def test_delete_command(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "v": 1},
             {**JWT, "_id": "a1", "_command": "delete"}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["_deleted"] is True

    def test_patch_command(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "v": 1},
             {**JWT, "_id": "a1", "_command": "patch",
              "_ops": [{"op": "replace", "path": "/v", "value": 5}]}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["v"] == 5 and aggs[-1]["_seq"] == 1

    def test_event_full_before_after(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "v": 1},
             {**JWT, "_id": "a1", "_command": "put", "v": 2}],
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
            [{**JWT, "_id": "a1", "_command": "put", "_jwt": {"sub": "sys0"},
              "v": 1, "_acl": {"put": ["writer"]}},
             {**JWT, "_id": "a1", "_command": "put", "v": 2,
              "_jwt": {"sub": "u1", "roles": ["reader"]}}],
            None, "t",
        )
        replies = [r["doc"] for r in out if r["purpose"] == "reply"]
        assert replies[-1].get("_error") is True
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert len(aggs) == 1 and aggs[0]["v"] == 1

    def test_acl_role_match_and_write_fallback(self):
        state_cmds = [
            {**JWT, "_id": "a1", "_command": "put", "v": 1,
             "_acl": {"write": ["editor"]}},
            # no `patch` entry -> write fallback, role matches
            {**JWT, "_id": "a1", "_command": "patch",
             "_jwt": {"sub": "u1", "roles": ["editor"]},
             "_ops": [{"op": "replace", "path": "/v", "value": 9}]},
        ]
        out = reduce_commands(None, state_cmds, None, "t")
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert aggs[-1]["v"] == 9

    def test_acl_system_bypass(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "v": 1,
              "_acl": {"put": ["writer"]}},
             {**JWT, "_id": "a1", "_command": "put", "v": 2,
              "_acl": {"put": ["writer"]},
              "_jwt": {"sub": "system"}}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [1, 2]

    def test_seq_lock_ignores_stale_command(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "v": 1},
             # instance _seq is 0; a stale _seq -> ignored outright
             {**JWT, "_id": "a1", "_command": "put", "v": 2, "_seq": 5},
             {**JWT, "_id": "a1", "_command": "put", "v": 3, "_seq": 0}],
            None, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [1, 3]
        purposes = [r["purpose"] for r in out]
        assert purposes.count("reply") == 2  # stale command: no reply at all

    def test_validator_rejects_to_reply(self):
        out = reduce_commands(
            None,
            [{**JWT, "_id": "a1", "_command": "put", "qty": 50},
             {**JWT, "_id": "a1", "_command": "put", "qty": 5}],
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
            [{**JWT, "_id": "a1", "_command": "put", "v": 10},
             {**JWT, "_id": "a1", "_command": "put", "v": 3},
             {**JWT, "_id": "a1", "_command": "put", "v": 20}],
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
            [{**JWT, "_id": "a1", "_command": "put", "v": 1, "drop": True},
             {**JWT, "_id": "a1", "_command": "put", "v": 2}],
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
            None, [{**JWT, "_id": "a1", "_command": "scale", "v": 7}],
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
            [{**JWT, "_id": "a1", "_command": "add", "inc": 4},
             {**JWT, "_id": "a1", "_command": "add", "inc": 5}],
            reducer, "t",
        )
        aggs = [r["doc"] for r in out if r["purpose"] == "aggregate"]
        assert [a["v"] for a in aggs] == [4, 9]


class TestApp8Golden:
    """Replicas of the reference's plusminus-counter golden apps
    (src/test/resources/app8/35-39): the SAME command flow through every
    reducer form the reference ships — JSLT scripts with a namespaced
    import (app8), JQ scripts with a module import (app38), Mongo
    pipeline reducers (app37), and $jq/$jslt stage-form pipelines
    (app39) — plus include-chained validators and the $deduplicate
    preprocessor, end to end through the public Application surface."""

    OP_JSLT = "def decr(value) $value - 1\n\ndef incr(value) $value + 1\n"
    OP_JQ = "def decr: . - 1;\ndef incr: . + 1;\n"
    JSLT_PLUS = ('import "common/op.jslt" as op\n'
                 '.state | {"value": op:incr(.value), *: .}')
    JSLT_MINUS = ('import "common/op.jslt" as op\n'
                  '.state | {"value": op:decr(.value), *: .}')
    JSLT_PUT = '.command | {"_command": null, *: .}'
    JQ_PLUS = ('import "common/op.jq" as op;\n'
               '.state + {"value": .state.value | op::incr}')
    JQ_MINUS = ('import "common/op.jq" as op;\n'
                '.state + {"value": .state.value | op::decr}')
    JQ_PUT = '.command | del(._command)'
    PIPE_PLUS = [{"$replaceRoot": {"newRoot": "$state"}},
                 {"$addFields": {"value": {"$add": ["$value", 1]}}}]
    PIPE_MINUS = [{"$replaceRoot": {"newRoot": "$state"}},
                  {"$addFields": {"value": {"$subtract": ["$value", 1]}}}]
    PIPE_PUT = [{"$replaceRoot": {"newRoot": "$command"}},
                {"$unset": "_command"}]
    TYPE_V = {"conditions": [{"_type": "plusminus-counter"}]}
    OPERATOR_V = {"include": [TYPE_V],
                  "conditions": [{"value": {"$exists": False,
                                            "$code": "OPERATOR"}}]}

    REDUCER_FORMS = {
        "app8-jslt": (
            {"plus": {"jslt": JSLT_PLUS}, "minus": {"jslt": JSLT_MINUS},
             "put": {"jslt": JSLT_PUT}},
            {"common/op.jslt": OP_JSLT},
        ),
        "app38-jq": (
            {"plus": JQ_PLUS, "minus": JQ_MINUS, "put": JQ_PUT},
            {"common/op.jq": OP_JQ},
        ),
        "app37-pipeline": (
            {"plus": PIPE_PLUS, "minus": PIPE_MINUS, "put": PIPE_PUT},
            None,
        ),
        "app39-mixed": (
            {"plus": [{"$jq": JQ_PLUS.replace(
                'import "common/op.jq" as op;\n', ''
            ).replace("op::incr", ". + 1")}],
             "minus": [{"$jslt":
                        '.state | {"value": .value - 1, *: .}'}],
             "put": [{"$jslt": JSLT_PUT}]},
            None,
        ),
    }

    def _spec(self, form: str):
        reducers, imports = self.REDUCER_FORMS[form]
        commands = {}
        for name, red in reducers.items():
            commands[name] = {"reducer": red} \
                if not isinstance(red, dict) else dict(red)
            validator = {
                "put": {"include": [self.TYPE_V],
                        "conditions": [{"_command": "put"},
                                       {"value": 0, "$code": "INIT"}]},
            }.get(name) or {
                "include": [self.OPERATOR_V],
                "conditions": [{"_command": name}],
            }
            commands[name]["validator"] = validator
        part = {
            "type": "aggregate",
            "aggregateType": "plusminus-counter",
            "name": "plusminus",
            "preprocessor": [
                {"$deduplicate": {
                    "expression": {"$concat":
                                   ["$_id", "$_corr", "$_command"]},
                    "collection": "plusminus-duplicate-commands",
                    "cacheWindow": 5000}},
            ],
            "commands": commands,
        }
        if imports:
            part["scriptImports"] = imports
        return {"application": "app8", "parts": [part]}

    @pytest.fixture(params=list(REDUCER_FORMS))
    def form(self, request):
        return request.param

    def test_plusminus_counter_flow(self, spark, form):
        t = "plusminus-counter"
        rows = [
            # (_id, _corr, _command, value or None)
            ("c1", "k0", "put", 0),
            ("c1", "k1", "plus", None),
            ("c1", "k1", "plus", None),   # duplicate -> preprocessor drop
            ("c1", "k2", "plus", None),
            ("c1", "k3", "minus", None),
            ("c1", "k4", "put", 5),       # INIT violation -> reply error
            ("c1", "k5", "plus", 7),      # OPERATOR violation
            ("c2", "k6", "put", 0),
        ]
        commands = spark.createDataFrame(
            [(i, c, cmd, v, t, {"sub": "system"})
             for i, c, cmd, v in rows],
            "_id string, _corr string, _command string, value int, "
            "_type string, _jwt map<string,string>",
        ).coalesce(1)  # keep command order deterministic for the fold
        app = Application(self._spec(form), {f"{t}-command": commands})

        aggs = [json.loads(r["value"])
                for r in app.streams[f"{t}-aggregate"].collect()]
        c1 = [a["value"] for a in aggs if a["_id"] == "c1"]
        assert c1 == [0, 1, 2, 1]  # put, plus, plus, minus (dup dropped)
        assert [a["value"] for a in aggs if a["_id"] == "c2"] == [0]

        replies = [json.loads(r["value"])
                   for r in app.streams[f"{t}-reply"].collect()]
        errors = {r["_corr"]: r["errors"][0]["code"]
                  for r in replies if r.get("_error")}
        assert errors == {"k4": "INIT", "k5": "OPERATOR"}

        events = [json.loads(r["value"])
                  for r in app.streams[f"{t}-event"].collect()]
        c1_events = sorted(e["_seq"] for e in events if e["_id"] == "c1")
        assert c1_events == [0, 1, 2, 3]  # no holes in the event log
        assert all(e["_type"] == t for e in events)

    def test_wrong_type_rejected(self, spark):
        t = "plusminus-counter"
        commands = spark.createDataFrame(
            [("c1", "k0", "put", 0, "other-type", {"sub": "system"})],
            "_id string, _corr string, _command string, value int, "
            "_type string, _jwt map<string,string>",
        )
        app = Application(self._spec("app8-jslt"),
                          {f"{t}-command": commands})
        replies = [json.loads(r["value"])
                   for r in app.streams[f"{t}-reply"].collect()]
        assert replies[0]["_error"] is True
        assert app.streams[f"{t}-aggregate"].count() == 0


class TestAggregatePart:
    def test_batch_aggregate(self, spark):
        commands = spark.createDataFrame(
            [("a1", "put", 10, {"sub": "system"}),
             ("a2", "put", 5, {"sub": "system"}),
             ("a1", "put", 20, {"sub": "system"})],
            "_id string, _command string, v int, _jwt map<string,string>",
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
            [("c1", "put", "alice", 1, {"sub": "system"}),
             ("c2", "put", "alice", 2, {"sub": "system"}),
             ("c3", "put", "bob", 7, {"sub": "system"})],
            "_id string, _command string, user string, v int, "
            "_jwt map<string,string>",
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


class TestHrefs:
    def test_resolve_and_unresolve_walkers(self):
        from pincette_json_streams_spark.streaming.hrefs import (
            href_type, resolve_doc, unresolve_doc,
        )
        states = {"/app/t/a1": {"_id": "a1", "value": 3}}
        doc = {
            "x": 1,
            "other": {"href": "/app/t/a1"},
            "nested": [[{"href": "/app/t/a1"}], {"href": "/app/t/missing"}],
        }
        r = resolve_doc(doc, states.get)
        assert r["other"] == {"_id": "a1", "value": 3, "href": "/app/t/a1"}
        assert r["nested"][0][0]["value"] == 3
        # unresolvable links stay untouched
        assert r["nested"][1] == {"href": "/app/t/missing"}
        # round-trip: unresolve collapses every href carrier back
        u = unresolve_doc(r)
        assert u == {
            "x": 1, "other": {"href": "/app/t/a1"},
            "nested": [[{"href": "/app/t/a1"}],
                       {"href": "/app/t/missing"}],
        }
        assert href_type("/app36/resolve/abc") == "app36-resolve"
        assert href_type("not-a-href") is None
        assert href_type("/a/b") is None

    def test_aggregate_resolves_hrefs_between_instances(self, spark):
        """An add reducer reads a linked instance's state through its
        href (app36 pattern); stored state keeps the bare link."""
        import json as j
        from pincette_json_streams_spark import Application

        cmds = [
            {"_id": "a1", "_command": "put", "_jwt": {"sub": "system"},
             "value": 4},
            {"_id": "b2", "_command": "put", "_jwt": {"sub": "system"},
             "value": 0, "link": {"href": "/shop-acct/a1"}},
        ]
        # hold: "/<app>/<type>/<id>" -> app=shop type=acct
        cmds[1]["link"] = {"href": "/shop/acct/a1"}
        commands = spark.createDataFrame(
            [(j.dumps(c),) for c in cmds], "js string"
        )
        from pyspark.sql import functions as F
        commands = commands.select(
            F.get_json_object("js", "$._id").alias("_id"),
            F.get_json_object("js", "$._command").alias("_command"),
            F.from_json(F.get_json_object("js", "$._jwt"),
                        "sub string").alias("_jwt"),
            F.get_json_object("js", "$.value").cast("int").alias("value"),
            F.from_json(F.get_json_object("js", "$.link"),
                        "href string").alias("link"),
        )
        app = Application(
            {"application": "shop", "parts": [
                {"type": "aggregate", "aggregateType": "acct",
                 "resolveHrefs": True,
                 "commands": {
                     "put": {},
                     "add": {"reducer": [
                         {"$replaceWith": "$state"},
                         {"$set": {"value": {"$add": [
                             "$value", "$link.value"]}}},
                     ]},
                 }},
            ]},
            {"shop-acct-command": commands.unionByName(
                spark.createDataFrame(
                    [("b2", "add", {"sub": "system"}, None, None)],
                    commands.schema,
                ), allowMissingColumns=True)},
        )
        aggs = [j.loads(r["value"])
                for r in app.streams["shop-acct-aggregate"].collect()]
        final_b2 = max((d for d in aggs if d["_id"] == "b2"),
                       key=lambda d: d["_seq"])
        # add saw link.value = 4 through the href; stored link stays bare
        assert final_b2["value"] == 4
        assert final_b2["link"] == {"href": "/shop/acct/a1"}
