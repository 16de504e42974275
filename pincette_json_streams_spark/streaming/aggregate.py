"""Event-sourcing aggregate part (docs/state.md; wired App.java:605-634 —
SURVEY.md §2.8).

Commands keyed by ``_id`` fold through a reducer into aggregate state;
each accepted command emits ``aggregate``, ``command``, ``event``,
``event-full`` and ``reply`` streams.

Spark mapping:
  - batch (this module): ``applyInPandas`` over ``_id`` groups — the fold
    is per-key sequential by definition (the reference serializes commands
    per aggregate instance through Kafka key partitioning), so grouped
    Pandas execution is the faithful distributed analogue: parallel across
    keys, ordered within a key.
  - streaming: ``transformWithStateInPandas`` keyed the same way
    (pincette_json_streams_spark.streaming.runtime — later round).

Reducers: built-ins ``put``/``delete``/``patch`` (docs/state.md:95),
pipeline reducers (a Mongo pipeline over ``{command, state}`` documents)
and JQ/JSLT script reducers through the embedded interpreters
(functions/jq_subset.py, functions/jslt_subset.py — the reference's
preferred reducer form, docs/index.md:11).

Command admission, in reference order (docs/state.md:53-232):
``preprocessor`` pipelines (part-level then per-command), the ``_seq``
optimistic lock (mismatch -> command ignored), the ``_acl`` role check
against ``_jwt.roles`` (``write`` fallback, ``sub == "system"`` bypass;
denial -> reply with ``_error``), then the per-command validator
(failure -> reply with ``_error`` + ``errors``).  ``uniqueExpression``
re-keys commands so instances converge on a business key; the instance
keeps the ``_id`` of the first command per key (docs/state.md:176-197).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["compile_aggregate_batch", "reduce_commands", "acl_allows"]


def acl_allows(state: dict | None, cmd: dict) -> bool:
    """Instance-level access control (docs/state.md:199-232): the current
    state's ``_acl.<command>`` role list must intersect the command's
    ``_jwt.roles``; missing command entry falls back to ``_acl.write``;
    no ``_acl`` (or no applicable entry) allows; ``_jwt.sub == "system"``
    always allows."""
    jwt = cmd.get("_jwt") or {}
    if jwt.get("sub") == "system":
        return True
    acl = (state or {}).get("_acl")
    if not isinstance(acl, dict):
        return True
    command = cmd.get("_command")
    roles = acl.get(command) if command in acl else acl.get("write")
    if roles is None:
        return True
    have = jwt.get("roles") or []
    return bool(set(roles) & set(have))


def _ptr(key: str) -> str:
    # RFC-6901 token escaping
    return key.replace("~", "~0").replace("/", "~1")


def _diff_ops(before: dict, after: dict, prefix: str = "") -> list[dict]:
    """RFC-6902 diff (add/remove/replace) between two JSON objects.

    Deterministic DOCUMENT order — removes in `before` order, then
    adds/replaces in `after` insertion order — matching the reference's
    event `_ops` fixtures (app36 3-put: ops follow the command's field
    order; jsonpatch.make_patch emits a set-dependent order and was
    replaced for exactly that reason)."""
    ops: list[dict] = []
    for k in before:
        if k not in after:
            ops.append({"op": "remove", "path": f"{prefix}/{_ptr(k)}"})
    for k in after:
        p = f"{prefix}/{_ptr(k)}"
        if k not in before:
            ops.append({"op": "add", "path": p, "value": after[k]})
        elif before[k] != after[k]:
            if isinstance(before[k], dict) and isinstance(after[k], dict):
                ops.extend(_diff_ops(before[k], after[k], p))
            else:
                ops.append({"op": "replace", "path": p,
                            "value": after[k]})
    return ops


_TECH = ("_id", "_corr", "_type", "_command", "_jwt", "_timestamp", "_seq",
         "_deleted", "_error", "errors", "_ops", "_before", "_after",
         "_languages")


def reduce_commands(
    state: dict | None,
    commands: list[dict],
    reducer: Any,
    agg_type: str,
    now_millis: int = 0,
    validators: dict[str, dict] | None = None,
    preprocessors: dict[str, list] | None = None,
    part_preprocessor: list | None = None,
    resolver: Any = None,
    lenient: bool = False,
) -> list[dict]:
    """Fold `commands` (ordered) into `state`; emit output records tagged
    with a `purpose` in {aggregate, event, event-full, reply, command}.

    Admission order per command: preprocessors -> ``_seq`` lock -> ACL ->
    validator -> reducer (module docstring has the spec references).

    ``resolver`` (href -> state dict or None) enables jes href
    resolution around the validator+reducer, mirroring the reference's
    resolve -> validate -> reduce -> unresolve pipe (App.java:808-811;
    streaming/hrefs.py).  ``lenient`` swallows reducer exceptions as
    no-ops — used by the phase-1 resolution-source fold, where reducers
    that need resolution would otherwise crash on unexpanded links."""
    from pincette_json_streams_spark.operators.validator import validate_doc
    from pincette_json_streams_spark.streaming.reducers import (
        run_pipeline_doc,
    )

    out: list[dict] = []
    seq = (state or {}).get("_seq", -1)
    cur = dict(state or {})

    for cmd in commands:
        out.append({"purpose": "command", "doc": cmd})
        if part_preprocessor:
            cmd = run_pipeline_doc(part_preprocessor, cmd)
            if cmd is None:
                continue
        command = cmd.get("_command")
        pre = (preprocessors or {}).get(command)
        if pre:
            cmd = run_pipeline_doc(pre, cmd)
            if cmd is None:
                continue
            command = cmd.get("_command")
        # optimistic lock (docs/state.md:72): a command carrying _seq must
        # match the instance's sequence, else it is ignored outright
        if cmd.get("_seq") is not None and cmd["_seq"] != seq:
            continue
        # a command without a principal is forbidden, as is one whose
        # roles fail the _acl gate — 403 reply, the reference's shape
        # (app8 fixture 3_error.json -> reply: _statusCode 403 Forbidden)
        if "_jwt" not in cmd or not acl_allows(cur, cmd):
            denied = dict(cmd)
            denied["_error"] = True
            denied["_statusCode"] = 403
            denied["message"] = "Forbidden"
            out.append({"purpose": "reply", "doc": denied})
            continue
        # href links expand for the validator and reducer only; stored
        # state and built-in fallbacks stay unresolved
        if resolver is not None:
            from pincette_json_streams_spark.streaming.hrefs import (
                resolve_doc, unresolve_doc,
            )
            cmd_eff = resolve_doc(cmd, resolver)
            cur_eff = resolve_doc(cur, resolver)
        else:
            cmd_eff, cur_eff = cmd, cur
        vspec = (validators or {}).get(command)
        if vspec:
            errs = validate_doc(vspec, {**cmd_eff, "_state": cur_eff or {}})
            if errs:
                invalid = dict(cmd)
                invalid["_error"] = True
                invalid["errors"] = errs
                out.append({"purpose": "reply", "doc": invalid})
                continue
        # a custom reducer for the command name overrides the built-ins
        # (the reference's corpus ships its own put reducers, e.g.
        # src/test/resources/app8/reducers/put.jslt); reducer -> None
        # means "no reducer declared for this command"
        if reducer is not None:
            try:
                new = reducer(cur_eff, cmd_eff)
            except Exception:
                if not lenient:
                    raise
                new = None
            if new is not None and resolver is not None:
                new = unresolve_doc(new)
        else:
            new = None
        if new is None:
            if command == "put":
                new = {
                    k: v for k, v in cmd.items()
                    if k not in ("_command", "_jwt") or k == "_id"
                }
                new.pop("_command", None)
            elif command == "delete":
                new = dict(cur)
                new["_deleted"] = True
            elif command == "patch":
                try:
                    import jsonpatch

                    clean = {k: v for k, v in cur.items() if k not in
                             ("_seq", "_timestamp")}
                    new = jsonpatch.apply_patch(clean, cmd.get("_ops", []))
                except Exception:
                    new = dict(cur)
            else:
                new = dict(cur)

        _meta = ("_seq", "_timestamp", "_type", "_corr", "_jwt")
        before = {k: v for k, v in cur.items() if k != "_timestamp"}
        after_cmp = {k: v for k, v in new.items() if k not in _meta}
        before_cmp = {k: v for k, v in before.items() if k not in _meta}
        if after_cmp == before_cmp:
            # unchanged -> only a reply with the current state
            out.append({"purpose": "reply", "doc": cur or cmd})
            continue

        seq += 1
        new_state = dict(after_cmp)
        new_state["_id"] = cmd.get("_id")
        new_state["_type"] = agg_type
        if "_corr" in cmd:
            new_state["_corr"] = cmd["_corr"]
        if "_jwt" in cmd:
            new_state["_jwt"] = cmd["_jwt"]
        new_state["_seq"] = seq

        ops = _diff_ops(
            {k: v for k, v in before_cmp.items() if k not in _TECH},
            {k: v for k, v in after_cmp.items() if k not in _TECH},
        )
        event = {
            "_id": cmd.get("_id"),
            "_corr": cmd.get("_corr"),
            "_type": agg_type,
            "_command": command,
            "_seq": seq,
            "_timestamp": now_millis,
            "_ops": ops,
        }
        if "_jwt" in cmd:
            # events propagate the command's JWT (docs/state.md:86;
            # app8 event fixtures)
            event["_jwt"] = cmd["_jwt"]
        event_full = dict(event)
        # _before/_after carry the state WITHOUT _jwt; a brand-new
        # instance's "before" is the seeded empty instance {_id, _type}
        # (app8 event-full fixtures)
        before_pub = {k: v for k, v in before.items() if k != "_jwt"}
        if not before_pub:
            before_pub = {"_id": cmd.get("_id"), "_type": agg_type}
        event_full["_before"] = before_pub
        event_full["_after"] = {
            k: v for k, v in new_state.items() if k != "_jwt"
        }

        out.append({"purpose": "aggregate", "doc": new_state})
        out.append({"purpose": "event", "doc": event})
        out.append({"purpose": "event-full", "doc": event_full})
        out.append({"purpose": "reply", "doc": new_state})
        cur = dict(new_state)
    return out


def attach_resolved_maps(
    ordered: DataFrame, states: DataFrame, full_type: str
) -> DataFrame:
    """Join-based href resolution plumbing for the BATCH fold: extract
    hrefs of ``full_type`` from each key's command JSON, equi-join them
    against ``states`` (``__rid``/``__state`` columns: aggregate _id ->
    state JSON), and attach a per-key ``__resolved`` JSON map column.
    ``ordered`` needs ``__key``/``__json`` columns; everything stays a
    join — no driver reads at any size.

    Batch-only by necessity: in streaming this chain (stateful
    per-key aggregation + join back into the stream ahead of the
    stateful fold) is an illegal multi-stateful-operator plan; the
    streaming aggregate takes an injectable ``href_lookup`` point-read
    instead — the reference's own shape (async Mongo reads per
    command)."""
    seg = F.split(F.col("__href"), "/")
    hrefs = (
        ordered.select(
            "__key",
            F.explode(F.array_distinct(F.regexp_extract_all(
                "__json", F.lit(r'"href"\s*:\s*"([^"]+)"'), 1
            ))).alias("__href"),
        )
        # only links to THIS aggregate type resolve from the state side
        .filter(
            (F.size(seg) == 4)
            & (F.concat_ws(
                "-", F.element_at(seg, 2), F.element_at(seg, 3)
            ) == full_type)
        )
        .withColumn("__rid", F.element_at(seg, 4))
        .distinct()
    )
    resolved = (
        hrefs.join(states, "__rid")
        .groupBy("__key")
        .agg(F.to_json(F.map_from_entries(F.collect_list(
            F.struct("__href", "__state")
        ))).alias("__resolved"))
    )
    return ordered.join(resolved, "__key", "left")


def compile_aggregate_batch(part: dict, app) -> dict[str, DataFrame]:
    """Batch-mode aggregate: fold the `<app>-<type>-command` source per key.

    Returns one DataFrame per purpose stream, named
    `<app>-<type>-{aggregate,command,event,event-full,reply}`
    (docs/state.md:97-127).  Values are JSON strings (the schemaless
    message payload); downstream pipelines parse what they need.
    """
    app_name = part.get("application") or app.spec["application"]
    agg_type = part.get("aggregateType", part.get("name"))
    full = f"{app_name}-{agg_type}" if "-" not in agg_type else agg_type
    cmd_topic = f"{full}-command"
    source = app.catalog.get(cmd_topic)
    if source is None:
        raise KeyError(f"aggregate command topic {cmd_topic!r} not in catalog")

    reducer = None
    validators: dict = {}
    preprocessors: dict = {}
    if "commands" in part:
        # per-command reducers: Mongo pipelines (row interpreter), JQ or
        # JSLT scripts; scriptImports carries inlined jq imports
        # (Common.java:803-846).  validator/preprocessor sub-fields per
        # docs/state.md:53-63.
        from pincette_json_streams_spark.streaming.reducers import (
            pipeline_reducer,
        )
        reducer = pipeline_reducer(part["commands"],
                                   part.get("scriptImports"))
        for cname, cspec in part["commands"].items():
            if isinstance(cspec, dict):
                if isinstance(cspec.get("validator"), dict):
                    validators[cname] = cspec["validator"]
                if isinstance(cspec.get("preprocessor"), list):
                    preprocessors[cname] = cspec["preprocessor"]
    # arrival order is assigned BEFORE the preprocessor: its stages (e.g.
    # app8's $deduplicate) shuffle, and the fold must still replay
    # commands in command-topic order
    # reference trace subparts `<part>.command.<command>`
    # (docs/telemetry.md metrics-attribute table): correlated commands
    # trace with their command name before entering the fold
    if "_command" in source.columns:
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        pname = part.get("name", agg_type)
        source = emit_event_traces(
            source, f"{pname}.command", app.pctx, part=pname,
            name_expr=F.concat(
                F.lit(f"{pname}.command."),
                F.coalesce(F.col("_command").cast("string"),
                           F.lit("unknown"))))
    source = source.withColumn(
        "__order", F.monotonically_increasing_id()
    )
    # the part-level preprocessor sits between the command topic and the
    # reducer (docs/state.md:53) — a full pipeline on the command STREAM,
    # so stateful stages like app8's $deduplicate preprocessor work.
    # Per-command preprocessors stay row-level inside the fold.
    part_pre = part.get("preprocessor")
    if part_pre:
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        source = compile_pipeline(source, part_pre, app.pctx)
        part_pre = None
    # per-command preprocessors likewise run as DataFrame pipelines over
    # the subset with that command name (app35's put-deduplicate), so
    # stateful stages work; arrival order survives through __order
    if preprocessors:
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        for cname, pp in preprocessors.items():
            sub = compile_pipeline(
                source.filter(F.col("_command") == cname), pp, app.pctx
            )
            source = source.filter(
                (F.col("_command") != cname)
                | F.col("_command").isNull()
            ).unionByName(sub, allowMissingColumns=True)
        preprocessors = {}
    unique = part.get("uniqueExpression")

    def make_fold(with_resolver: bool, lenient: bool):
        def fold(key, pdf):
            import pandas as pd

            pdf = pdf.sort_values("__order")
            cmds = [json.loads(r) for r in pdf["__json"]]
            if unique is not None and cmds:
                # instances converge on the business key; the instance
                # _id is the first command's (docs/state.md:176-197)
                first_id = cmds[0].get("_id")
                cmds = [{**c, "_id": first_id} for c in cmds]
            resolver = None
            if with_resolver:
                raw = next(
                    (v for v in pdf["__resolved"] if isinstance(v, str)),
                    None,
                )
                if raw:
                    states = {h: json.loads(s)
                              for h, s in json.loads(raw).items()}
                    resolver = states.get
            recs = reduce_commands(
                None, cmds, reducer, full,
                validators=validators, preprocessors=preprocessors,
                part_preprocessor=part_pre,
                resolver=resolver, lenient=lenient,
            )
            return pd.DataFrame(
                {
                    "purpose": [r["purpose"] for r in recs],
                    "value": [json.dumps(r["doc"]) for r in recs],
                    "_id": [r["doc"].get("_id") for r in recs],
                }
            )
        return fold

    if unique is not None:
        # re-key on the unique expression (the reference's `unique` topic:
        # one shuffle on the business key, docs/state.md:124)
        from pincette_json_streams_spark.operators.context import ctx_for
        from pincette_json_streams_spark.operators.expressions import (
            compile_expr,
        )
        key_col = F.to_json(F.struct(
            compile_expr(unique, ctx_for(source)).alias("__u")
        ))
    else:
        key_col = F.col("_id").cast("string")
    payload = [c for c in source.columns if c != "__order"]
    ordered = source.select(
        key_col.alias("__key"),
        F.to_json(F.struct(*payload)).alias("__json"),
        "__order",
    )
    out_schema = "purpose string, value string, _id string"

    # jes href resolution (streaming/hrefs.py): opt-in because it costs a
    # second fold — the resolution SOURCE is the phase-1 (lenient,
    # resolution-free) fold of the same commands, so everything stays a
    # join: extract hrefs of this aggregate type from the command JSON,
    # equi-join them against the phase-1 final states, and ship each
    # key's resolved map into the phase-2 fold as a column.  No driver
    # collect at any size.
    resolve_hrefs = bool(part.get("resolveHrefs")) or bool(
        getattr(app.pctx, "resolve_hrefs", False)
    )
    if resolve_hrefs:
        phase1 = ordered.groupBy("__key").applyInPandas(
            make_fold(False, True), schema=out_schema
        )
        seq = F.get_json_object("value", "$._seq").cast("long")
        w = Window.partitionBy("_id").orderBy(F.desc("__seq"))
        finals = (
            phase1.filter(F.col("purpose") == "aggregate")
            .withColumn("__seq", seq)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("_id").alias("__rid"),
                    F.col("value").alias("__state"))
        )
        ordered = attach_resolved_maps(ordered, finals, full)

    folded = ordered.groupBy("__key").applyInPandas(
        make_fold(resolve_hrefs, False), schema=out_schema
    )
    out: dict[str, DataFrame] = {}
    for purpose in ("aggregate", "command", "event", "event-full", "reply"):
        out[f"{full}-{purpose}"] = folded.filter(
            F.col("purpose") == purpose
        ).select("_id", "value")
    return out
