"""Validators (docs/validator.md; runtime net.pincette.mongo.Validator,
wired in /root/reference/src/main/java/net/pincette/json/streams/
ValidateStage.java:18-41 — SURVEY.md §2.9).

A validator is a compile-time construct: a list of conditions (Mongo query
documents, optionally carrying ``$code``), composed via ``include`` and
``macros`` (both resolved by the spec loader at build time, mirroring the
reference's build-time inlining Common.java:856-901).  Compilation produces
one ``when`` Column per condition; failures collect into an ``errors``
array of ``{location, code}`` and ``_error: true``.

Field-specific conditions fire only when the field exists
(docs/validator.md:3); ``$exists`` conditions always fire.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pincette_json_streams_spark.operators.context import ctx_for
from pincette_json_streams_spark.operators.match import compile_query

__all__ = ["compile_validator", "expand_macros", "validate_doc"]


def expand_macros(spec: Any, macros: dict[str, Any]) -> Any:
    """Replace ``_name_`` placeholder strings with macro expressions
    (docs/validator.md: Macros)."""
    if isinstance(spec, str) and len(spec) > 2 and spec.startswith("_") \
            and spec.endswith("_") and spec[1:-1] in macros:
        return macros[spec[1:-1]]
    if isinstance(spec, dict):
        return {k: expand_macros(v, macros) for k, v in spec.items()}
    if isinstance(spec, list):
        return [expand_macros(v, macros) for v in spec]
    return spec


def _conditions(spec: dict) -> list[dict]:
    """Conditions of a validator, with ``include``d validators merged
    RECURSIVELY (docs/validator.md:71 — include chains like app8's
    validate_plus -> operator.yaml -> type.yaml; the spec loader has
    already replaced file references with their parsed content) and
    macros expanded."""
    macros = dict(spec.get("macros", {}))
    conds: list[dict] = []
    includes = spec.get("include", [])
    for inc in includes if isinstance(includes, list) else [includes]:
        if isinstance(inc, dict):
            macros.update(inc.get("macros", {}))
            conds.extend(_conditions(inc))
    conds.extend(spec.get("conditions", []))
    return [expand_macros(c, macros) for c in conds]


def _flatten(
    spec: dict, df: DataFrame, prefix: str
) -> list[tuple[Column, str, str | None]]:
    """-> list of (failure condition, location json-pointer, code)."""
    ctx = ctx_for(df)
    out: list[tuple[Column, str, str | None]] = []
    for cond in _conditions(spec):
        cond = dict(cond)
        code_all = cond.pop("$code", None)
        for path, criteria in cond.items():
            if path.startswith("$"):
                # whole-message condition ($expr/$and/$or...): always
                # applies (docs/validator.md:3)
                matched = compile_query({path: criteria}, ctx)
                out.append((~matched, prefix if prefix != "/" else "/",
                            code_all))
                continue
            if isinstance(criteria, dict) and "ref" in criteria and \
                    isinstance(criteria["ref"], dict):
                # `ref` file reference, already inlined by the loader
                # (docs/validator.md:170)
                criteria = criteria["ref"]
            if isinstance(criteria, dict) and (
                "conditions" in criteria or "include" in criteria
            ):
                # nested validator on a subobject (docs/validator.md:116)
                base_prefix = "" if prefix == "/" else prefix
                sub_prefix = f"{base_prefix}/{path.replace('.', '/')}"
                nested = _flatten_nested(criteria, ctx, path, sub_prefix)
                out.extend(nested)
                continue
            crit = dict(criteria) if isinstance(criteria, dict) else criteria
            # condition-level $code (sibling key, app8 pattern) is the
            # default; a criteria-level $code overrides it
            code = code_all
            if isinstance(crit, dict):
                code = crit.pop("$code", code_all)
            if isinstance(crit, dict) and "$exists" in crit and crit["$exists"]:
                # presence check: fires even when field is absent; the
                # reference reports the parent location (docs example: "/")
                present = (
                    ctx.field(path).isNotNull()
                    if ctx.has_field(path) else F.lit(False)
                )
                parent = prefix + "/".join(path.split(".")[:-1])
                out.append((~present, parent or "/", code))
                rest = {k: v for k, v in crit.items() if k != "$exists"}
                if rest:
                    crit = rest
                else:
                    continue
            matched = compile_query({path: crit}, ctx)
            present = (
                ctx.field(path).isNotNull()
                if ctx.has_field(path) else F.lit(False)
            )
            loc = f"{prefix}/{path.replace('.', '/')}" if prefix != "/" \
                else "/" + path.replace(".", "/")
            # apply-only-if-present semantics
            out.append((present & ~matched, loc, code))
    return out


def _flatten_nested(spec, ctx, path, prefix):
    out = []
    base = ctx.field(path)
    for cond in _conditions(spec):
        for sub_path, criteria in cond.items():
            crit = dict(criteria) if isinstance(criteria, dict) else criteria
            code = None
            if isinstance(crit, dict):
                code = crit.pop("$code", None)
            sub_ctx = ctx.rebased(base)
            loc = f"{prefix}/{sub_path.replace('.', '/')}"
            if isinstance(crit, dict) and "$exists" in crit and crit["$exists"]:
                present = _nested_field(base, sub_path).isNotNull()
                out.append((base.isNotNull() & ~present, prefix, code))
                continue
            matched = compile_query({sub_path: crit}, sub_ctx)
            present = _nested_field(base, sub_path).isNotNull()
            out.append((base.isNotNull() & present & ~matched, loc, code))
    return out


def _nested_field(base: Column, path: str) -> Column:
    col = base
    for seg in path.split("."):
        col = col.getField(seg)
    return col


def validate_doc(spec: dict, doc: dict) -> list[dict]:
    """Row-level twin of ``compile_validator`` for per-command validation
    inside the aggregate fold (docs/state.md:63 — command validators run
    against the command document, with ``_state`` holding the current
    aggregate state).  Returns ``[{location, code}, ...]`` — empty means
    valid.  Semantics mirror the Column compiler exactly: field conditions
    fire only when the field is present, ``$exists`` conditions always
    fire and report the parent location."""
    from pincette_json_streams_spark.streaming.reducers import (
        _get_path, _has_path, _match_doc,
    )

    errs: list[dict] = []

    def walk(vspec: dict, d: dict, prefix: str) -> None:
        for cond in _conditions(vspec):
            cond = dict(cond)
            code_all = cond.pop("$code", None)
            for path, criteria in cond.items():
                if path.startswith("$"):
                    # whole-message condition: always applies
                    if not _match_doc({path: criteria}, d):
                        errs.append({"location": prefix or "/",
                                     "code": code_all})
                    continue
                crit = criteria
                if isinstance(crit, dict) and isinstance(
                    crit.get("ref"), dict
                ):
                    crit = crit["ref"]
                if isinstance(crit, dict) and (
                    "conditions" in crit or "include" in crit
                ):
                    base = _get_path(d, path)
                    sub = ("" if prefix == "/" else prefix) \
                        + "/" + path.replace(".", "/")
                    if isinstance(base, dict):
                        walk(crit, base, sub)
                    continue
                crit = dict(crit) if isinstance(crit, dict) else crit
                code = code_all
                if isinstance(crit, dict):
                    code = crit.pop("$code", code_all)
                loc = ("" if prefix == "/" else prefix) \
                    + "/" + path.replace(".", "/")
                if isinstance(crit, dict) and crit.get("$exists"):
                    present = _has_path(d, path) \
                        and _get_path(d, path) is not None
                    if not present:
                        parent = ("" if prefix == "/" else prefix) + "/" \
                            + "/".join(path.split(".")[:-1])
                        errs.append({"location": parent.rstrip("/") or "/",
                                     "code": code})
                    rest = {k: v for k, v in crit.items() if k != "$exists"}
                    if rest:
                        crit = rest
                    else:
                        continue
                present = _has_path(d, path) \
                    and _get_path(d, path) is not None
                if present and not _match_doc({path: crit}, d):
                    errs.append({"location": loc, "code": code})

    walk(spec, doc, "/")
    return errs


def compile_validator(df: DataFrame, spec: dict) -> DataFrame:
    """Annotate rows with ``_error``/``errors`` per the validator spec."""
    checks = _flatten(spec, df, "/")
    err_entries = [
        F.when(
            fail,
            F.struct(
                F.lit(loc).alias("location"),
                F.lit(code).cast("string").alias("code"),
            ),
        )
        for fail, loc, code in checks
    ]
    errors = F.filter(
        F.array(*err_entries), lambda e: e.isNotNull()
    )
    return (
        df.withColumn("errors", errors)
        .withColumn("_error", F.size("errors") > 0)
        .withColumn(
            "errors", F.when(F.col("_error"), F.col("errors"))
        )
    )
