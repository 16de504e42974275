"""Plugin registry: the extensibility surface of the engine.

The reference loads Java modules that contribute custom pipeline stages,
expression operators, match operators and JSLT functions
(`/root/reference/docs/plugins.md:3-13`, `Plugins.java:29,70-71`,
`Run.java:156-164`).  The Spark-native equivalent is a Python registry:
plugins register either programmatically (the normal path for an
application embedding the engine) or through the
``pincette_json_streams_spark.plugins`` entry-point group, whose entries
resolve to a callable invoked with this module (mirroring the reference's
service-loader discovery).

Contract per kind (all consulted only after the built-in table misses,
so a plugin cannot shadow a core operator):

- stage:          ``(df: DataFrame, spec: Any, pctx) -> DataFrame``
- operator:       ``(args: Any, ctx) -> Column``  (aggregation expression)
- match operator: ``(col: Column, arg: Any, ctx) -> Column`` (field query)
- jslt function:  ``(*evaluated_args) -> Any`` (plain Python values)
"""

from __future__ import annotations

from typing import Any, Callable

__all__ = [
    "register_stage", "register_operator", "register_match_operator",
    "register_jslt_function", "unregister", "load_entry_point_plugins",
    "STAGE_EXTENSIONS", "OPERATOR_EXTENSIONS", "MATCH_EXTENSIONS",
    "JSLT_FUNCTION_EXTENSIONS",
]

STAGE_EXTENSIONS: dict[str, Callable] = {}
OPERATOR_EXTENSIONS: dict[str, Callable] = {}
MATCH_EXTENSIONS: dict[str, Callable] = {}
JSLT_FUNCTION_EXTENSIONS: dict[str, Callable] = {}


def _register(table: dict[str, Callable], prefix: str, name: str,
              handler: Callable) -> Callable:
    if prefix and not name.startswith(prefix):
        raise ValueError(f"plugin name must start with '{prefix}': {name}")
    table[name] = handler
    return handler


def register_stage(name: str, handler: Callable) -> Callable:
    """Add a custom pipeline stage, e.g. ``register_stage("$myStage", f)``."""
    return _register(STAGE_EXTENSIONS, "$", name, handler)


def register_operator(name: str, handler: Callable) -> Callable:
    """Add a custom aggregation-expression operator."""
    return _register(OPERATOR_EXTENSIONS, "$", name, handler)


def register_match_operator(name: str, handler: Callable) -> Callable:
    """Add a custom query/match operator usable in ``$match`` etc."""
    return _register(MATCH_EXTENSIONS, "$", name, handler)


def register_jslt_function(name: str, fn: Callable) -> Callable:
    """Add a custom JSLT function callable from ``$jslt`` scripts."""
    return _register(JSLT_FUNCTION_EXTENSIONS, "", name, fn)


def unregister(name: str) -> None:
    """Remove a plugin registration from every table (test hygiene)."""
    for table in (STAGE_EXTENSIONS, OPERATOR_EXTENSIONS, MATCH_EXTENSIONS,
                  JSLT_FUNCTION_EXTENSIONS):
        table.pop(name, None)


def load_entry_point_plugins(group: str =
                             "pincette_json_streams_spark.plugins") -> int:
    """Discover installed plugins via importlib.metadata entry points.
    Each entry point must resolve to a callable taking this module (it
    calls the ``register_*`` functions).  Returns the number loaded."""
    import importlib.metadata as md
    import sys

    count = 0
    eps = md.entry_points()
    selected = (eps.select(group=group) if hasattr(eps, "select")
                else eps.get(group, []))
    for ep in selected:
        ep.load()(sys.modules[__name__])
        count += 1
    return count
