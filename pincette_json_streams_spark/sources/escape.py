"""Storage-hostile field-name escaping.

The reference escapes field names that MongoDB can't store — ``$`` ->
``_dollar_``, ``.`` -> ``_dot_``, ``/`` -> ``_slash_`` — when writing and
reverses it when reading (Common.java:148-150, 979-981).  The same
problem exists on our storage boundary: parquet/Delta column names may
not contain ``.`` (struct-path ambiguity), and ``$`` breaks SQL
identifiers.  Apply ``escape_columns`` on the way into a collection sink
and ``unescape_columns`` on the way out; ``escape_doc``/``unescape_doc``
handle JSON documents (arbitrary nesting) for the dict-valued paths
(aggregate state, side-effect payloads).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = [
    "escape_key", "unescape_key", "escape_doc", "unescape_doc",
    "escape_columns", "unescape_columns",
]

# longest-first on unescape so "_dollar_" never half-matches
_FORWARD = (("$", "_dollar_"), (".", "_dot_"), ("/", "_slash_"))


def escape_key(key: str) -> str:
    for raw, esc in _FORWARD:
        key = key.replace(raw, esc)
    return key


def unescape_key(key: str) -> str:
    for raw, esc in _FORWARD:
        key = key.replace(esc, raw)
    return key


def _walk(value: Any, fn) -> Any:
    if isinstance(value, dict):
        return {fn(k): _walk(v, fn) for k, v in value.items()}
    if isinstance(value, list):
        return [_walk(v, fn) for v in value]
    return value


def escape_doc(doc: Any) -> Any:
    """Escape every key of a (nested) JSON document."""
    return _walk(doc, escape_key)


def unescape_doc(doc: Any) -> Any:
    return _walk(doc, unescape_key)


def escape_columns(df: DataFrame) -> DataFrame:
    """Escape top-level column names (nested struct fields are storable
    as-is in parquet once the top level is clean)."""
    renames = {c: escape_key(c) for c in df.columns if escape_key(c) != c}
    return df.withColumnsRenamed(renames) if renames else df


def unescape_columns(df: DataFrame) -> DataFrame:
    renames = {c: unescape_key(c) for c in df.columns
               if unescape_key(c) != c}
    return df.withColumnsRenamed(renames) if renames else df
