"""Compilation context: field resolution + variable environment.

The reference engine evaluates Mongo expressions against a schemaless JSON
message (pincette-mongo ``Expression``; spec /root/reference/docs/
aggregation_operators.md).  Here every expression compiles to a Spark
``Column`` against a DataFrame whose rows *are* the messages, so field
references become column/struct-field accesses and Catalyst can optimize
(pushdown, pruning, codegen) — the reference interprets per message and has
no optimizer at all (SURVEY.md §4).

Field-presence semantics: parquet/struct data models "absent" as NULL, so
``$exists`` maps to IS NOT NULL (documented divergence from the reference's
schemaless model where a field can be present-and-null; the reference's own
fixtures never rely on present-and-null).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Ctx:
    """Expression-compilation context.

    ``field(path)`` resolves a document path like ``a.b.c`` to a Column.
    ``var(name)`` resolves ``$$NAME`` variables ($let vars, lambda vars,
    $$ROOT/$$NOW/$$TODAY/$$DESCEND/$$PRUNE/$$KEEP).
    """

    def __init__(
        self,
        field_resolver: Optional[Callable[[str], Column]] = None,
        variables: Optional[dict] = None,
        df: Optional[DataFrame] = None,
        root: Optional[Column] = None,
    ):
        self._resolver = field_resolver
        self.variables = dict(variables or {})
        self.df = df
        self._root = root

    # -- field access -----------------------------------------------------
    def field(self, path: str) -> Column:
        if self._resolver is not None:
            return self._resolver(path)
        if self._root is not None:
            col = self._root
            for part in path.split("."):
                col = col.getField(part)
            return col
        # Top-level DataFrame columns; dotted path descends into structs.
        parts = path.split(".")
        col = F.col(parts[0])
        for part in parts[1:]:
            col = col.getField(part)
        return col

    def has_field(self, path: str) -> bool:
        """Compile-time presence check against the schema, when known."""
        if self.df is None:
            return True
        head = path.split(".")[0]
        return head in self.df.columns

    # -- variables ---------------------------------------------------------
    def var(self, name: str) -> Column:
        if name in self.variables:
            return self.variables[name]
        if name == "ROOT":
            return self.root()
        if name == "NOW":
            # ISO-8601 string, like the reference ($$NOW,
            # docs/system_variables.md:3)
            return F.date_format(
                F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            )
        if name == "TODAY":
            return F.date_format(F.current_date(), "yyyy-MM-dd")
        if name in ("DESCEND", "PRUNE", "KEEP"):
            # $redact markers; compiled structurally by the $redact stage.
            return F.lit(f"$${name}")
        raise KeyError(f"unknown variable $${name}")

    def root(self) -> Column:
        if self._root is not None:
            return self._root
        if self.df is not None:
            return F.struct(*[F.col(c) for c in self.df.columns])
        raise ValueError("$$ROOT not resolvable without a DataFrame context")

    # -- scoping -----------------------------------------------------------
    def child(self, extra_vars: dict) -> "Ctx":
        merged = dict(self.variables)
        merged.update(extra_vars)
        return Ctx(
            field_resolver=self._resolver,
            variables=merged,
            df=self.df,
            root=self._root,
        )

    def rebased(self, new_root: Column) -> "Ctx":
        """Context whose field refs resolve inside ``new_root`` (used for
        lambda elements, $elemMatch, lookup-pipeline locals)."""
        return Ctx(variables=dict(self.variables), root=new_root)


def ctx_for(df: DataFrame) -> Ctx:
    return Ctx(df=df)
