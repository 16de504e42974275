"""jes href resolution for aggregate reducers.

The reference wraps every aggregate reducer in resolve -> validator ->
reducer -> unresolve (App.java:808-811 with net.pincette.jes.util
Mongo.resolve/unresolve): any JSON object carrying an ``href`` of the
form ``/<app>/<type>/<id>`` is expanded to the referenced aggregate's
current state (keeping the ``href`` field) before the reducer runs, and
every object carrying ``href`` is collapsed back to ``{"href": ...}``
afterwards — so reducers can read fields of referenced aggregates while
stored state keeps only the link (reference fixture
src/test/resources/app36: the add reducer sums ``.other.value`` across
five href links; the persisted aggregate keeps the bare hrefs).

Spark-first batch mapping (streaming/aggregate.py): resolution is a
JOIN, not a point read — hrefs are extracted from the command JSON,
equi-joined against the phase-1 (resolution-free) fold of the same
aggregate type, and the per-key resolved map travels into the fold as a
column.  No driver-side collection, no per-row lookups.  Batch
approximation, documented: a reference resolves against the referenced
aggregate's state at command-processing time; the batch fold sees its
final state for the run (the reference's own app36 notes the
read-your-writes timing is not guaranteed in test mode either).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

__all__ = ["resolve_doc", "unresolve_doc", "href_type"]


def href_type(href: str) -> Optional[str]:
    """``/<app>/<type>/<id>`` -> ``<app>-<type>`` (the full aggregate
    type), or None when the path doesn't have the jes shape."""
    parts = href.split("/")
    if len(parts) == 4 and parts[0] == "" and all(parts[1:]):
        return f"{parts[1]}-{parts[2]}"
    return None


def resolve_doc(doc: Any, lookup: Callable[[str], Optional[dict]]) -> Any:
    """Expand every object carrying a string ``href`` with the referenced
    aggregate's state (state fields first, ``href`` kept — the shape
    ``unresolve_doc`` collapses back).  Unresolvable hrefs stay as-is.
    Substituted state is not re-walked (no transitive resolution — one
    level, matching a single Mongo fetch per link and avoiding cycles).
    """
    if isinstance(doc, dict):
        href = doc.get("href")
        if isinstance(href, str):
            state = lookup(href)
            if state is not None:
                return {**state, "href": href}
            return doc
        return {k: resolve_doc(v, lookup) for k, v in doc.items()}
    if isinstance(doc, list):
        return [resolve_doc(v, lookup) for v in doc]
    return doc


def unresolve_doc(doc: Any) -> Any:
    """Collapse every object carrying ``href`` back to ``{"href": ...}``
    (Mongo.unresolve): stored aggregates keep links, not copies."""
    if isinstance(doc, dict):
        if isinstance(doc.get("href"), str):
            return {"href": doc["href"]}
        return {k: unresolve_doc(v) for k, v in doc.items()}
    if isinstance(doc, list):
        return [unresolve_doc(v) for v in doc]
    return doc
