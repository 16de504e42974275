"""Application registry: the spec store behind list/delete/restart.

The reference keeps deployed application documents in a MongoDB
collection; workers tail it, `list` prints application+version,
`delete` removes the doc (which stops the app) and `restart` touches
its `_timestamp` so workers reload it (Delete.java, ListApps.java,
Restart.java).  The local analogue is a directory of JSON documents —
one per application, keyed by name — with the same three verbs; a
production deployment would point these functions at a shared store
(the Mongo collection itself, or a Delta table) without changing the
CLI surface.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

__all__ = [
    "default_registry", "register", "list_apps", "delete_app",
    "restart_app",
]


def default_registry() -> str:
    return os.environ.get(
        "PINCETTE_JSON_STREAMS_REGISTRY",
        os.path.join(os.path.expanduser("~"),
                     ".pincette-json-streams-spark", "apps"),
    )


def _path(registry: str, application: str) -> Path:
    return Path(registry) / f"{application}.json"


def register(spec: dict, registry: str) -> Path:
    """Store a canonical (built) application document under its name,
    stamping `_timestamp` — the deploy-time upsert the reference's
    `run` does against the applications collection."""
    name = spec["application"]
    p = _path(registry, name)
    p.parent.mkdir(parents=True, exist_ok=True)
    doc = dict(spec)
    doc["_timestamp"] = int(time.time() * 1000)
    p.write_text(json.dumps(doc, indent=2))
    return p


def list_apps(registry: str) -> list[tuple[str, str | None]]:
    """[(application, version)] sorted by name (ListApps.java prints
    exactly these two fields)."""
    root = Path(registry)
    if not root.is_dir():
        return []
    out = []
    for p in sorted(root.glob("*.json")):
        try:
            doc = json.loads(p.read_text())
        except ValueError:
            continue
        if "application" in doc:
            out.append((doc["application"], doc.get("version")))
    return sorted(out)


def delete_app(registry: str, application: str) -> bool:
    """Remove the application document; False when absent (the
    reference logs 'doesn't exist' on deletedCount != 1)."""
    p = _path(registry, application)
    if not p.is_file():
        return False
    p.unlink()
    return True


def restart_app(registry: str, application: str) -> bool:
    """Touch the document's `_timestamp` (Restart.java sets it to now);
    watching workers reload the app.  False when absent."""
    p = _path(registry, application)
    if not p.is_file():
        return False
    doc = json.loads(p.read_text())
    doc["_timestamp"] = int(time.time() * 1000)
    p.write_text(json.dumps(doc, indent=2))
    return True
