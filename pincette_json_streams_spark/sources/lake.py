"""Write-side lake layout: partitioned parquet datasets with optional
Z-order clustering, footer-derived manifests, and pruning diagnostics.

At 100 TB the write layout IS the query plan: hive partitioning prunes
whole directories, Z-order clustering inside each partition tightens
per-file column ranges so row-group min/max skipping works for filters
on every clustered column, and the manifest makes the payoff
measurable without scanning data (footers only).

Nothing here collects data rows to the driver — the manifest reads
parquet FOOTER metadata via pyarrow (KB per file, not the data).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_dataset", "dataset_manifest", "prune_report"]


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    zorder: Sequence[str] = (),
    files_per_partition: int = 1,
    zorder_bits: int = 16,
    mode: str = "overwrite",
) -> dict:
    """Write a hive-partitioned parquet dataset, optionally Z-order
    clustered inside partitions, and return its manifest.

    - ``partition_by``: hive directory partitioning — partition pruning
      eliminates whole directories at plan time.
    - ``zorder``: cluster rows inside each output file by the Morton
      key of these columns (key computed, used for the in-partition
      sort, then dropped) — row-group/file min/max skipping then works
      for filters on ANY of them.
    - ``files_per_partition``: fan-out inside each hive partition.

    The write itself is one range exchange + in-partition sort when
    clustering (the same cost as a global sort), else whatever shuffle
    the partitioning needs."""
    out = df
    if zorder:
        from pincette_json_streams_spark.functions.layout import zorder_key

        out = zorder_key(out, list(zorder), bits=zorder_bits)
        parts = [F.col(c) for c in partition_by] + [F.col("zkey")]
        out = out.repartitionByRange(
            max(files_per_partition, 1) * max(
                _approx_partitions(out, partition_by), 1
            ),
            *parts,
        ).sortWithinPartitions(*partition_by, "zkey").drop("zkey")
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return dataset_manifest(path, write=True)


def _approx_partitions(df: DataFrame, partition_by: Sequence[str]) -> int:
    # partition fan-out hint without an extra job: unknown -> 1
    return 1


def dataset_manifest(path: str, write: bool = False) -> dict:
    """Footer-only dataset manifest: per-file rows/bytes and per-column
    min/max (the exact statistics engines use for file skipping).
    Reads parquet metadata via pyarrow — kilobytes per file, no data
    pages.  With ``write=True`` the manifest is also stored as
    ``_manifest.json`` at the dataset root."""
    import pyarrow.parquet as pq

    root = Path(path)
    files = []
    for p in sorted(root.rglob("*.parquet")):
        if p.name.startswith("_"):
            continue
        md = pq.read_metadata(p)
        cols: dict[str, dict] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                st = c.statistics
                if st is None or not st.has_min_max:
                    continue
                name = c.path_in_schema
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode(), hi.decode()
                    except UnicodeDecodeError:
                        continue
                cur = cols.get(name)
                if cur is None:
                    cols[name] = {"min": lo, "max": hi}
                else:
                    cur["min"] = min(cur["min"], lo)
                    cur["max"] = max(cur["max"], hi)
        rel = str(p.relative_to(root))
        files.append({
            "file": rel,
            "rows": md.num_rows,
            "bytes": p.stat().st_size,
            "row_groups": md.num_row_groups,
            "columns": cols,
            # hive partition values from the directory names
            "partition": dict(
                seg.split("=", 1) for seg in rel.split(os.sep)[:-1]
                if "=" in seg
            ),
        })
    manifest = {
        "path": str(root),
        "n_files": len(files),
        "rows": sum(f["rows"] for f in files),
        "bytes": sum(f["bytes"] for f in files),
        "files": files,
    }
    if write:
        (root / "_manifest.json").write_text(
            json.dumps(manifest, indent=1, default=str)
        )
    return manifest


def _overlaps(stats: Optional[dict], lo: Any, hi: Any) -> bool:
    if stats is None:
        return True            # no stats -> cannot skip
    if lo is not None and stats["max"] < lo:
        return False
    if hi is not None and stats["min"] > hi:
        return False
    return True


def prune_report(
    manifest: dict,
    predicates: dict[str, tuple],
) -> dict:
    """How much of the dataset a range predicate can SKIP using only
    the manifest — the measurable payoff of partitioning + clustering.

    ``predicates`` maps column -> (lo, hi) inclusive bounds (either
    side None for open).  Hive partition values prune exactly; data
    columns prune via per-file min/max.  Returns counts plus the
    surviving file list."""
    kept, skipped = [], 0
    for f in manifest["files"]:
        alive = True
        for col, (lo, hi) in predicates.items():
            if col in f["partition"]:
                v = f["partition"][col]
                slo = str(lo) if lo is not None else None
                shi = str(hi) if hi is not None else None
                if slo is not None and v < slo:
                    alive = False
                if shi is not None and v > shi:
                    alive = False
            else:
                if not _overlaps(f["columns"].get(col), lo, hi):
                    alive = False
            if not alive:
                break
        if alive:
            kept.append(f["file"])
        else:
            skipped += 1
    return {
        "files_total": manifest["n_files"],
        "files_kept": len(kept),
        "files_skipped": skipped,
        "skip_fraction": round(
            skipped / max(manifest["n_files"], 1), 4
        ),
        "kept": kept,
    }
