"""Multi-dimensional write layout: Z-order (Morton) clustering keys.

At 100 TB the dominant cost of every later query is how much of the
lake a scan can SKIP.  Parquet row-group pruning works off per-column
min/max ranges, which a single-column sort only tightens for that one
column.  Interleaving the bits of several scaled columns (Z-ordering —
the same technique Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders
use) tightens the ranges of ALL participating columns at once, so
filters on any of them prune.

Everything here is a native Column expression: the min/max scaling
stats come from one aggregate broadcast back into the plan (no driver
collect), and the bit interleave is a fixed fan of shift/and/or terms
inside whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale to [0, 2**bits - 1] as a long; constant columns
    collapse to 0.  (Uniform-ish columns scale well; heavily skewed
    columns should be pre-bucketed — rank-based scaling would need a
    global sort, which defeats the point of a write-side key.)"""
    span = cmax - cmin
    top = (1 << bits) - 1
    return (
        F.when(span > 0, F.floor((col - cmin) / span * top))
        .otherwise(F.lit(0))
        .cast("long")
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Morton (Z-order) key interleaving the bits of ``cols``.

    Bit ``b`` of scaled column ``i`` lands at position ``b*k + i`` of
    the key (k = number of columns), so nearby values in EVERY dimension
    land near each other in key order.  ``bits * len(cols)`` must fit a
    signed long (<= 62).

    The scaling stats are one ``agg`` broadcast into the plan — the key
    computation itself is pure codegen, no shuffle beyond the stats row."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 62:
        raise ValueError(f"bits*len(cols) = {bits * k} exceeds 62")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__zmin_{i}")
          for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__zmax_{i}")
          for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scaled(
            F.col(c).cast("double"),
            F.col(f"__zmin_{i}"),
            F.col(f"__zmax_{i}"),
            bits,
        )
        for i, c in enumerate(cols)
    ]
    terms = [
        F.shiftleft(
            F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + i
        )
        for b in range(bits)
        for i, s in enumerate(scaled)
    ]
    zkey = reduce(add, terms)
    return out.select(*df.columns, zkey.alias(out_col))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 16,
    keep_key: bool = False,
) -> DataFrame:
    """Range-partition + sort by the Z-order key — the write-side layout
    pass before ``.write.parquet``.  Every output file then covers a
    compact hyper-rectangle of the key space, so min/max row-group
    pruning works for filters on ANY of ``cols``.

    One range exchange (sampled boundaries) + in-partition sort — the
    same cost as a plain global sort, amortized over every future scan."""
    keyed = zorder_key(df, cols, bits=bits)
    clustered = keyed.repartitionByRange(
        num_partitions, F.col("zkey")
    ).sortWithinPartitions("zkey")
    return clustered if keep_key else clustered.drop("zkey")


def partition_bounds(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition min/max of ``cols`` (+ row count) — the layout
    diagnostic: with good clustering each partition's ranges are narrow
    slices of the domain.  Mirrors what parquet row-group footers will
    record when the partitions are written."""
    pid = F.spark_partition_id().alias("pid")
    return df.select(pid, *cols).groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
