"""Skew mitigation for hot aggregation keys.

AQE's skew handling splits oversized SHUFFLE partitions for joins, but
a groupBy whose single key holds 1% of a 100 TB corpus still funnels
that key's rows into one reducer.  ``salted_agg`` is the classic
two-level rewrite: aggregate by (key, salt) first — spreading the hot
key over ``salt_buckets`` reducers — then combine the partials by key.
Correct for ALGEBRAIC aggregates (sum/count/min/max, and avg as
sum+count); the helper only accepts those, because a blind rewrite of
a holistic aggregate (median, collect_list order) would be silently
wrong.

Deterministic salt: md5(row-identity) mod buckets — rerun-stable, no
RNG, and DuckDB-replayable for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

# spec name -> (partial agg fn, final combine fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | Column = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-level skew-safe aggregation.

    ``aggs`` maps output column -> (agg, input column) with agg in
    {sum, count, min, max, avg}.  ``salt_col`` (default: a stable md5
    of the first value column) spreads each key's rows over
    ``salt_buckets`` partial groups; partials then combine by key, so
    no reducer ever sees more than ~1/buckets of a hot key.
    """
    keys = [key] if isinstance(key, str) else list(key)

    plan: dict[str, tuple[str, str]] = {}
    finals: dict[str, Column] = {}
    for out, (how, col) in aggs.items():
        if how == "avg":
            # decompose: avg = sum/ count over the same column
            plan[f"__s_{out}"] = ("sum", col)
            plan[f"__c_{out}"] = ("count", col)
            finals[out] = F.sum(f"__s_{out}") / F.sum(f"__c_{out}")
        elif how in _ALGEBRAIC:
            plan[f"__p_{out}"] = (how, col)
            part_fn, comb_fn = _ALGEBRAIC[how]
            finals[out] = comb_fn(f"__p_{out}")
        else:
            raise ValueError(
                f"salted_agg: {how!r} is not algebraic; a two-level "
                "rewrite would be wrong (use a plain groupBy)")

    if salt_col is None:
        first_col = next(iter(aggs.values()))[1]
        salt_col = F.crc32(F.col(first_col).cast("string"))
    salted = df.withColumn(
        "__salt", (salt_col % F.lit(int(salt_buckets))).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*[
        _ALGEBRAIC[how][0](col).alias(name)
        for name, (how, col) in plan.items()
    ])
    return partial.groupBy(*keys).agg(*[
        expr.alias(out) for out, expr in finals.items()
    ])
