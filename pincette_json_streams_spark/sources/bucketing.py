"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem,
commands x aggregates, batch x dedup-index) is shuffling both sides on
the join key.  Writing both tables bucketed by that key removes the
exchange entirely: Spark's bucketing metadata proves both sides are
already hash-partitioned the same way, so the join plans as a
zip-partitions SortMergeJoin with NO Exchange on either side.

These helpers wrap ``DataFrameWriter.bucketBy`` (catalog tables are how
Spark persists bucketing metadata — a plain ``.parquet(path)`` write
cannot carry it) and a verifier that asserts the exchange-free plan, so
pipelines can fail fast when a layout regression would silently
re-introduce a 100 TB shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_plan_ok"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table on ``key``.

    ``sort=True`` also sorts within buckets, which lets the join skip
    its per-partition sort at read time.  Pick ``buckets`` so one
    bucket of the LARGER table fits an executor's memory at target
    scale; both join sides must use the same (key, buckets)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join_plan_ok(
    spark: SparkSession, left: str, right: str, key: str | list[str]
) -> bool:
    """True iff joining the two bucketed tables on ``key`` plans with
    ZERO exchanges — the co-location actually holds (same key, same
    bucket count, bucketing read enabled).

    Auto-broadcast is disabled for the check: at test scale the planner
    would broadcast the small side ("Bucketed: false (disabled by query
    planner)") and hide a layout regression that only bites when both
    sides are too big to broadcast — which is the whole point of
    bucketing."""
    keys = [key] if isinstance(key, str) else list(key)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left).join(spark.table(right), keys)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    return "Exchange" not in plan
