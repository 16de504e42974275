"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k — the correctness baseline.  Query
  set broadcast against the corpus; one scan, one shuffle for the top-k
  (window by query).  Right answer for bounded query sets even at 100 TB
  corpus scale (cost = corpus scan * |Q| vector ops).
- lsh_topk: hyperplane-LSH bucketed search — the latency path.  Corpus is
  bucketed once (materialized at scale); queries probe only their bucket
  (optionally multi-probe neighbors).  Deterministic bucketing (md5-based
  hyperplanes) so the oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pincette_json_streams_spark.functions.dedup import (
    cosine_vec,
    hyperplane_bucket,
)

__all__ = ["brute_force_topk", "lsh_topk"]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    -> (query_id, rank, vec_id, cosine).  Ties broken by vec_id for
    determinism."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        F.round(cosine_vec(F.col("qv"), F.col("cv")), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket.  Recall grows with fewer planes / multi-probing; determinism
    is exact (md5 hyperplanes), so results are reproducible and
    oracle-checkable."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id",
        F.round(cosine_vec(F.col("qv"), F.col("cv")), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
