"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is fine for statistics but wrong for pipelines: at
100 TB you need the SAME split on every rerun, on any partitioning, from
any engine — otherwise an incremental rebuild leaks test docs into
train.  These operators derive the decision from a hash of a stable key,
so membership is a pure function of (key, salt):

- hash_bucket     — uniform [0, 1) bucket from md5(salt || key); the
  primitive everything else composes.
- hash_sample     — keep `fraction` of rows, deterministically.
- stratified_hash_sample — per-stratum fractions (e.g. downsample the
  dominant language, keep all of a rare one).
- train_test_split — adds a `split` column ('train'/'test') — same doc
  never migrates between splits as the corpus grows.

All pure Column md5 arithmetic (JVM-side, whole-stage codegen, no UDF,
no shuffle — sampling is a scan-side filter that combines with predicate
pushdown of *other* filters).  The DuckDB oracle replays the identical
decision: ('0x' || substr(md5(salt || key), 1, 8))::BIGINT / 2^32.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket", "hash_sample", "stratified_hash_sample",
    "train_test_split",
]

_SCALE = float(1 << 32)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform double in [0, 1) derived from md5(salt || key).  First 8
    hex digits = first 4 digest bytes big-endian — the same engine-
    portable trick as the dedup hash family."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return h / F.lit(_SCALE)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic `fraction`-sample: row kept iff
    hash_bucket(key) < fraction.  Rerun-stable and partition-independent."""
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(fraction))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: `fractions[stratum]` of each
    stratum survives (strata absent from the dict get
    `default_fraction`).  One scan, no shuffle — the stratum column only
    selects which threshold the row's hash is compared against."""
    thresh = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(frac))
        ).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def train_test_split(
    df: DataFrame,
    test_fraction: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds `split` = 'test' iff hash_bucket(key, salt) < test_fraction
    else 'train'.  Growing the corpus never moves an existing document
    across the boundary (membership depends only on its own key)."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(key_col), salt) < F.lit(float(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )
