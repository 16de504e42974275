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
    "train_test_split", "domain_mixture", "sequence_packing",
    "importance_weights", "weighted_sample",
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


def balanced_topn_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACT-count class balancing: the ``n_per_stratum``
    lowest-md5-ranked rows of each stratum survive — the guaranteed-
    count sibling of :func:`stratified_hash_sample` (which keeps a
    FRACTION and drifts with stratum size).  Rebalancing a skewed
    label/language/source distribution to uniform before training is
    the canonical use.

    Determinism: rank = md5(salt || key) ordered lexicographically,
    ties by key — no RNG, so reruns replay the IDENTICAL selection
    and an ANSI-SQL oracle replays it exactly.  Selection over a
    grown stratum is re-derived, so membership can change as rows
    are added (a new key whose md5 sorts ahead of existing keys
    shifts ranks and can evict a previously selected row); for an
    add-only contract use :func:`train_test_split`-style bucket
    membership, which depends only on the row's own key.

    Scale shape: one shuffle (the per-stratum rank window).  Skewed
    strata are bounded by the window's own partitioning; at 100 TB the
    pre-filter ``hash_bucket < p`` trick (keep a generous super-sample
    per stratum first, one scan, no shuffle) bounds the window input
    when n_per_stratum << stratum size."""
    from pyspark.sql.window import Window

    rank_key = F.md5(F.concat(F.lit(salt),
                              F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(rank_key,
                                               F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


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


def domain_mixture(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Per-domain mixture weights for pretraining data balancing:
    token share per source plus the temperature-scaled sampling weight
    ``share^alpha / sum(share^alpha)`` (alpha < 1 upweights rare
    domains, the standard multilingual/multi-source rebalancing rule).

    Scale shape: ONE groupBy over the corpus; the normalization windows
    run on the aggregated frame, whose row count is the number of
    domains — trivially small at any corpus size."""
    from pincette_json_streams_spark.functions.text import ws_token_count

    per = (
        df.withColumn("__t", ws_token_count(F.col(text_col)))
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
    from pyspark.sql.window import Window

    whole = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(whole)
    powered = F.pow(share, F.lit(float(alpha)))
    return per.select(
        "source", "n_docs", "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(powered / F.sum(powered).over(whole), 6).alias("weight"),
    )


def sequence_packing(
    df: DataFrame,
    budget: int = 2048,
    by_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing accounting (the GPT-style
    pretraining step: concatenate documents, slice into fixed
    token-budget sequences).  Documents are laid out deterministically
    (ordered by ``id_col`` within each ``by_col`` shard); each document
    joins the sequence its first token lands in, giving per-sequence
    document counts / token sums / fill ratios without materializing
    token arrays.

    Scale shape: the running-sum window partitions by the shard key, so
    packing parallelizes across shards (one shuffle); the global-order
    variant (a single unpartitioned window) is the known scale hazard
    this layout avoids."""
    from pyspark.sql.window import Window

    from pincette_json_streams_spark.functions.text import ws_token_count

    w = (
        Window.partitionBy(by_col).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.withColumn("__t", ws_token_count(F.col(text_col)))
    placed = toks.withColumn(
        "__start", F.coalesce(F.sum("__t").over(w), F.lit(0))
    ).withColumn("__seq", F.floor(F.col("__start") / F.lit(int(budget))))
    return (
        placed.groupBy(
            F.col(by_col).alias("source"),
            F.col("__seq").cast("long").alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
            F.min(id_col).cast("long").alias("first_doc"),
            F.max(id_col).cast("long").alias("last_doc"),
        )
        .withColumn(
            "fill",
            F.round(F.col("n_tokens") / F.lit(float(budget)), 4),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis & Spirakis 2006 A-ES): each row gets the key
    ``u^(1/w)`` with ``u`` an md5-derived uniform in (0,1); the top-k
    keys per group are an exact weighted sample.  Rerun-stable (the
    randomness is a pure hash of id+salt), so a 100 TB corpus rebuild
    reproduces the same sample — the property Spark's ``sample()``
    cannot give across cluster re-partitions.

    One window top-k per group (WindowGroupLimit prunes below the
    shuffle); rows with non-positive weight are excluded, matching the
    A-ES domain.  Returns the sampled rows plus ``sample_key``."""
    from pyspark.sql.window import Window

    u = hash_bucket(F.col(id_col), salt=salt)
    # clamp u away from 0 so u^(1/w) is well-defined for tiny weights
    u = F.greatest(u, F.lit(1e-12))
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12
    )
    # NOT isnan: Spark orders NaN above every double, so an unguarded
    # NaN weight would both pass `> 0` and win the top-k sort
    keyed = df.filter(
        (F.col(weight_col) > 0) & ~F.isnan(F.col(weight_col).cast("double"))
    ).withColumn(
        "sample_key", key
    )
    parts = [F.col(group_col)] if group_col else []
    w = Window.partitionBy(*parts).orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    estimate hashed-unigram bag-of-words distributions for the target
    slice (rows where ``target`` is true) and the full raw pool, then
    score every document with its importance log-ratio
    ``sum_tokens log(p_target(bucket)/p_raw(bucket))`` under add-one
    smoothing.  High-weight raw documents are the ones that "look
    like" the target domain and get resampled into the training mix.

    Float contract: the per-BUCKET log-ratio is rounded onto an
    integer 1e4 grid first; a document's weight is then an integer sum
    over its tokens — associative and engine-identical (SCALE.md float
    rules).

    Scale shape: the md5-per-token pass runs ONCE — it folds straight
    into a per-(doc, bucket) histogram (at most ``buckets`` rows per
    document), which is lineage-cut and then serves BOTH consumers:
    the ``buckets``-row distribution table (re-aggregated from the
    histogram, broadcast into scoring) and the per-doc weight agg
    (token count and weight are exact integer sums over the
    histogram).  Before the histogram the token stream was evaluated
    twice — two full explode+md5 passes over the corpus.  Hashing is
    md5→bigint mod ``buckets`` so a SQL oracle replays it exactly.

    Returns (doc_id, n_tokens, weight_e4, weight) per document."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target.alias("__t"),
        F.explode(F.split(norm, " ")).alias("w"),
    ).withColumn(
        "b",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
            .cast("bigint"),
            F.lit(buckets),
        ),
    )
    docb = (
        toks.groupBy("doc_id", "__t", "b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=False)
    )
    dist = docb.groupBy("b").agg(
        F.sum(F.when(F.col("__t"), F.col("__n")).otherwise(0)).alias("ct"),
        F.sum("__n").alias("cr"),
    )
    tot = dist.agg(
        F.sum("ct").cast("double").alias("tt"),
        F.sum("cr").cast("double").alias("tr"),
    )
    lr = (
        dist.crossJoin(F.broadcast(tot))
        .withColumn(
            "lr_e4",
            F.floor(
                (F.log((F.col("ct") + F.lit(1.0))
                       / (F.col("tt") + F.lit(float(buckets))))
                 - F.log((F.col("cr") + F.lit(1.0))
                         / (F.col("tr") + F.lit(float(buckets)))))
                * F.lit(1e4) + F.lit(0.5)
            ).cast("bigint"),
        )
        .select("b", "lr_e4")
    )
    return (
        docb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("__n").cast("long").alias("n_tokens"),
            F.sum(F.col("__n") * F.col("lr_e4")).alias("weight_e4"),
        )
        .withColumn("weight", F.col("weight_e4") / F.lit(1e4))
    )

