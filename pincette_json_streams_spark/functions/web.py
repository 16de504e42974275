"""URL canonicalization and URL-keyed dedup — the first pass of any
web-crawl training pipeline (Common-Crawl-style corpora dedup by
canonical URL before touching content).

All transforms are native Column expressions (regexp groups + array
ops), so canonicalization runs inside whole-stage codegen at the scan —
no UDF, no shuffle.  The dedup step reuses the exact-dedup skeleton:
one hash aggregation on the canonical key.

Reference scope note: the reference engine (pincette-json-streams) has
no web-specific operators; this module is part of the training-data
extension surface (SURVEY.md "beyond the reference" scope).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme :// host[:port] path [?query] [#fragment]
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

#: query parameters dropped by normalize_url when strip_tracking=True —
#: click/campaign trackers that fragment otherwise-identical URLs
TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid")


def normalize_url(
    url: Column,
    *,
    strip_tracking: bool = True,
    strip_www: bool = False,
) -> Column:
    """Canonicalize an absolute URL; NULL when it doesn't parse.

    Steps (each one an idempotent, order-independent cleanup):
    lowercase scheme and host; drop the default port (``:80`` for http,
    ``:443`` for https); strip trailing slashes from the path; drop the
    fragment; drop tracking query parameters (``utm_*`` prefixes plus
    the usual click ids); sort the surviving query parameters so
    ``?b=2&a=1`` and ``?a=1&b=2`` collide.  ``strip_www`` additionally
    removes a leading ``www.`` host label.

    Everything is built from regexp groups + array functions, so the
    whole expression stays JVM-side in codegen."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(path, "/+$", "")

    params = F.filter(F.split(query, "&"), lambda p: p != "")
    if strip_tracking:
        def keep(p):
            name = F.substring_index(p, "=", 1)
            tracked = reduce(
                lambda a, b: a | b,
                [name.startswith(pref) for pref in TRACKING_PREFIXES]
                + [name == t for t in TRACKING_PARAMS],
            )
            return ~tracked
        params = F.filter(params, keep)
    canonical_q = F.concat_ws("&", F.array_sort(params))

    assembled = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canonical_q != "", F.concat(F.lit("?"), canonical_q))
        .otherwise(F.lit("")),
    )
    return F.when(scheme != "", assembled).otherwise(F.lit(None))


def host_of(url: Column) -> Column:
    """Lowercased host (without port) of an absolute URL; NULL when the
    URL doesn't parse."""
    host = F.lower(F.regexp_extract(F.trim(url), _URL_RE, 2))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    return F.when(host != "", host).otherwise(F.lit(None))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    **normalize_kwargs,
) -> DataFrame:
    """URL-keyed exact dedup: canonicalize, keep the lowest-id document
    per canonical URL.  One hash aggregation on the canonical key (the
    same single-shuffle skeleton as functions/dedup.py exact_dedup);
    rows whose URL doesn't parse keep themselves (NULL key never
    groups).

    Returns the input rows that survive, plus ``canonical_url`` and
    ``n_dups`` (how many raw rows collapsed into the keeper)."""
    from pyspark.sql.window import Window

    canon = df.withColumn(
        "canonical_url", normalize_url(F.col(url_col), **normalize_kwargs)
    )
    parsed = canon.filter(F.col("canonical_url").isNotNull())
    # ONE shuffle on the canonical key: keeper selection (row_number)
    # and the collapse count share the same window partition
    w = Window.partitionBy("canonical_url")
    survived = (
        parsed.withColumn(
            "n_dups", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn(
            "__rn",
            F.row_number().over(w.orderBy(F.col(id_col).asc())),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    unparsed = canon.filter(F.col("canonical_url").isNull()).withColumn(
        "n_dups", F.lit(1).cast("long")
    )
    return survived.unionByName(unparsed)
