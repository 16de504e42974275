"""r13 interleaved A/B: old (gram-string + per-gram md5) vs new
(word-hash + numpy polynomial) ngram kernel, on the two capped bench
query shapes at sf0.1.

The old kernel factory is a verbatim replica of the r12
_word_ngrams_hashed_vec, monkeypatched into functions.dedup before the
query is CONSTRUCTED — the factory runs on the driver and its closure
ships to executors by value, so each arm genuinely runs its kernel.
Output identity is asserted before any timing (the pairs and values
must match exactly — the kernels hash into different 60-bit universes,
so identity of the RESULT is precisely the w.h.p.-no-collision claim).
Arms alternate inside one session so host steal bursts hit both.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_word_ngrams_hashed_vec(n: int):
    """Verbatim r12 kernel (gram strings + one md5 per gram)."""
    import hashlib

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from pincette_json_streams_spark.functions.dedup import _normalize_py

    def f(texts):
        import pandas as pd

        gids, ngs = [], []
        for s in texts:
            if s is None:
                gids.append(None)
                ngs.append(None)
                continue
            words = _normalize_py(s).split(" ")
            cnt = max(len(words) - (n - 1), 1)
            grams = dict.fromkeys(
                " ".join(words[i:i + n]) for i in range(cnt)
            )
            ng = list(dict.fromkeys(
                int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                for g in grams
            ))
            ngs.append(ng)
            gids.append(hashlib.md5(
                ",".join(map(str, ng)).encode()).hexdigest())
        return pd.DataFrame({"gid": gids, "ng": ngs})

    return pandas_udf(f, "struct<gid: string, ng: array<bigint>>",
                      PandasUDFType.SCALAR)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "8"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-ngram-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from pincette_json_streams_spark.functions import dedup
    from pincette_json_streams_spark.functions.caching import (
        release_caches,
    )
    from pincette_json_streams_spark.functions.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )

    new_factory = dedup._word_ngrams_hashed_vec
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(arm, which):
        dedup._word_ngrams_hashed_vec = (
            old_word_ngrams_hashed_vec if arm == "old" else new_factory)
        try:
            if which == "ngram":
                return ngram_jaccard_pairs(docs, n=3, threshold=0.2,
                                           df_cap=5)
            return containment_pairs(docs, n=3, threshold_pct=50,
                                     df_cap=5)
        finally:
            dedup._word_ngrams_hashed_vec = new_factory

    for which in ("ngram", "containment"):
        a = sorted(map(tuple, build("old", which).collect()))
        spark.catalog.clearCache()
        release_caches()
        b = sorted(map(tuple, build("new", which).collect()))
        spark.catalog.clearCache()
        release_caches()
        print(f"{which}: outputs identical = {a == b}  rows = {len(a)}")
        assert a == b, f"{which}: old/new outputs differ"

        times: dict[str, list] = {"old": [], "new": []}
        for r in range(rounds):
            for arm in ("old", "new") if r % 2 == 0 else ("new", "old"):
                df = build(arm, which)
                t0 = time.time()
                df.count()
                times[arm].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
                release_caches()
        for arm in ("old", "new"):
            ts = sorted(times[arm])
            print(f"{which} {arm}: min {ts[0]:.3f} med "
                  f"{ts[len(ts) // 2]:.3f} all {times[arm]}")
        try:
            la = os.getloadavg()
            print(f"loadavg {la[0]:.2f} {la[1]:.2f}")
        except OSError:
            pass


if __name__ == "__main__":
    main()
