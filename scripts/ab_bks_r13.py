"""r13 interleaved A/B: string (md5 hex) vs int64 (md5 top-64) banded
LSH keys, on dedup_minhash and dedup_canonical shapes at sf0.1.

Old arm = verbatim r12 _shingle_band_vec (bks array<string>),
monkeypatched in before query construction (factory runs driver-side,
closure ships by value).  Output identity asserted before timing —
and for this change identity is guaranteed, not just w.h.p.: every
band candidate is exactly verified downstream.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_shingle_band_vec(num_hashes: int, k: int, bands: int):
    """Verbatim r12 kernel (hex-string band keys)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from pincette_json_streams_spark.functions.dedup import (
        _P, _coeffs, _hash_str_py, _normalize_py,
    )

    coeffs = _coeffs(num_hashes)
    rows = num_hashes // bands

    def f(texts):
        import hashlib

        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
        B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
        gids, shs, bkss = [], [], []
        for s in texts:
            if s is None:
                gids.append(None)
                shs.append(None)
                bkss.append(None)
                continue
            norm = _normalize_py(s)
            n = max(len(norm) - (k - 1), 1)
            distinct = dict.fromkeys(norm[i:i + k] for i in range(n))
            h = list(dict.fromkeys(_hash_str_py(x) for x in distinct))
            shs.append(h)
            hv = np.array(h, dtype=np.int64)[None, :]
            sig = (((A * hv + B) % _P).min(axis=1).tolist()
                   if hv.size else [_P] * num_hashes)
            gids.append(hashlib.md5(
                ",".join(map(str, h)).encode()).hexdigest())
            bkss.append([
                hashlib.md5(",".join(
                    [str(b)] + [str(x) for x in sig[b * rows:(b + 1) * rows]]
                ).encode()).hexdigest()
                for b in range(bands)
            ])
        return pd.DataFrame({"gid": gids, "sh": shs, "bks": bkss})

    return pandas_udf(
        f, "struct<gid: string, sh: array<bigint>, bks: array<string>>",
        PandasUDFType.SCALAR,
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-bks-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pincette_json_streams_spark.functions import dedup
    from pincette_json_streams_spark.functions.caching import (
        release_caches,
    )

    new_factory = dedup._shingle_band_vec
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def build(arm, which):
        dedup._shingle_band_vec = (
            old_shingle_band_vec if arm == "old" else new_factory)
        try:
            if which == "minhash":
                return dedup.minhash_lsh_pairs(docs, threshold=0.5)
            pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5,
                                            edges="star")
            comp = dedup.connected_components(
                pairs, nodes=docs.select("doc_id"))
            w = Window.partitionBy("cluster_id")
            labeled = (comp.select(F.col("id").alias("doc_id"),
                                   "cluster_id")
                       .join(docs.select("doc_id", "n_chars"), "doc_id"))
            ww = w.orderBy(F.col("n_chars").desc(),
                           F.col("doc_id").asc())
            return labeled.withColumn(
                "rep_id",
                F.first("doc_id").over(ww.rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing)),
            ).select("doc_id", "cluster_id", "rep_id")
        finally:
            dedup._shingle_band_vec = new_factory

    for which in ("minhash", "canonical"):
        a = sorted(map(tuple, build("old", which).collect()))
        spark.catalog.clearCache()
        release_caches()
        b = sorted(map(tuple, build("new", which).collect()))
        spark.catalog.clearCache()
        release_caches()
        print(f"{which}: outputs identical = {a == b}  rows = {len(a)}")
        assert a == b

        times: dict[str, list] = {"old": [], "new": []}
        for r in range(rounds):
            for arm in ("old", "new") if r % 2 == 0 else ("new", "old"):
                # time build + count: connected_components runs its
                # iterative jobs EAGERLY at construction, so the clock
                # must start before build()
                t0 = time.time()
                build(arm, which).count()
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
