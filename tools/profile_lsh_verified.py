"""A/B: lsh_band_candidates dropDuplicates exchange vs first-collision-band
filter carrying the 16-long bh array (128 B/row vs a pair-dedup shuffle).

Runs at sf0.1 and on the giant-clique skew fixture (if built by
tools/skew_smoke.py) where pair-dedup volume explodes.
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")
from tdei_extract_load_service_spark.session import get_spark, spread
from tdei_extract_load_service_spark.operators.dedup import (
    _band_hashes,
    lsh_verified_pairs,
    minhash_signature,
    word_shingles,
)


def lsh_verified_firstband(df: DataFrame, id_col, text_col, n=3, threshold=0.8,
                           num_hashes=64, bands=16):
    caches = []
    sh = spread(df).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).persist()
    sig = sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig")).persist()
    caches += [sh, sig]
    banded = sig.select("id", _band_hashes(num_hashes, bands).alias("bh")).select(
        "id", "bh", F.posexplode("bh").alias("band", "bucket")
    )
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    first_band = F.array_position(
        F.zip_with(F.col("a.bh"), F.col("b.bh"), lambda x, y: x == y), F.lit(True)
    )
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(first_band == F.col("a.band") + 1)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
    )
    joined = (
        candidates.join(
            sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")).hint("shuffle_hash"),
            "doc_a",
        ).join(
            sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")).hint("shuffle_hash"),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out, caches


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main():
    spark = get_spark("profile_lshv")
    corpora = {"sf0.1": "/root/testdata/sf0.1/documents.parquet"}
    clique = "/tmp/spark_graft_skew_clique2000"
    if os.path.exists(clique):
        corpora["clique2000"] = clique

    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    caches = []
    run_noop(lsh_verified_pairs(warm, "doc_id", "text", caches=caches))
    out, c2 = lsh_verified_firstband(warm, "doc_id", "text")
    run_noop(out)
    for c in caches + c2:
        c.unpersist()

    for name, path in corpora.items():
        docs = spark.read.parquet(path)

        def current():
            cs = []
            run_noop(lsh_verified_pairs(docs, "doc_id", "text", caches=cs))
            for c in cs:
                c.unpersist()

        def firstband():
            out, cs = lsh_verified_firstband(docs, "doc_id", "text")
            run_noop(out)
            for c in cs:
                c.unpersist()

        t_cur = timed(current)
        t_fb = timed(firstband)
        cs = []
        n_cur = lsh_verified_pairs(docs, "doc_id", "text", caches=cs).count()
        out, cs2 = lsh_verified_firstband(docs, "doc_id", "text")
        n_fb = out.count()
        for c in cs + cs2:
            c.unpersist()
        print(f"{name}: current={t_cur}s firstband={t_fb}s rows current={n_cur} firstband={n_fb}")


if __name__ == "__main__":
    main()
