"""Round-4 minhash A/B part 2: does projection collapse duplicate the
signature fold into every band hash?

Hypothesis: banded = sig.select(..., _band_hashes(...)) collapses so the
64-wide fold is recomputed 17x per row (1 sig col + 16 band hashes).
Fix candidate: persist the narrow (id, sig) frame; band hashes then read a
materialized attribute. Outputs identical (same hash family).

Variants:
  current        - shipped shape (banded persisted, fold collapsed 17x)
  sig_persist    - persist (id, sig); banded DERIVED (not persisted); join
                   sides recompute cheap slice+hash from the cache
  double_persist - persist (id, sig) AND banded
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")
from tdei_extract_load_service_spark.session import get_spark, spread
from tdei_extract_load_service_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
    word_shingles,
    _band_hashes,
)


def variant_pairs(df: DataFrame, persist_banded: bool, num_hashes=64, bands=16, n=3, threshold=0.5):
    caches = []
    sig = spread(df).select(
        F.col("doc_id").alias("id"),
        minhash_signature(word_shingles("text", n), num_hashes).alias("sig"),
    ).persist()
    caches.append(sig)
    banded = sig.select(
        "id", "sig", _band_hashes(num_hashes, bands).alias("bh")
    ).select("id", "sig", "bh", F.posexplode("bh").alias("band", "bucket"))
    if persist_banded:
        banded = banded.persist()
        caches.append(banded)
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    first_band = F.array_position(
        F.zip_with(F.col("a.bh"), F.col("b.bh"), lambda x, y: x == y), F.lit(True)
    )
    scored = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(first_band == F.col("a.band") + 1)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)) / F.lit(num_hashes)
    out = (
        scored.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )
    return out, caches


def run_noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_minhash2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # warmups
    run_noop(minhash_lsh_pairs(warm, "doc_id", "text"))
    for pb in (False, True):
        out, caches = variant_pairs(warm, pb)
        run_noop(out)
        for c in caches:
            c.unpersist()

    results = {}

    def current():
        caches: list = []
        run_noop(minhash_lsh_pairs(docs, "doc_id", "text", caches=caches))
        for c in caches:
            c.unpersist()
    results["current"] = timed(current)

    def sig_persist():
        out, caches = variant_pairs(docs, persist_banded=False)
        run_noop(out)
        for c in caches:
            c.unpersist()
    results["sig_persist"] = timed(sig_persist)

    def double_persist():
        out, caches = variant_pairs(docs, persist_banded=True)
        run_noop(out)
        for c in caches:
            c.unpersist()
    results["double_persist"] = timed(double_persist)

    # value identity check vs current (same hash family -> identical rows)
    cur = set(map(tuple, minhash_lsh_pairs(docs, "doc_id", "text").collect()))
    out, caches = variant_pairs(docs, persist_banded=False)
    new = set(map(tuple, out.collect()))
    for c in caches:
        c.unpersist()
    print("TIMINGS(s):", {k: round(v, 3) for k, v in results.items()})
    print("IDENTICAL_ROWS:", cur == new, "n=", len(cur))


if __name__ == "__main__":
    main()
