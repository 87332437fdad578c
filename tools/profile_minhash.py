"""A/B profiler for dedup_minhash_lsh perf close-out (round 4).

Variants, each timed min-of-3 after a tiny-sf JIT warmup (same protocol as
bench.py):
  current      - minhash_lsh_pairs as shipped (64 string re-hashes/shingle)
  sig_only     - just the signature fold (isolates fold cost vs join cost)
  prehash      - hash each shingle string ONCE to a long, derive the 64
                 seeded hashes from that 8-byte long (xxhash64(h, seed));
                 same ANSI-safety (no arithmetic), 64x less string hashing
  prehash_sig  - signature fold only, prehash family
  bands8       - 8 bands x 8 rows (collision prob at j=0.5: 0.031 - recall
                 collapse; measured for the floor table only)

Usage: python tools/profile_minhash.py [sf_dir]
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

MAX_LONG = (1 << 63) - 1


def prehash_signature(shingles, num_hashes: int = 64):
    """MinHash from pre-hashed shingles: one xxhash64 over the shingle
    string, then 64 seeded xxhash64 over the resulting LONG (8 bytes)."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hashed = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.aggregate(
        hashed,
        F.array_repeat(F.lit(MAX_LONG), num_hashes),
        lambda acc, h: F.zip_with(acc, seeds, lambda m, seed: F.least(m, F.xxhash64(h, seed))),
    )


def prehash_lsh_pairs(df: DataFrame, num_hashes=64, bands=16, n=3, threshold=0.5) -> DataFrame:
    sig = spread(df).select(
        F.col("doc_id").alias("id"),
        prehash_signature(word_shingles("text", n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id", "sig", _band_hashes(num_hashes, bands).alias("bh")
    ).select("id", "sig", "bh", F.posexplode("bh").alias("band", "bucket")).persist()
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
    return out, banded


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
    spark = get_spark("profile_minhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    results = {}

    # warmup (JIT) on tiny sf: current + prehash shapes
    run_noop(minhash_lsh_pairs(warm, "doc_id", "text"))
    out, c = prehash_lsh_pairs(warm)
    run_noop(out); c.unpersist()

    def current():
        caches: list = []
        run_noop(minhash_lsh_pairs(docs, "doc_id", "text", caches=caches))
        for c in caches:
            c.unpersist()
    results["current"] = timed(current)

    def sig_only():
        run_noop(
            spread(docs).select(
                F.col("doc_id").alias("id"),
                minhash_signature(word_shingles("text", 3), 64).alias("sig"),
            )
        )
    results["sig_only"] = timed(sig_only)

    def prehash_sig():
        run_noop(
            spread(docs).select(
                F.col("doc_id").alias("id"),
                prehash_signature(word_shingles("text", 3), 64).alias("sig"),
            )
        )
    results["prehash_sig"] = timed(prehash_sig)

    def prehash_full():
        out, c = prehash_lsh_pairs(docs)
        run_noop(out)
        c.unpersist()
    results["prehash"] = timed(prehash_full)

    # row counts (recall check): current vs prehash at threshold 0.5
    n_current = minhash_lsh_pairs(docs, "doc_id", "text").count()
    out, c = prehash_lsh_pairs(docs)
    n_prehash = out.count()
    c.unpersist()

    def bands8():
        caches: list = []
        run_noop(
            minhash_lsh_pairs(docs, "doc_id", "text", bands=8, caches=caches)
        )
        for c in caches:
            c.unpersist()
    run_noop(minhash_lsh_pairs(warm, "doc_id", "text", bands=8))
    results["bands8"] = timed(bands8)
    n_bands8 = minhash_lsh_pairs(docs, "doc_id", "text", bands=8).count()

    print("TIMINGS(s):", {k: round(v, 3) for k, v in results.items()})
    print("ROWS:", {"current": n_current, "prehash": n_prehash, "bands8": n_bands8})


if __name__ == "__main__":
    main()
