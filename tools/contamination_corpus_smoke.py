"""Decontamination at realistic document entropy.

The SF fixtures draw documents from a ~25-word vocabulary, so 13-gram
overlap there comes from accidental word-soup repeats. This smoke
builds the same realistic-shape corpus as winnow_corpus_smoke (Zipf
50k-word vocabulary with a short stopword head, 1-10 KB docs,
distributed generation) PLUS a separate benchmark set, plants EXACT
20-word benchmark excerpts into a known 4% of corpus docs, and
certifies `text.contamination_check` (word 13-grams) on three axes:

1. recall — every planted doc is flagged;
2. precision — no unplanted doc is flagged (13 consecutive words from
   a 50k vocabulary do not collide by chance);
3. scale — x10 the corpus costs ~linear wall time (the gram fan-out is
   an O(len) mapInPandas pass; the join output is bounded by corpus
   gram occurrences hitting the benchmark set, which grows linearly).

Usage: python tools/contamination_corpus_smoke.py [n_docs_base] [ladder...]
       (default: 5000 docs base, ladder x1 x10)
Results append to SCALE.md by hand.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB_SIZE = 50_000
N_STOP = 50
STOP_SHARE = 0.35
N_BENCH = 200          # benchmark documents
PLANT_MOD = 25         # corpus doc_id % PLANT_MOD == 3 carries an excerpt
EXCERPT_WORDS = 20     # >= 13 so every plant yields 8 shared 13-grams
NGRAM = 13


def _vocab():
    import hashlib

    return [
        hashlib.md5(f"w{i}".encode()).hexdigest()[: (3 if i < N_STOP else 6 + (i % 5))]
        for i in range(VOCAB_SIZE)
    ]


def _sample_words(vocab, rng, n: int) -> list:
    stop = rng.random(n) < STOP_SHARE
    head = rng.zipf(1.3, size=n) % N_STOP
    body = rng.integers(N_STOP, VOCAB_SIZE, size=n)
    return [vocab[h if s else b] for s, h, b in zip(stop, head, body)]


def _bench_words(vocab, bench_idx: int) -> list:
    import numpy as np

    rng = np.random.default_rng(5_000_000 + bench_idx)
    return _sample_words(vocab, rng, int(rng.integers(150, 1500)))


def _gen(spark, n_docs: int, out_dir: str, bench: bool) -> None:
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def batches(it):
        import numpy as np

        vocab = _vocab()
        for pdf in it:
            texts = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                if bench:
                    words = _bench_words(vocab, doc_id)
                else:
                    rng = np.random.default_rng(1_000_000 + doc_id)
                    words = _sample_words(vocab, rng, int(rng.integers(150, 1500)))
                    if doc_id % PLANT_MOD == 3:
                        src = _bench_words(vocab, doc_id % N_BENCH)
                        start = int(rng.integers(0, len(src) - EXCERPT_WORDS))
                        excerpt = src[start : start + EXCERPT_WORDS]
                        pos = int(rng.integers(0, max(1, len(words) - 1)))
                        # insert as consecutive words so the 13-grams match
                        words[pos:pos] = excerpt
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    (
        spark.range(n_docs, numPartitions=32)
        .mapInPandas(batches, schema)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    ladder = [int(x) for x in sys.argv[2:]] or [1, 10]

    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.text import contamination_check
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("contamination_corpus_smoke")
    spark.range(1).count()

    bench_path = "/tmp/contam_bench"
    if not os.path.exists(os.path.join(bench_path, "_SUCCESS")):
        _gen(spark, N_BENCH, bench_path, bench=True)
    bench = spark.read.parquet(bench_path)

    results = []
    for mult in ladder:
        n = n_base * mult
        path = f"/tmp/contam_corpus_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            t0 = time.perf_counter()
            _gen(spark, n, path, bench=False)
            print(f"x{mult}: generated {n} docs in {time.perf_counter()-t0:.1f}s")
        docs = spark.read.parquet(path)
        nbytes = docs.agg(F.sum(F.length("text"))).collect()[0][0]

        best = None
        flagged = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = contamination_check(docs, bench, "doc_id", "text", n=NGRAM).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            flagged = {r["doc_id"] for r in rows}

        planted = {d for d in range(n) if d % PLANT_MOD == 3}
        missed = planted - flagged
        spurious = flagged - planted
        results.append((mult, n, nbytes, best, len(planted), len(missed), len(spurious)))
        print(
            f"x{mult}: {n} docs, {nbytes/1e6:.0f} MB | check {best:.2f}s (best-of-2) | "
            f"planted {len(planted)}, missed {len(missed)}, spurious {len(spurious)}"
        )
        if missed or spurious:
            print(f"  !! missed={sorted(missed)[:5]} spurious={sorted(spurious)[:5]}")

    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(
            f"\nladder x{b[0]//a[0]}: data {b[2]/a[2]:.1f}x | check {b[3]/a[3]:.1f}x"
        )


if __name__ == "__main__":
    main()
