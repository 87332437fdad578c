"""Winnowing at realistic document entropy (VERDICT r6 #4).

The SF fixtures draw documents from a ~25-word vocabulary, so every
8-char shingle is corpus-hot and the winnow inverted index measures the
frequency cap, not the plan. This smoke builds a DISTRIBUTED synthetic
corpus with realistic shape — Zipf-sampled 50k-word vocabulary, docs of
1-10 KB (orders of magnitude longer than the 300-char fixtures), 5% of
docs carrying one of 20 planted ~600-char boilerplate passages so the
near-dup join has real work — and ladders it x10 to certify:

1. the winnow fingerprint (text.winnow_sets) is O(len) per row and
   scales linearly in corpus bytes (the round-6 nested-HOF form was
   O(len^2) — at these lengths it would be ~100x slower than at the
   fixtures' 300 chars, unrunnable);
2. the winnow_pairs inverted-index join stays near-linear at realistic
   shingle entropy (hot-hash df-cap rarely binding, unlike word-soup).

Winnow parameters are the PRODUCTION-REALISTIC k=20, w=8 (MOSS-scale:
a shingle spans 3-5 words, so selected hashes are word-SEQUENCE
specific), not the fixtures' k=8 — a first cut of this smoke ran k=8
and learned why real substring dedup never does: with ~5-char words
from any finite vocabulary, k=8 shingles fall INSIDE single common
words, every such hash is corpus-frequency (df ~ corpus_words/vocab,
520 at x10), candidate volume explodes as sum(df^2), and the capped
share of every doc's set pushes true near-dup jaccard below any
threshold. Frequency-realistic vocabulary for the same reason: the
zipf head words are SHORT (3 chars, like real stopwords) so shingles
containing them straddle into content words and stay sequence-specific.

Generation is itself distributed (pandas-UDF batches, per-doc seeded
RNG) and written to parquet first, so timed runs measure the operators,
not generation. Results append to SCALE.md by hand.

Usage: python tools/winnow_corpus_smoke.py [n_docs_base] [ladder...]
       (default: 5000 docs base, ladder x1 x10)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB_SIZE = 50_000
N_STOP = 50            # zipf-head "stopwords" (short, like real ones)
STOP_SHARE = 0.35      # fraction of word draws from the stopword head
N_PASSAGES = 20
PASSAGE_SHARE = 0.05   # fraction of docs carrying a planted passage
K, W = 20, 8           # MOSS-scale winnow params (see module docstring)


def _gen_corpus(spark, n_docs: int, out_dir: str) -> None:
    """Write (doc_id, text) parquet: Zipf word soup, 1-10 KB/doc."""
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def batches(it):
        import hashlib

        import numpy as np

        # deterministic global vocab + passages, built once per worker:
        # short zipf-head stopwords, 6-10 char content words
        vocab = [
            hashlib.md5(f"w{i}".encode()).hexdigest()[
                : (3 if i < N_STOP else 6 + (i % 5))
            ]
            for i in range(VOCAB_SIZE)
        ]

        def sample_words(rng, n: int) -> list:
            stop = rng.random(n) < STOP_SHARE
            head = rng.zipf(1.3, size=n) % N_STOP
            body = rng.integers(N_STOP, VOCAB_SIZE, size=n)
            return [vocab[h if s else b] for s, h, b in zip(stop, head, body)]

        passages = [
            " ".join(sample_words(np.random.default_rng(10_000 + p), 100))
            for p in range(N_PASSAGES)
        ]

        def doc_words(doc_id: int) -> list:
            rng = np.random.default_rng(doc_id)
            n_words = int(rng.integers(150, 1500))  # ~1-10 KB
            words = sample_words(rng, n_words)
            if rng.random() < PASSAGE_SHARE:
                pos = int(rng.integers(0, max(1, n_words - 1)))
                words.insert(pos, passages[int(rng.integers(0, N_PASSAGES))])
            return words

        for pdf in it:
            texts = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                if doc_id % 20 == 1:
                    # planted near-dup: a light edit of the previous doc
                    # (~3% appended words) so the join has true positives
                    words = doc_words(doc_id - 1)
                    rng = np.random.default_rng(doc_id)
                    words = words + sample_words(rng, max(3, len(words) // 33))
                else:
                    words = doc_words(doc_id)
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

    from tdei_extract_load_service_spark.operators.dedup import winnow_pairs
    from tdei_extract_load_service_spark.operators.text import winnow_sets
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("winnow_corpus_smoke")
    spark.range(1).count()
    results = []
    for mult in ladder:
        n = n_base * mult
        path = f"/tmp/winnow_corpus_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            t0 = time.perf_counter()
            _gen_corpus(spark, n, path)
            print(f"x{mult}: generated {n} docs in {time.perf_counter()-t0:.1f}s")
        docs = spark.read.parquet(path)
        nbytes = docs.agg(F.sum(F.length("text"))).collect()[0][0]

        best_fp = None
        for _ in range(2):
            t0 = time.perf_counter()
            (
                winnow_sets(docs, "doc_id", "text", k=K, w=W)
                .select("doc_id", F.md5(F.concat_ws(",", "ws")).alias("sig"))
                .write.format("noop").mode("overwrite").save()
            )
            dt = time.perf_counter() - t0
            best_fp = dt if best_fp is None else min(best_fp, dt)

        t0 = time.perf_counter()
        n_pairs = winnow_pairs(
            docs, "doc_id", "text", threshold=0.5, k=K, w=W, max_hash_df=256
        ).count()
        t_pairs = time.perf_counter() - t0

        results.append((mult, n, nbytes, best_fp, t_pairs, n_pairs))
        print(
            f"x{mult}: {n} docs, {nbytes/1e6:.0f} MB text | "
            f"fingerprint {best_fp:.2f}s (best-of-2) | "
            f"pairs {t_pairs:.2f}s, {n_pairs} pairs"
        )

    if len(results) >= 2:
        a, b = results[0], results[-1]
        data_ratio = b[2] / a[2]
        print(
            f"\nladder x{b[0]//a[0]}: data {data_ratio:.1f}x | "
            f"fingerprint {b[3]/a[3]:.1f}x | pairs {b[4]/a[4]:.1f}x"
        )


if __name__ == "__main__":
    main()
