"""Unit proofs for the round-11 third-wave text/dedup operators:
duplicate_spans (cross-document n-token span detection) and
bpe_pair_counts (one BPE-training iteration's merge table). Both are
value-checked against brute-force driver-side references on hand-built
corpora, so the catalog oracles certify engine parity while these pin
the SEMANTICS (overlap counting, min_docs gating, short-word guards)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def _ref_spans(docs: dict[int, str], n: int) -> Counter:
    """(span -> [doc_ids]) brute force, counting every occurrence."""
    occ: Counter = Counter()
    docset: dict[str, set] = {}
    for did, text in docs.items():
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            span = " ".join(toks[i : i + n])
            occ[span] += 1
            docset.setdefault(span, set()).add(did)
    return occ, docset


def test_duplicate_spans_matches_bruteforce(spark):
    from tdei_extract_load_service_spark.operators.dedup import (
        duplicate_spans,
    )

    docs = {
        1: "the quick brown fox jumps over a lazy dog tonight",
        2: "intro text the quick brown fox jumps over a lazy dog tonight",
        # doc 3 repeats the shared span INSIDE one document (overlap
        # counting: occurrences, not docs)
        3: "quick brown fox quick brown fox quick brown fox",
        4: "completely unrelated words only here once nothing shared",
    }
    n = 3
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r["span"]: (r["n_docs"], r["n_occurrences"])
        for r in duplicate_spans(
            df, "doc_id", "text", n=n, min_docs=2, top_k=None
        ).collect()
    }
    occ, docset = _ref_spans(docs, n)
    want = {
        s: (len(docset[s]), occ[s])
        for s in occ
        if len(docset[s]) >= 2
    }
    assert got == want
    # the shared 3-gram "quick brown fox" spans docs 1, 2 AND 3 — and
    # doc 3 contributes 3 occurrences of it
    assert got["quick brown fox"] == (3, 5)


def test_duplicate_spans_min_docs_and_topk(spark):
    from tdei_extract_load_service_spark.operators.dedup import (
        duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),
            (3, "x y z w"),
        ],
        "doc_id long, text string",
    )
    rows = duplicate_spans(df, "doc_id", "text", n=3, min_docs=2).collect()
    # only "a b c" crosses documents; within-doc-only spans are gated out
    assert [(r["span"], r["n_docs"], r["n_occurrences"]) for r in rows] == [
        ("a b c", 2, 2)
    ]
    # top_k cap respects the (count desc, span asc) order
    df2 = spark.createDataFrame(
        [(1, "p q p q"), (2, "p q p q")], "doc_id long, text string"
    )
    top1 = duplicate_spans(df2, "doc_id", "text", n=2, min_docs=2, top_k=1)
    [(span, *_)] = [tuple(r) for r in top1.collect()]
    assert span == "p q"  # 4 occurrences beats "q p" (2)


def test_duplicate_spans_short_docs_emit_nothing(spark):
    from tdei_extract_load_service_spark.operators.dedup import (
        duplicate_spans,
    )

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "")],
        "doc_id long, text string",
    )
    assert duplicate_spans(df, "doc_id", "text", n=3).count() == 0


def _ref_pairs(texts: list[str]) -> Counter:
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.split(" "))
    out: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            out[w[i : i + 2]] += c
    return out


def test_bpe_pair_counts_matches_bruteforce(spark):
    from tdei_extract_load_service_spark.operators.text import (
        bpe_pair_counts,
    )

    texts = [
        "low lower lowest low low",
        "newer newest new",
        "a bb a bb ccc",  # 1-char words contribute no pairs
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["pair"]: r["pair_count"]
        for r in bpe_pair_counts(df, "text", top_k=None).collect()
    }
    assert got == dict(_ref_pairs(texts))
    # the classic BPE smoke: "lo" rides every low* word occurrence
    assert got["lo"] == 5
    # 1-char words ("a") are guarded out of sequence(1, len-1), which
    # DESCENDS on Spark when len < 2
    assert "a" not in " ".join(got)  # no 1-char pseudo-pairs at all
    assert all(len(p) == 2 for p in got)


def test_bpe_pair_counts_order_and_cap(spark):
    from tdei_extract_load_service_spark.operators.text import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [("zz zz zz ay by",)], "text string"
    )
    rows = bpe_pair_counts(df, "text", top_k=2).collect()
    assert [(r["pair"], r["pair_count"]) for r in rows] == [
        ("zz", 3),
        ("ay", 1),  # count tie with "by" broken by pair text
    ]


class TestImageAhashDedup:
    """image_ahash + hamming_hash_pairs (round-11 multimodal dedup)."""

    @staticmethod
    def _ref_hash(mid: int) -> int:
        w, h, c = 8 + mid % 8, 8 + mid % 5, 3 + mid % 2
        px = [(mid * 7 + i) % 256 for i in range(w * h * c)]
        cells = []
        for y in range(8):
            sy = (y * h) // 8
            for x in range(8):
                sx = (x * w) // 8
                base = (sy * w + sx) * c
                cells.append(sum(px[base + ch] for ch in range(c)) // c)
        t = sum(cells)
        hh = 0
        for v in cells:
            hh = (hh << 1) | (1 if 64 * v > t else 0)
        return hh - (1 << 64) if hh >= 1 << 63 else hh

    def test_ahash_matches_reference(self, spark):
        from pyspark.sql import functions as F

        from tdei_extract_load_service_spark.multimodal.binary_ops import (
            image_ahash,
            synth_png,
        )

        ids = spark.range(0, 64).select(F.col("id").alias("doc_id"))
        got = {
            r["media_id"]: r["ahash"]
            for r in image_ahash(synth_png(ids, "doc_id")).collect()
        }
        assert got == {i: self._ref_hash(i) for i in range(64)}
        # the MSB genuinely occurs (negative bigint hashes), so the
        # sign-safe chunk extraction below is actually exercised
        assert any(v < 0 for v in got.values())

    def test_hamming_pairs_pigeonhole_complete(self, spark):
        """At max_hamming=7 with 8 chunks, the blocked join must find
        EVERY qualifying pair — including one whose 7 flipped bits land
        in 7 DIFFERENT chunks (the adversarial shape for blocking)."""
        import pandas as pd

        from tdei_extract_load_service_spark.operators.dedup import (
            hamming_hash_pairs,
        )

        base = -(1 << 63) | 0x0123456789ABCDEF  # MSB set: negative
        # flip the top bit of 7 different 8-bit chunks
        flips = 0
        for k in range(7):
            flips |= 1 << (8 * k + 7)
        rows = [
            (1, base),
            (2, base ^ flips),          # hamming 7, all chunks differ but one
            (3, base ^ 0b11111),        # hamming 5, one chunk
            (4, base ^ ((1 << 63) >> 1)),  # hamming 1 (bit 62)
            (5, ~base ^ (1 << 64)),     # far away
        ]
        norm = [
            (i, h - (1 << 64) if h >= 1 << 63 else h)
            for i, h in ((i, h & ((1 << 64) - 1)) for i, h in rows)
        ]
        df = spark.createDataFrame(
            pd.DataFrame(norm, columns=["id", "h"]).astype("int64")
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in hamming_hash_pairs(df, "id", "h", max_hamming=7).collect()
        )
        uh = {i: h & ((1 << 64) - 1) for i, h in norm}
        want = sorted(
            (a, b, bin(uh[a] ^ uh[b]).count("1"))
            for a in uh
            for b in uh
            if a < b and bin(uh[a] ^ uh[b]).count("1") <= 7
        )
        assert got == want
        assert (1, 2, 7) in got  # the adversarial spread-flips pair

    def test_ahash_error_path(self, spark):
        import pandas as pd

        from tdei_extract_load_service_spark.multimodal.binary_ops import (
            image_ahash,
        )

        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "content": [b"not an image"]})
        )
        [r] = image_ahash(df).collect()
        assert not r["decoded"] and r["ahash"] is None and r["error"]


def test_new_operator_guards(spark):
    """The silent-failure guards: probabilistic blocking, bit overflow,
    degenerate span length, key-less diff — each must refuse loudly."""
    import pandas as pd
    import pytest

    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        image_ahash,
    )
    from tdei_extract_load_service_spark.operators.cdc import table_changes
    from tdei_extract_load_service_spark.operators.dedup import (
        duplicate_spans,
        hamming_hash_pairs,
    )

    hdf = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "h": [0, 1]}).astype("int64")
    )
    with pytest.raises(ValueError, match="probabilistic"):
        hamming_hash_pairs(hdf, "id", "h", max_hamming=8, chunks=8)
    # the explicit opt-in works
    assert (
        hamming_hash_pairs(
            hdf, "id", "h", max_hamming=8, chunks=8,
            allow_probabilistic=True,
        ).count()
        == 1
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [b"x"]})
    )
    with pytest.raises(ValueError, match="64"):
        image_ahash(bdf, grid=9)
    tdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError, match=">= 1"):
        duplicate_spans(tdf, "doc_id", "text", n=0)
    with pytest.raises(ValueError, match="key_cols"):
        table_changes(tdf, tdf, [])


def test_simhash_md5_matches_python_reference(spark):
    """The md5-nibble word-hash family (the engine-mirrorable SimHash
    twin) must reproduce the pure-python construction bit-for-bit —
    packed fingerprint included (ANSI-safe sign-split packing)."""
    import hashlib

    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.dedup import (
        pack_bits64,
        simhash_md5_bits,
    )

    texts = [
        "alpha beta gamma alpha",
        "alpha beta gamma delta",
        "one",
        "repeated repeated repeated",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", pack_bits64(simhash_md5_bits("text")).alias("h")
        ).collect()
    }

    def ref(text):
        votes = [0] * 64
        for w in text.split(" "):
            v = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            for j in range(64):
                votes[j] += 1 if (v >> (63 - j)) & 1 else -1
        h = 0
        for j in range(64):
            h = (h << 1) | (1 if votes[j] > 0 else 0)
        return h - (1 << 64) if h >= 1 << 63 else h

    assert got == {i: ref(t) for i, t in enumerate(texts)}
    # identical texts -> identical fingerprints; similar -> closer than
    # dissimilar (the property SimHash exists for)
    d01 = bin((got[0] ^ got[1]) & ((1 << 64) - 1)).count("1")
    d02 = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert d01 < d02


def test_minhash_md5_matches_python_reference(spark):
    """The md5-based MinHash twin: signatures from the seeded linear
    permutations must reproduce the pure-python construction, and the
    banded pair set must equal brute force over the same signatures
    (candidates, first-band dedup and match counts)."""
    import hashlib
    import random

    from tdei_extract_load_service_spark.operators.dedup import (
        _MINHASH_P,
        minhash_md5_coeffs,
        minhash_md5_pairs,
    )

    texts = {
        1: "a b c d e f g h",
        2: "a b c d e f g x",      # high overlap with 1
        3: "a b c d e f g h",      # exact dup of 1 -> all bands collide
        4: "p q r s t u v w",      # disjoint
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in minhash_md5_pairs(
            df, "doc_id", "text", n=3, num_hashes=64, bands=16,
            threshold=0.5,
        ).collect()
    )

    coeffs = minhash_md5_coeffs(64, 2024)

    def sig(text):
        toks = text.split(" ")
        sh = list(dict.fromkeys(
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        ))
        hb = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
        return [min((a * h + b) % _MINHASH_P for h in hb) for a, b in coeffs]

    sigs = {k: sig(t) for k, t in texts.items()}
    want = []
    for a in sorted(sigs):
        for b in sorted(sigs):
            if a >= b:
                continue
            sa, sb = sigs[a], sigs[b]
            bands_hit = any(
                sa[4 * i:4 * i + 4] == sb[4 * i:4 * i + 4] for i in range(16)
            )
            n_match = sum(x == y for x, y in zip(sa, sb))
            if bands_hit and n_match >= 32:
                want.append((a, b, n_match))
    assert got == sorted(want)
    assert (1, 3, 64) in got  # the exact dup: every component matches
