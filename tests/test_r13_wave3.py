"""Round-13 third wave: BPE apply/fertility — pinned against an
independent pure-Python reference (greedy merge training + rank-order
encoding on plain lists, no Spark/DuckDB machinery)."""

from __future__ import annotations


def _bpe_reference(texts, k):
    """Pure-Python BPE: train k greedy merges (count desc, then pair
    text asc) over the word-count vocab, applying each merge
    left-to-right non-overlapping; return (merges, encodings) where
    encodings maps word -> its token list after all k merges."""
    vocab: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    enc = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, k + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in vocab.items():
            s = enc[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + cnt
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, cnt))
        for w in enc:
            s, out, i = enc[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            enc[w] = out
    return merges, vocab, enc


def _token_table(vocab, enc):
    stats: dict[str, list[int]] = {}
    for w, cnt in vocab.items():
        for tok in enc[w]:
            s = stats.setdefault(tok, [0, 0])
            s[0] += cnt
            s[1] += 1
    return {
        tok: (len(tok), occ, slots) for tok, (occ, slots) in stats.items()
    }


def test_bpe_apply_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.text import bpe_apply

    texts = [
        "the cat sat on the mat",
        "the rat sat on the cat",
        "that hat is the cat hat",
        "aaaa aaaa aa",  # overlap: greedy left-to-right on (a,a)
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["token"]: (r["token_len"], r["occurrences"], r["vocab_slots"])
        for r in bpe_apply(df, "text", k=5).collect()
    }
    merges, vocab, enc = _bpe_reference(texts, 5)
    assert got == _token_table(vocab, enc)
    # the 'aaaa' word must encode greedily: (a,a) is learned in round 2
    # (pair count 7 beats (t,h)'s 6) and merges left-to-right
    # non-overlapping, giving [aa, aa] — never [a, aa, a]
    assert ("a", "a") in {(m[1], m[2]) for m in merges}
    assert enc["aaaa"] == ["aa", "aa"]
    assert "aa" in got


def test_bpe_fertility_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.text import bpe_fertility

    texts = [
        "banana bandana ban",
        "an a anna banana",
        "nab nab an anna",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    row = bpe_fertility(df, "text", k=4).collect()[0]
    merges, vocab, enc = _bpe_reference(texts, 4)
    total_words = sum(vocab.values())
    total_tokens = sum(cnt * len(enc[w]) for w, cnt in vocab.items())
    total_chars = sum(cnt * len(w) for w, cnt in vocab.items())
    assert row["total_words"] == total_words
    assert row["distinct_words"] == len(vocab)
    assert row["total_tokens"] == total_tokens
    assert row["total_chars"] == total_chars
    assert row["tokens_per_kword"] == (total_tokens * 1000) // total_words
    assert (
        row["chars_per_token_micro"]
        == (total_chars * 1000000) // total_tokens
    )
    # k merges strictly compress this corpus: fewer tokens than chars,
    # at least one token per word
    assert total_words <= total_tokens < total_chars


def test_bpe_apply_train_consistency(spark):
    """The apply entry's token table must be consistent with the merge
    table bpe_train returns on the same corpus: every merged symbol in
    the merge list appears as a token or was further merged away."""
    from tdei_extract_load_service_spark.operators.text import (
        bpe_apply,
        bpe_train,
    )

    texts = ["low lower lowest", "new newer newest", "low new low new"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe_train(df, "text", k=4).collect()
    toks = {r["token"] for r in bpe_apply(df, "text", k=4).collect()}
    merges_ref, _, enc = _bpe_reference(texts, 4)
    assert [(m["step"], m["left_sym"], m["right_sym"], m["pair_count"]) for m in merges] == merges_ref
    produced = {m["left_sym"] + m["right_sym"] for m in merges}
    survivors = {t for toks_ in enc.values() for t in toks_}
    assert toks == survivors
    # each produced symbol either survives as a token or is a strict
    # substring of a later merge's product
    for p in produced:
        assert p in survivors or any(p in q and p != q for q in produced)


# ---------------------------------------------------------------------------
# embedding_outliers
# ---------------------------------------------------------------------------


def _outliers_reference(rows, dim, k_semantic, k_norm):
    """Pure-Python restatement: centroid = per-dim sums, cosine /
    norm2 rounded to 6, three rank cuts with id tiebreaks. The test
    vectors are exact binary fractions, so float sums are exact in any
    order and the DECIMAL plumbing cannot mask a semantics bug."""
    import math

    cv = [sum(v[d] for _, v in rows) for d in range(dim)]
    cn = math.sqrt(sum(x * x for x in cv))
    scored = []
    for i, v in rows:
        dot = sum(a * b for a, b in zip(v, cv))
        n2 = sum(a * a for a in v)
        cos = round(dot / (math.sqrt(n2) * cn), 6) if n2 and cn else None
        scored.append((i, cos, round(n2, 6)))
    sem = sorted(scored, key=lambda r: (r[1], r[0]))[:k_semantic]
    hi = sorted(scored, key=lambda r: (-r[2], r[0]))[:k_norm]
    lo = sorted(scored, key=lambda r: (r[2], r[0]))[:k_norm]
    out = []
    for cut, reason in (
        (sem, "low_centroid_cosine"),
        (hi, "extreme_high_norm"),
        (lo, "extreme_low_norm"),
    ):
        out += [(i, c, n, reason) for i, c, n in cut]
    return sorted(out, key=lambda r: (r[3], r[0]))


def test_embedding_outliers_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_outliers,
    )

    dim = 8
    rows = []
    for i in range(40):
        # mostly-aligned cloud with exact 1/64 components
        v = [((i * 7 + d * 3) % 32 + 16) / 64.0 for d in range(dim)]
        rows.append((i, v))
    # planted outliers: anti-aligned, giant norm, tiny norm
    rows.append((100, [-1.0] * dim))
    rows.append((101, [8.0] * dim))
    rows.append((102, [1.0 / 64.0] + [0.0] * (dim - 1)))
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    got = [
        (r["id"], r["cos_centroid"], r["norm2"], r["reason"])
        for r in embedding_outliers(
            df, "vec_id", "embedding", dim=dim, k_semantic=5, k_norm=3
        ).collect()
    ]
    want = _outliers_reference(rows, dim, 5, 3)
    assert got == want
    by_reason = {}
    for i, _, _, reason in got:
        by_reason.setdefault(reason, []).append(i)
    assert 100 in by_reason["low_centroid_cosine"]
    assert 101 in by_reason["extreme_high_norm"]
    assert 102 in by_reason["extreme_low_norm"]


# ---------------------------------------------------------------------------
# stream_bm25_index_shadow (FIFTEENTH streaming certification)
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"
_TERMS = ["spark", "join", "window", "scan"]


def test_stream_bm25_equals_inline_recompute(spark):
    """The streamed-index serve must be bit-identical to inline
    bm25_topk over the whole corpus — for a batch count that does NOT
    divide the corpus evenly (the any-split disjoint-union claim)."""
    from pyspark.sql import functions as F  # noqa: F401

    from tdei_extract_load_service_spark.operators.text import bm25_topk
    from tdei_extract_load_service_spark.streaming.shadow import (
        bm25_index_shadow,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = [
        tuple(r) for r in bm25_topk(docs, "doc_id", "text", _TERMS, k=10).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_index_shadow(spark, SF_DIR, _TERMS, n_batches=3, k=10).collect()
    ]
    assert got == want


def test_bm25_batch_stats_union_is_full_corpus(spark):
    """Per-batch postings/doclen are disjoint and union to the
    full-corpus frames verbatim — in any order (commutativity)."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.text import (
        bm25_batch_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full_p, full_d = bm25_batch_stats(docs, "doc_id", "text")
    want_p = sorted(tuple(r) for r in full_p.collect())
    want_d = sorted(tuple(r) for r in full_d.collect())
    parts = [
        bm25_batch_stats(
            docs.where(F.col("doc_id") % 3 == i), "doc_id", "text"
        )
        for i in (2, 0, 1)  # deliberately out of order
    ]
    got_p = sorted(
        tuple(r) for p, _ in parts for r in p.collect()
    )
    got_d = sorted(tuple(r) for _, d in parts for r in d.collect())
    assert got_p == want_p
    assert got_d == want_d


def test_bm25_index_sink_replayed_batch_is_noop(spark, tmp_path):
    """Exactly-once: a replayed batch id (even with corrupted content)
    must change neither table; a new id appends to BOTH in one txn."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.sinks.manifest import read_table
    from tdei_extract_load_service_spark.streaming.sink import (
        BM25_DOCLEN_SCHEMA,
        BM25_POSTINGS_SCHEMA,
        bm25_index_sink,
    )

    root = str(tmp_path / "bm25_root")
    handler = bm25_index_sink(root, "bm25_postings", "bm25_doclen", "doc_id", "text")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    handler(docs, 0)

    def snap():
        p = sorted(
            tuple(r)
            for r in read_table(
                spark, root, "bm25_postings", schema=BM25_POSTINGS_SCHEMA
            ).collect()
        )
        d = sorted(
            tuple(r)
            for r in read_table(
                spark, root, "bm25_doclen", schema=BM25_DOCLEN_SCHEMA
            ).collect()
        )
        return p, d

    before = snap()
    handler(docs.withColumn("text", F.lit("poison poison")), 0)
    assert snap() == before
    handler(
        docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000), 1
    )
    after_p, after_d = snap()
    assert len(after_p) > len(before[0])
    assert len(after_d) == len(before[1]) + 5


# ---------------------------------------------------------------------------
# embedding_pca_power
# ---------------------------------------------------------------------------


def _pca_power_reference(vecs, dim, iters):
    """Pure-Python power iteration on the exact second-moment matrix:
    the test vectors are exact binary fractions, so float sums are
    exact in any order and ROUND-9 renormalization is the only lossy
    step — exactly the operator's stated semantics."""
    import math

    m = [[0.0] * dim for _ in range(dim)]
    for v in vecs:
        for i in range(dim):
            for j in range(dim):
                m[i][j] += v[i] * v[j]
    comp = [1.0 / 8.0] * dim if dim == 64 else [1.0 / 8.0] * dim
    for _ in range(iters):
        w = [sum(m[i][j] * comp[j] for j in range(dim)) for i in range(dim)]
        ss = sum(x * x for x in w)
        comp = [round(x / math.sqrt(ss), 9) for x in w]
    return comp


def test_embedding_pca_power_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_pca_power,
    )

    dim = 8
    vecs = []
    for r in range(30):
        # a dominant direction along alternating signs + binary noise
        base = [(1.0 if d % 2 == 0 else -1.0) * (r % 4 + 1) / 4.0 for d in range(dim)]
        noise = [((r * 5 + d) % 8) / 64.0 for d in range(dim)]
        vecs.append([b + n for b, n in zip(base, noise)])
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["pos"]: r["pc1"]
        for r in embedding_pca_power(df, "embedding", dim=dim, iters=3).collect()
    }
    # reference starts from the same all-1/8 v0 the operator uses
    want = _pca_power_reference(vecs, dim, 3)
    assert got == {i: want[i] for i in range(dim)}
    # the learned direction must be (close to) unit and aligned with
    # the planted alternating-sign structure
    assert abs(sum(x * x for x in want) - 1.0) < 1e-6
    signs = [1 if want[d] > 0 else -1 for d in range(dim)]
    assert signs == [1 if d % 2 == 0 else -1 for d in range(dim)] or signs == [
        -1 if d % 2 == 0 else 1 for d in range(dim)
    ]


def test_abtt_topk_matches_pure_python(spark):
    """All-but-the-top serving: correct with the reference direction,
    rank by corrected cosine — and removing the dominant direction must
    actually change the ranking on a corpus with a strong common
    component (the correction's whole point)."""
    import math

    from tdei_extract_load_service_spark.operators.similarity import (
        abtt_topk,
    )

    dim = 8
    vecs = []
    for r in range(36):
        common = [2.0] * dim  # strong shared direction drowns raw cosine
        idio = [((r * 11 + d * 5) % 16 - 8) / 16.0 for d in range(dim)]
        vecs.append([c + x for c, x in zip(common, idio)])
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qv = vecs[0]
    got = [
        (r["id"], r["cos_raw"], r["cos_abtt"])
        for r in abtt_topk(df, "vec_id", "embedding", qv, dim=dim, iters=3, k=5).collect()
    ]

    u = _pca_power_reference(vecs, dim, 3)

    def correct(v, pv):
        return [x - pv * uu for x, uu in zip(v, u)]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))),
            6,
        )

    pq = sum(x * y for x, y in zip(qv, u))
    cq = correct(qv, pq)
    scored = []
    for i, v in enumerate(vecs):
        pv = sum(x * y for x, y in zip(v, u))
        scored.append((i, cos(v, qv), cos(correct(v, pv), cq)))
    want = sorted(scored, key=lambda r: (-r[2], r[0]))[:5]
    assert got == want
    # with the common component removed, raw-cosine near-ties must
    # separate: corrected scores spread far wider than raw scores
    raws = [r[1] for r in scored]
    abtts = [r[2] for r in scored]
    assert (max(raws) - min(raws)) < 0.2
    assert (max(abtts) - min(abtts)) > 0.5


# ---------------------------------------------------------------------------
# text_keywords / events_interval_coverage
# ---------------------------------------------------------------------------


def test_keywords_topm_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.text import keywords_topm

    texts = [
        "Spark spark JOIN window",
        "join join join scan",
        "vector   scan",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["term"], r["tfidf_fp"], r["rnk"])
        for r in keywords_topm(df, "doc_id", "text", m=2).collect()
    ]

    # pure-python restatement (same lower/trim/split + fixed-point)
    docs = {}
    for i, t in rows:
        words = [w for w in t.strip().lower().split() if w]
        # NB the engine's dl counts split() slots incl. the '' of an
        # empty doc — replicate split semantics exactly
        import re

        slots = re.split(r"[ \t\n\r\f\v]+", t.strip().lower())
        docs[i] = (slots, [w for w in slots if w])
    n = len(rows)
    dfreq = {}
    for i, (slots, words) in docs.items():
        for w in set(words):
            dfreq[w] = dfreq.get(w, 0) + 1
    want = []
    for i, (slots, words) in docs.items():
        dl = len(slots)
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            (
                (w, (10**9 * c * n) // (dfreq[w] * dl))
                for w, c in tf.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        want += [(i, w, s, r + 1) for r, (w, s) in enumerate(scored)]
    want.sort(key=lambda x: (x[0], x[3]))
    assert got == want
    # rare terms must outrank common ones at equal tf: 'window' (df=1)
    # makes doc 0's top-2 over 'join' (df=2, same tf)
    d0 = [w for (i, w, s, r) in got if i == 0]
    assert d0 == ["spark", "window"]


def test_interval_coverage_matches_pure_python(spark):
    import datetime as dt

    from tdei_extract_load_service_spark.operators.relational import (
        interval_coverage,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # key 1: [0,10) [5,15) [15,20) -> one island [0,20): touching merges
        (1, 10, base, base + dt.timedelta(minutes=10)),
        (1, 11, base + dt.timedelta(minutes=5), base + dt.timedelta(minutes=15)),
        (1, 12, base + dt.timedelta(minutes=15), base + dt.timedelta(minutes=20)),
        # key 1: disjoint [30,31)
        (1, 13, base + dt.timedelta(minutes=30), base + dt.timedelta(minutes=31)),
        # key 2: containment [0,60) contains [10,20); plus equal starts
        (2, 20, base, base + dt.timedelta(minutes=60)),
        (2, 21, base + dt.timedelta(minutes=10), base + dt.timedelta(minutes=20)),
        (2, 22, base, base + dt.timedelta(seconds=1)),
        # key 3: zero-length interval
        (3, 30, base, base),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, s timestamp_ntz, e timestamp_ntz"
    )
    got = {
        r["user_id"]: (r["n_intervals"], r["n_islands"], r["covered_s"])
        for r in interval_coverage(df, "user_id", "s", "e", "event_id").collect()
    }
    assert got == {
        1: (4, 2, 20 * 60 + 60),
        2: (3, 1, 60 * 60),
        3: (1, 1, 0),
    }


# ---------------------------------------------------------------------------
# text_dsir_resample / dq_profile_diff
# ---------------------------------------------------------------------------


def test_dsir_resample_matches_pure_python(spark):
    """Systematic importance resampling: integer threshold crossings
    over id-ordered cumulative weights, per stratum — checked against
    the dsir reference scores from test_r13_wave2 plus a plain-Python
    restatement of the slot logic."""
    from pyspark.sql import functions as F

    from tests.test_r13_wave2 import _corpus, _dsir_reference
    from tdei_extract_load_service_spark.operators.text import dsir_resample

    rows = _corpus(seed=29, n_docs=80)
    strata = {i: ("s1" if i % 2 == 0 else "s2") for i, _ in rows}
    df = spark.createDataFrame(
        [(i, t, strata[i]) for i, t in rows],
        "doc_id long, text string, stratum string",
    )
    k = 7
    got = [
        (r["stratum"], r["doc_id"], r["weight"], r["slot"])
        for r in dsir_resample(
            df, "doc_id", "text",
            target=F.col("doc_id") % 3 == 0,
            stratum_col="stratum", k_per_stratum=k,
        ).collect()
    ]
    scores = _dsir_reference(rows, lambda d, t: d % 3 == 0)
    want = []
    for s in ("s1", "s2"):
        docs = sorted(d for d in scores if strata[d] == s)
        weights = {d: max(scores[d], 0) for d in docs}
        w_tot = sum(weights.values())
        if w_tot == 0:
            continue
        cum = 0
        for d in docs:
            lo = (cum * k) // w_tot
            cum += weights[d]
            hi = (cum * k) // w_tot
            if hi > lo:
                want.append((s, d, weights[d], lo))
    want.sort(key=lambda r: (r[0], r[1]))
    assert got == want
    # proportionality sanity: every pick has positive weight, and no
    # stratum exceeds k picks
    assert all(w > 0 for _, _, w, _ in got)
    from collections import Counter

    per = Counter(s for s, *_ in got)
    assert all(v <= k for v in per.values()) and len(per) == 2


def test_profile_diff_flags_planted_drift(spark):
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.profiling import (
        profile_diff,
    )

    rows = []
    # snapshot 0 (even ids): 60 rows, 30 distinct keys, values 1..60
    for i in range(60):
        rows.append((i * 2, i % 30, "A", float(i + 1)))
    # snapshot 1 (odd ids): 40 rows (>10% row drift), 30 distinct keys,
    # values 1..40 (max drifts, min stays)
    for i in range(40):
        rows.append((i * 2 + 1, i % 30, "A", float(i + 1)))
    df = spark.createDataFrame(
        rows, "k long, cust long, status string, price double"
    )
    got = {
        r["metric"]: (r["snap_a"], r["snap_b"], r["flagged"])
        for r in profile_diff(
            df, F.col("k") % 2, ("cust", "status"), "price"
        ).collect()
    }
    assert got["n_rows"] == (60.0, 40.0, True)
    assert got["cust_distinct"] == (30.0, 30.0, False)
    assert got["status_distinct"] == (1.0, 1.0, False)
    assert got["price_min"] == (1.0, 1.0, False)
    assert got["price_max"] == (60.0, 40.0, True)


# ---------------------------------------------------------------------------
# review-pass regressions (third continuation wave)
# ---------------------------------------------------------------------------


def test_bpe_oracle_survives_fully_merged_vocab(spark):
    """Review fix: a merge round with NO remaining pairs must not empty
    the oracle's CTE chain — Spark breaks its loop with the vocab
    intact, and the LEFT JOIN/COALESCE form now mirrors that. Checked
    end-to-end through DuckDB on a corpus that fully merges before
    k=6."""
    import duckdb

    from tdei_extract_load_service_spark import oracles as O
    from tdei_extract_load_service_spark.operators.text import (
        bpe_apply,
        bpe_fertility,
    )

    # two-char words: every vocab entry merges to ONE symbol in <=2
    # rounds, leaving rounds 3..6 with empty pair tables
    texts = [("ab ab cd",), ("ab cd cd",)]
    df = spark.createDataFrame(texts, "text string")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES ('ab ab cd'), ('ab cd cd')) t(text)"
    )
    duck_apply = con.execute(O.bpe_apply_oracle_sql(k=6)).fetchall()
    got_apply = [
        (r["token"], r["token_len"], r["occurrences"], r["vocab_slots"])
        for r in bpe_apply(df, "text", k=6).collect()
    ]
    assert [tuple(r) for r in duck_apply] == got_apply
    assert got_apply == [("ab", 2, 3, 1), ("cd", 2, 3, 1)]
    duck_fert = con.execute(O.bpe_fertility_oracle_sql(k=6)).fetchone()
    got_fert = tuple(bpe_fertility(df, "text", k=6).collect()[0])
    assert tuple(duck_fert) == got_fert
    assert got_fert[0] == 6 and got_fert[2] == 6  # words == tokens


def test_profile_diff_missing_snapshot_flags_loudly(spark):
    """Review fix: a one-sided (empty) snapshot yields NULL metric
    values which must COALESCE to flagged=true — the gate fails loudly
    on the most drastic regression instead of NULLing through."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.profiling import (
        profile_diff,
    )

    rows = [(i * 2, i % 5, "A", float(i)) for i in range(1, 20)]  # even only
    df = spark.createDataFrame(
        rows, "k long, cust long, status string, price double"
    )
    out = profile_diff(
        df, F.col("k") % 2, ("cust", "status"), "price"
    ).collect()
    assert len(out) == 5
    assert all(r["flagged"] for r in out)
    assert all(r["snap_b"] is None for r in out)


def test_interval_coverage_tied_duplicate_intervals(spark):
    """Review fix: identical (s, e) intervals for one key must land in
    the same island deterministically (the islands window now carries
    the id tiebreak in BOTH engines)."""
    import datetime as dt

    from tdei_extract_load_service_spark.operators.relational import (
        interval_coverage,
    )

    base = dt.datetime(2024, 6, 1, 9, 0, 0)
    rows = [
        (1, 1, base, base + dt.timedelta(minutes=5)),
        (1, 2, base, base + dt.timedelta(minutes=5)),  # exact duplicate
        (1, 3, base + dt.timedelta(minutes=10), base + dt.timedelta(minutes=11)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, s timestamp_ntz, e timestamp_ntz"
    )
    got = interval_coverage(df, "user_id", "s", "e", "event_id").collect()
    assert [tuple(r) for r in got] == [(1, 3, 2, 6 * 60)]


def test_dsir_resample_overflow_guard(spark):
    """Review fix: a stratum weight total whose threshold product would
    exceed int64 must raise loudly (Spark would wrap silently where
    DuckDB errors — a cross-engine mismatch, not a crash)."""
    import pytest
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.text import dsir_resample

    from tests.test_r13_wave2 import _corpus

    rows = _corpus(seed=3, n_docs=30)
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in rows],
        "doc_id long, text string, stratum string",
    )
    with pytest.raises(ValueError, match="int64"):
        dsir_resample(
            df, "doc_id", "text",
            target=F.col("doc_id") % 3 == 0,
            stratum_col="stratum",
            k_per_stratum=2**62,
        )


# ---------------------------------------------------------------------------
# property suites (randomized corpora vs brute-force references)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user
            st.integers(min_value=0, max_value=200),  # start minute
            st.integers(min_value=0, max_value=30),  # duration minutes
        ),
        min_size=1,
        max_size=25,
    )
)
def test_interval_coverage_property(spark, ivs):
    """Any random interval soup: the operator's per-key union length
    must equal a brute-force minute-set reference (coverage counted on
    a discrete grid, exact because all bounds are whole minutes)."""
    import datetime as dt

    from tdei_extract_load_service_spark.operators.relational import (
        interval_coverage,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (u, i, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for i, (u, s, d) in enumerate(ivs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, s timestamp_ntz, e timestamp_ntz"
    )
    got = {
        r["user_id"]: (r["n_intervals"], r["n_islands"], r["covered_s"])
        for r in interval_coverage(df, "user_id", "s", "e", "event_id").collect()
    }
    # brute-force: half-open minute grid; islands by sweep over sorted
    want = {}
    byu = {}
    for u, s, d in ivs:
        byu.setdefault(u, []).append((s, s + d))
    for u, spans in byu.items():
        mins = set()
        for s, e in spans:
            mins.update(range(s, e))
        covered = len(mins) * 60
        # islands: count maximal runs over sorted spans (touching merges)
        spans.sort()
        islands, cur_end = 0, None
        for s, e in spans:
            if cur_end is None or s > cur_end:
                islands += 1
                cur_end = e
            else:
                cur_end = max(cur_end, e)
        want[u] = (len(spans), islands, covered)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=50), min_size=3, max_size=20
    ),
    st.integers(min_value=1, max_value=8),
)
def test_systematic_slot_logic_property(spark, weights, k):
    """The integer threshold-crossing rule picks exactly min(k,
    nonzero-support) docs when W > 0, proportional within +-1 slot —
    checked directly on the windowed frame the operator builds."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if sum(weights) == 0:
        return
    df = spark.createDataFrame(
        [(i, "s", w) for i, w in enumerate(weights)],
        "doc_id long, stratum string, weight long",
    )
    w_run = (
        Window.partitionBy("stratum")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("stratum")
    cum = df.select(
        "doc_id",
        "weight",
        F.sum("weight").over(w_run).alias("cum"),
        F.sum("weight").over(w_all).alias("w_tot"),
    )
    picked = (
        cum.where(
            F.expr(f"(cum * {k}L) DIV w_tot")
            > F.expr(f"((cum - weight) * {k}L) DIV w_tot")
        )
        .select("doc_id", "weight")
        .collect()
    )
    # every pick has positive weight; pick count == k exactly when
    # every threshold lands inside some doc's weight mass (always true
    # for integer thresholds over W > 0: the k strides partition [0,W))
    assert all(r["weight"] > 0 for r in picked)
    assert len(picked) <= k
    # per-doc picks are proportional: a doc spanning m full strides is
    # picked iff it crosses a boundary; total crossings == k
    crossings = 0
    W = sum(weights)
    cumv = 0
    for w in weights:
        lo = (cumv * k) // W
        cumv += w
        hi = (cumv * k) // W
        crossings += hi - lo
    assert crossings == k
    # the engine's pick set equals the reference crossing set
    ref = []
    cumv = 0
    for i, w in enumerate(weights):
        lo = (cumv * k) // W
        cumv += w
        if (cumv * k) // W > lo:
            ref.append(i)
    assert sorted(r["doc_id"] for r in picked) == ref
