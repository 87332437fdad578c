"""Round-13 second wave: DSIR importance selection — pinned against an
independent pure-Python reference (hashlib.md5 + integer arithmetic,
no Spark/DuckDB machinery)."""

from __future__ import annotations

import random
from hashlib import md5

from pyspark.sql import functions as F


def _dsir_reference(rows, is_target, n=2, buckets=128, scale=10**9):
    """Pure-Python restatement of operators/text.dsir_scores: word
    n-grams with multiplicity, md5-head bucket hash, add-one-smoothed
    integer fixed-point distributions, probability-difference weights."""

    def ngrams(text):
        words = text.split(" ")
        return [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]

    def bucket(ng):
        return int(md5(ng.encode()).hexdigest()[:8], 16) % buckets

    f: dict[tuple[int, int], int] = {}
    targ: dict[int, bool] = {}
    for doc_id, text in rows:
        targ[doc_id] = is_target(doc_id, text)
        for ng in ngrams(text):
            key = (doc_id, bucket(ng))
            f[key] = f.get(key, 0) + 1
    r_cnt: dict[int, int] = {}
    t_cnt: dict[int, int] = {}
    for (doc_id, b), cnt in f.items():
        r_cnt[b] = r_cnt.get(b, 0) + cnt
        if targ[doc_id]:
            t_cnt[b] = t_cnt.get(b, 0) + cnt
    r_tot = sum(r_cnt.values())
    t_tot = sum(t_cnt.values())
    pt = {
        b: ((t_cnt.get(b, 0) + 1) * scale) // (t_tot + buckets)
        for b in r_cnt
    }
    pr = {b: ((c + 1) * scale) // (r_tot + buckets) for b, c in r_cnt.items()}
    scores: dict[int, int] = {}
    for (doc_id, b), cnt in f.items():
        scores[doc_id] = scores.get(doc_id, 0) + cnt * (pt[b] - pr[b])
    return scores


def _corpus(seed=13, n_docs=60):
    rng = random.Random(seed)
    vocab_target = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_other = ["zeta", "eta", "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(n_docs):
        on_target = i % 3 == 0
        vocab = vocab_target if on_target else vocab_other
        # mix in shared words so distributions overlap
        words = [
            rng.choice(vocab if rng.random() < 0.7 else vocab_target + vocab_other)
            for _ in range(rng.randint(2, 30))
        ]
        rows.append((i, " ".join(words)))
    # degenerate docs: no bigram evidence -> excluded on both sides
    rows.append((n_docs, "single"))
    rows.append((n_docs + 1, ""))
    return rows


def test_dsir_scores_match_pure_python(spark):
    from tdei_extract_load_service_spark.operators.text import dsir_scores

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(
            df, "doc_id", "text", target=F.col("doc_id") % 3 == 0
        ).collect()
    }
    want = _dsir_reference(rows, lambda d, t: d % 3 == 0)
    assert got == want
    # docs without a single bigram carry no feature evidence: excluded
    assert len(rows) - 2 not in got and len(rows) - 1 not in got
    # the synthetic target vocabulary must dominate the top of the
    # ranking: every score is exact, so this is a semantics check, not
    # a statistical one
    top10 = sorted(got, key=lambda d: (-got[d], d))[:10]
    assert sum(1 for d in top10 if d % 3 == 0) >= 8


def test_dsir_scores_empty_target_is_defined(spark):
    """No target docs at all: smoothing keeps every weight defined and
    every score exact (pt uniform at scale//(0+buckets))."""
    from tdei_extract_load_service_spark.operators.text import dsir_scores

    rows = _corpus(seed=7, n_docs=20)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(df, "doc_id", "text", target=F.lit(False)).collect()
    }
    want = _dsir_reference(rows, lambda d, t: False)
    assert got == want
    assert got  # non-degenerate docs all scored


# ---------------------------------------------------------------------------
# t_closeness_audit
# ---------------------------------------------------------------------------


def _t_closeness_reference(rows, quasi_of, sens_of, t_num, t_den):
    """Pure-Python ordered-EMD restatement over an already-released
    table: dense per-class cumulative gaps against the global
    distribution, integer cross-multiplied verdict."""
    classes: dict = {}
    g: dict[int, int] = {}
    for r in rows:
        q, s = quasi_of(r), sens_of(r)
        classes.setdefault(q, {}).setdefault(s, 0)
        classes[q][s] += 1
        g[s] = g.get(s, 0) + 1
    svals = sorted(g)
    m, big_n = len(svals), sum(g.values())
    out = {}
    for q, cells in classes.items():
        n_c = sum(cells.values())
        cum_c = cum_g = 0
        num = 0
        for s in svals:
            cum_c += cells.get(s, 0)
            cum_g += g[s]
            num += abs(big_n * cum_c - n_c * cum_g)
        den = (m - 1) * n_c * big_n
        out[q] = (n_c, num, den, t_den * num <= t_num * den)
    return out


def test_t_closeness_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.privacy import (
        t_closeness_audit,
    )

    rng = random.Random(31)
    rows = []
    # class 0: mirrors the global mix; class 1: concentrated (violator);
    # classes 2..5: random mixes; sensitive domain {0..4} with holes in
    # some classes (dense-grid coverage)
    for i in range(240):
        grp = i % 6
        if grp == 1:
            s = 4 if i % 8 else 0
        else:
            s = rng.randint(0, 4) if grp != 2 else rng.choice([1, 3])
        rows.append((grp, s))
    df = spark.createDataFrame(rows, "grp int, sensitive int")
    got = {
        r["grp"]: (
            r["n_records"], r["emd_num"], r["emd_den"], r["t_close"]
        )
        for r in t_closeness_audit(
            df, ["grp"], "sensitive", t_num=3, t_den=25
        ).collect()
    }
    want = _t_closeness_reference(
        rows, lambda r: r[0], lambda r: r[1], 3, 25
    )
    assert got == want
    verdicts = {v[3] for v in got.values()}
    assert verdicts == {True, False}  # both arms exercised
    # the engineered concentrated class must violate, the mirror must
    # not: EMD semantics, not fixture luck
    assert not got[1][3]


def test_t_closeness_identical_distribution_is_zero(spark):
    """A class distributed exactly like the global table has EMD 0."""
    from tdei_extract_load_service_spark.operators.privacy import (
        t_closeness_audit,
    )

    rows = [(g, s) for g in (0, 1) for s in (0, 1, 2) for _ in range(4)]
    df = spark.createDataFrame(rows, "grp int, sensitive int")
    for r in t_closeness_audit(df, ["grp"], "sensitive", 0, 1).collect():
        assert r["emd_num"] == 0 and r["t_close"]


# ---------------------------------------------------------------------------
# mmr_topk
# ---------------------------------------------------------------------------


def _rnd6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _cos(a, b):
    import math

    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += x * y
        na += x * x
        nb += y * y
    return d / (math.sqrt(na) * math.sqrt(nb))


def _mmr_reference(vecs, qv, n_candidates, k, lam=0.5):
    """Pure-Python greedy MMR over ROUND-6 cosines, id tiebreaks."""
    rel = {i: _rnd6(_cos(v, qv)) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:n_candidates]
    sim = {
        (a, b): _rnd6(_cos(vecs[a], vecs[b])) for a in cand for b in cand
    }
    picked = []
    while len(picked) < min(k, len(cand)):
        best = None
        for c in cand:
            if c in [p[0] for p in picked]:
                continue
            ms = max((sim[(c, s)] for s, _, _ in picked), default=0.0)
            score = lam * rel[c] - (1 - lam) * ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        picked.append((best[1], rel[best[1]], best[2]))
    return picked


def test_mmr_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.similarity import mmr_topk

    rng = random.Random(41)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)
    }
    qv = [rng.uniform(-1, 1) for _ in range(8)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = [
        (r["id"], r["rel"], r["mmr_score"], r["mmr_rank"])
        for r in mmr_topk(
            df, "vec_id", "embedding", qv, n_candidates=12, k=5
        ).collect()
    ]
    want = _mmr_reference(vecs, qv, n_candidates=12, k=5)
    assert [(g[0], g[3]) for g in got] == [
        (w[0], t + 1) for t, w in enumerate(want)
    ]
    for g, w in zip(got, want):
        assert g[1] == w[1] and abs(g[2] - w[2]) < 1e-12


def test_mmr_skips_redundant_near_duplicate(spark):
    """Two near-identical top-relevance vectors: MMR must NOT take both
    back to back when a diverse alternative exists — the semantics the
    operator exists for."""
    from tdei_extract_load_service_spark.operators.similarity import mmr_topk

    qv = [1.0, 0.0, 0.0]
    rows = [
        (1, [0.9, 0.1, 0.0]),    # top relevance
        (2, [0.9, 0.100001, 0.0]),  # its near-duplicate
        (3, [0.5, 0.0, 0.8]),    # diverse, decent relevance
        (4, [-0.2, 0.9, 0.1]),   # diverse, low relevance
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["id"], r["mmr_rank"])
        for r in mmr_topk(
            df, "vec_id", "embedding", qv, n_candidates=4, k=3
        ).collect()
    ]
    order = [g[0] for g in got]
    assert order[0] == 1
    assert order[1] == 3  # the near-dup of 1 is deferred behind diverse 3
    # relevance-only ranking would have produced [1, 2, 3]


# ---------------------------------------------------------------------------
# stream_drift_history_shadow
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def test_stream_drift_equals_inline_alerts(spark):
    """Streamed history -> alerts must be BIT-identical to the inline
    embedding_drift_alerts over the whole corpus."""
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_drift_alerts,
    )
    from tdei_extract_load_service_spark.streaming.shadow import (
        drift_history_shadow,
    )

    streamed = drift_history_shadow(
        spark, SF_DIR, n_snapshots=4
    ).collect()
    inline = embedding_drift_alerts(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "vec_id",
        "embedding",
        snapshot_of=lambda c: c % 4,
        snapshots=[0, 1, 2, 3],
        num_centroids=16,
        dim=64,
        min_mean_cosine_fp=300_000,
    ).collect()
    key = lambda r: (r["snapshot"], r["centroid_id"], r["rule"])  # noqa: E731
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, inline))
    assert len(streamed) > 0


def test_drift_history_sink_replay_and_alignment(spark, tmp_path):
    """Exactly-once: a replayed batch id is a no-op. Contract: a NEW
    batch carrying an already-appended snapshot is refused loudly."""
    import pytest

    from tdei_extract_load_service_spark.operators.similarity import (
        ivf_centroids,
    )
    from tdei_extract_load_service_spark.sinks.manifest import read_table
    from tdei_extract_load_service_spark.streaming.sink import (
        DRIFT_HISTORY_SCHEMA,
        drift_history_sink,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    model = ivf_centroids(emb, "vec_id", "embedding", 16).collect()
    root = str(tmp_path / "hist")
    handle = drift_history_sink(
        root, "drift_history", "vec_id", "embedding",
        lambda c: c % 4, model,
    )
    b0 = emb.where(F.col("vec_id") % 4 == 0)
    handle(b0, 0)
    first = sorted(
        map(tuple, read_table(
            spark, root, "drift_history", schema=DRIFT_HISTORY_SCHEMA
        ).collect())
    )
    # replayed batch id: no-op (at-least-once delivery -> exactly-once)
    handle(b0, 0)
    assert sorted(
        map(tuple, read_table(
            spark, root, "drift_history", schema=DRIFT_HISTORY_SCHEMA
        ).collect())
    ) == first
    # a NEW batch id reintroducing snapshot 0 violates the
    # nightly-append contract and must be refused, not double-counted
    with pytest.raises(ValueError, match="nightly-append"):
        handle(b0, 1)
    # the next aligned snapshot appends cleanly
    handle(emb.where(F.col("vec_id") % 4 == 1), 1)
    snaps = {
        r["_snap"]
        for r in read_table(
            spark, root, "drift_history", schema=DRIFT_HISTORY_SCHEMA
        ).select("_snap").distinct().collect()
    }
    assert snaps == {0, 1}


def test_stage_split_expr_aligns_batches(spark):
    """split_expr staging: every staged file holds exactly one snapshot."""
    from tdei_extract_load_service_spark.streaming.shadow import (
        _stage_parquet_batches,
    )

    stage = _stage_parquet_batches(
        spark,
        f"{SF_DIR}/embeddings.parquet",
        ("vec_id",),
        4,
        key_suffix=":driftsnap",
        split_expr="vec_id % 4",
    )
    import os

    files = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    assert len(files) == 4
    for i, f in enumerate(files):
        snaps = (
            spark.read.parquet(os.path.join(stage, f))
            .select((F.col("vec_id") % 4).alias("s"))
            .distinct()
            .collect()
        )
        assert {r["s"] for r in snaps} == {i}


# ---------------------------------------------------------------------------
# bpe_train
# ---------------------------------------------------------------------------


def _bpe_reference(texts, k):
    """Pure-Python BPE trainer: word counts, greedy left-to-right merge
    per round, (count desc, pair text asc) argmax tiebreak."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    segs = {w: [c for c in w] for w in wc}
    merges = []
    for step in range(1, k + 1):
        pairs: dict[tuple, int] = {}
        for w, s in segs.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + wc[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_pure_python(spark):
    from tdei_extract_load_service_spark.operators.text import bpe_train

    rng = random.Random(53)
    vocab = ["banana", "bandana", "ananas", "cabana", "nab", "an", "a"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, "text", k=5).collect()
    ]
    assert got == _bpe_reference(texts, 5)
    # the 'an'-rich vocab guarantees multi-char merges appear: the
    # trainer genuinely iterates (a merged symbol wins a later round)
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got)


def test_bpe_train_greedy_overlap_semantics(spark):
    """'aaaa' + merge (a,a) must segment as [aa, aa] (left-to-right
    non-overlapping), and round 2 must then merge (aa, aa) — pinning
    that replace() IS greedy BPE on the sentinel encoding."""
    from tdei_extract_load_service_spark.operators.text import bpe_train

    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, "text", k=2).collect()
    ]
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_stage_split_expr_rejects_partial_coverage(spark):
    """A split expression that maps rows outside 0..n-1 must fail
    loudly instead of staging (and certifying against) a truncated
    stream."""
    import pytest

    from tdei_extract_load_service_spark.streaming.shadow import (
        _stage_parquet_batches,
    )

    with pytest.raises(ValueError, match="covers"):
        _stage_parquet_batches(
            spark,
            "/root/testdata/sf0.001/embeddings.parquet",
            ("vec_id",),
            4,
            key_suffix=":badcov",
            split_expr="vec_id % 5",  # values 4 fall outside 0..3
        )


def test_bpe_train_rejects_sentinel_in_input(spark):
    """Words containing \\x1f corrupt the bounded encoding identically
    on both engines (oracle-invisible) — must raise, not certify."""
    import pytest

    from tdei_extract_load_service_spark.operators.text import bpe_train

    df = spark.createDataFrame([("ok a\x1fb ok",)], "text string")
    with pytest.raises(ValueError, match="sentinel"):
        bpe_train(df, "text", k=2)
