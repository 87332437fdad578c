"""Round-12 additions: two-stage ANN retrieve+rerank and the
stored-model quality classifier — each pinned against an independent
reference (numpy / pure Python)."""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    # Spark F.round is HALF_UP; Python round() is half-even
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# ann_rerank_topk
# ---------------------------------------------------------------------------


def _rerank_fixture(spark):
    from tdei_extract_load_service_spark.catalog_entries.ann import _pq_index
    from tdei_extract_load_service_spark.catalog import _query_vec

    path, model_rows, cbs = _pq_index(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return path, model_rows, cbs, emb, _query_vec(spark, SF_DIR)


def test_rerank_rescore_matches_numpy(spark):
    """Stage 2 pinned independently: the rerank output must equal
    numpy's exact-cosine ranking of stage 1's candidate set (same
    round-to-6, same id tiebreak)."""
    from tdei_extract_load_service_spark.operators.similarity import (
        ann_rerank_topk,
        ivf_pq_topk_stored,
    )

    path, model_rows, cbs, emb, qvec = _rerank_fixture(spark)
    cands = ivf_pq_topk_stored(
        spark, path, model_rows, qvec, cbs, k=50, n_probe=4
    ).collect()
    cand_ids = {r.id for r in cands}
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
        if r.vec_id in cand_ids
    }
    q = np.array(qvec, dtype=np.float64)
    scored = sorted(
        (
            (
                -_round6(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))),
                i,
            )
            for i, v in vecs.items()
        ),
    )
    want = [(i, -c) for c, i in scored[:10]]

    got = ann_rerank_topk(
        spark, path, model_rows, qvec, cbs, emb, "vec_id", "embedding",
        k=10, n_candidates=50, n_probe=4,
    ).collect()
    assert [(r.id, r.cosine) for r in got] == want
    assert [r.rnk for r in got] == list(range(1, 11))
    assert all(r.id in cand_ids for r in got)


def test_rerank_recall_at_least_ann(spark):
    """The rerank's whole point: against the exact-cosine top-10 ground
    truth, exact re-scoring of the 50-candidate pool must recall at
    least as much as the raw ADC top-10 (deterministic fixtures — a
    pinned measurement, not a statistical claim)."""
    from tdei_extract_load_service_spark.operators.similarity import (
        ann_rerank_topk,
        ivf_pq_topk_stored,
        topk_cosine,
    )

    path, model_rows, cbs, emb, qvec = _rerank_fixture(spark)
    exact = {r.id for r in topk_cosine(emb, "vec_id", "embedding", qvec, 10).collect()}
    ann = {
        r.id
        for r in ivf_pq_topk_stored(
            spark, path, model_rows, qvec, cbs, k=10, n_probe=4
        ).collect()
    }
    rerank = {
        r.id
        for r in ann_rerank_topk(
            spark, path, model_rows, qvec, cbs, emb, "vec_id", "embedding",
            k=10, n_candidates=50, n_probe=4,
        ).collect()
    }
    assert len(rerank & exact) >= len(ann & exact)


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------

_EN_STOP = {"the", "a", "and", "of", "to", "is", "in"}
_PUNCT = set(".,;:!?'\"()-")


def _py_classify(text: str, w=None, threshold=0.5):
    """Pure-Python restatement of quality_classifier's semantics."""
    weights = {
        "intercept": -2.0, "length_term": 2.2, "avg_word_len": 0.15,
        "punct_ratio": -7.0, "stopword_ratio": 4.0,
    }
    if w:
        weights.update(w)
    # Spark/DuckDB trim strips SPACES only — not \n\t (hypothesis caught
    # a python .strip() here treating "\n" as empty)
    trimmed = text.strip(" ")
    n_words = 0 if trimmed == "" else len(re.split(r"[ \t\n\r\f\v]+", trimmed))
    words = text.split(" ")
    awl = sum(len(x) for x in words) / len(words) if words else 0.0
    pr = (
        sum(1 for ch in text if ch in _PUNCT) / len(text) if text else 0.0
    )
    lwords = text.lower().split(" ")
    sr = (
        sum(1 for x in lwords if x in _EN_STOP) / len(lwords)
        if lwords
        else 0.0
    )
    f = {
        "length_term": _round6(min(n_words / 100.0, 1.0)),
        "avg_word_len": _round6(awl),
        "punct_ratio": _round6(pr),
        "stopword_ratio": _round6(sr),
    }
    L = round(weights["intercept"] * 100) * 1_000_000
    for k in ("length_term", "avg_word_len", "punct_ratio", "stopword_ratio"):
        L += round(weights[k] * 100) * round(f[k] * 1_000_000)
    logit = L / 1e8
    prob = 0.5 + 0.5 * L / float(100_000_000 + abs(L))
    return f, logit, prob, ("keep" if prob >= threshold else "drop")


def test_quality_classifier_matches_python(spark):
    docs = [
        ("empty", ""),
        ("soup", "!!! ??? ... ,,, ;;; ::: ((( )))"),
        (
            "good",
            "the quick brown fox is a friend of the lazy dog and the "
            "cat is in the garden to watch the birds of the morning",
        ),
        ("short", "word"),
        ("longish", " ".join(f"token{i} the of to" for i in range(40))),
    ]
    from tdei_extract_load_service_spark.operators.text import (
        quality_classifier,
    )

    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.id: r.asDict()
        for r in quality_classifier(df, "doc_id", "text").collect()
    }
    assert set(got) == {d for d, _ in docs}
    for doc_id, text in docs:
        f, logit, prob, label = _py_classify(text)
        row = got[doc_id]
        for k, v in f.items():
            assert abs(row[k] - v) < 1e-9, (doc_id, k, row[k], v)
        assert row["logit"] == logit, doc_id  # bit-identical by design
        assert row["prob"] == prob, doc_id
        assert row["label"] == label, doc_id
    # the intended separations: natural text keeps, punct soup drops
    assert got["good"]["label"] == "keep"
    assert got["soup"]["label"] == "drop"
    assert got["empty"]["label"] == "drop"


def test_audio_envelope_hash_matches_python(spark):
    """The envelope hash over the REAL WAV decode must equal a pure-
    Python restatement from the fixture's closed-form sample formula
    (integer cross-multiplied mean test — no float anywhere), and a
    truncated/garbage blob must land in the error column."""
    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        audio_envelope_hash,
        synth_wav,
    )

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    got = {
        r.media_id: (r.ehash, r.decoded)
        for r in audio_envelope_hash(synth_wav(ids, "doc_id")).collect()
    }

    def py_hash(mid: int) -> int:
        n = 800 + (mid % 5) * 100
        s = [abs(((mid * 31 + i * 17 + 977) % 4001) - 2000) for i in range(n)]
        total = sum(s)
        h = 0
        for j in range(64):
            a, b = (j * n) // 64, ((j + 1) * n) // 64
            h = (h << 1) | (1 if sum(s[a:b]) * n > total * (b - a) else 0)
        return h - (1 << 64) if h >= 1 << 63 else h

    assert got == {m: (py_hash(m), True) for m in range(40)}

    bad = spark.createDataFrame(
        [(99, b"RIFFxxxxWAVEgarbage")], "media_id long, content binary"
    )
    row = audio_envelope_hash(bad).collect()[0]
    assert not row.decoded and row.ehash is None and row.error


def test_shard_assign_properties(spark):
    """Every row lands in exactly one shard; positions are dense 1..n
    per shard; the layout is deterministic across invocations; a new
    seed produces a different global permutation; with_position=False
    is assignment-only (no pos column)."""
    from tdei_extract_load_service_spark.operators.sampling import (
        shard_assign,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = shard_assign(df, "k", n_shards=4, seed="e0").collect()
    assert len(a) == 2000
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic re-run
    b = shard_assign(df, "k", n_shards=4, seed="e0").collect()
    assert {(r.k, r.shard, r.pos) for r in a} == {
        (r.k, r.shard, r.pos) for r in b
    }
    # a new epoch seed is a fresh permutation
    c = shard_assign(df, "k", n_shards=4, seed="e1").collect()
    assert {(r.k, r.shard, r.pos) for r in a} != {
        (r.k, r.shard, r.pos) for r in c
    }
    no_pos = shard_assign(df, "k", n_shards=4, with_position=False)
    assert "pos" not in no_pos.columns and "shard" in no_pos.columns


def test_quality_classifier_custom_weights_and_threshold(spark):
    """Weight overrides are serving-time literals: flipping the punct
    weight's sign must flip the soup doc's decision; a threshold of 0
    keeps everything."""
    from tdei_extract_load_service_spark.operators.text import (
        quality_classifier,
    )

    df = spark.createDataFrame(
        [("soup", "!!! ??? ... ,,, ;;; ::: ((( )))")],
        "doc_id string, text string",
    )
    flipped = quality_classifier(
        df, "doc_id", "text", weights={"punct_ratio": 7.0, "intercept": 0.0}
    ).collect()[0]
    assert flipped.label == "keep"
    keep_all = quality_classifier(df, "doc_id", "text", threshold=0.0).collect()[0]
    assert keep_all.label == "keep"


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abcdefghijklmnopqrstuvwxyz .,!?;:'\"()-0123456789\t\n")
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(texts=_texts)
def test_quality_classifier_equals_python_for_any_text(spark, texts):
    """For ANY ascii-ish text the classifier's every output column must
    equal the pure-Python mirror — logit and prob BIT-identically (the
    fixed-point construction's whole claim)."""
    from tdei_extract_load_service_spark.operators.text import (
        quality_classifier,
    )

    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    got = {
        r.id: r.asDict()
        for r in quality_classifier(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        f, logit, prob, label = _py_classify(t)
        row = got[str(i)]
        for k, v in f.items():
            assert row[k] == v, (t, k, row[k], v)
        assert row["logit"] == logit and row["prob"] == prob, t
        assert row["label"] == label, t


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60, unique=True),
    n_shards=st.integers(1, 7),
    seed=st.sampled_from(["", "e1", "x"]),
)
def test_shard_assign_partition_properties(spark, keys, n_shards, seed):
    """For ANY unique key set: shards partition the input (every row in
    exactly one shard in [0, n_shards)), and positions are dense 1..n
    within each shard."""
    from tdei_extract_load_service_spark.operators.sampling import (
        shard_assign,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = shard_assign(df, "k", n_shards=n_shards, seed=seed).collect()
    assert sorted(r.k for r in rows) == sorted(keys)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# ---------------------------------------------------------------------------
# embedding_drift_report
# ---------------------------------------------------------------------------


def test_embedding_drift_matches_numpy(spark):
    """The drift report must equal an independent numpy restatement:
    same seeded cells, same rounded-cosine argmax assignment, DECIMAL
    means mirrored as round-9 of exact fraction sums, drift cosine on
    those means. Identical snapshots must report mean_cosine == 1.0 and
    equal shares."""
    from fractions import Fraction

    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_drift_report,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    a_ids = sorted(i for i in rows if i % 2 == 0)
    b_ids = sorted(i for i in rows if i % 2 == 1)
    cents = {cid: rows[cid] for cid in a_ids[:16]}

    def assign(ids):
        out: dict[int, list[int]] = {}
        for i in ids:
            v = rows[i]
            best = max(
                sorted(cents),
                key=lambda c: (
                    _round6(
                        float(
                            v @ cents[c]
                            / (np.linalg.norm(v) * np.linalg.norm(cents[c]))
                        )
                    ),
                    -c,
                ),
            )
            out.setdefault(best, []).append(i)
        return out

    def means(cells):
        return {
            c: np.array(
                [
                    round(
                        float(
                            sum(Fraction(repr(rows[i][d])) for i in ids)
                            / len(ids)
                        ),
                        9,
                    )
                    for d in range(64)
                ]
            )
            for c, ids in cells.items()
        }

    ca, cb = assign(a_ids), assign(b_ids)
    ma, mb = means(ca), means(cb)
    got = {
        r.centroid_id: r.asDict()
        for r in embedding_drift_report(
            emb.where(F.col("vec_id") % 2 == 0),
            emb.where(F.col("vec_id") % 2 == 1),
            "vec_id",
            "embedding",
        ).collect()
    }
    assert set(got) == set(ca) | set(cb)
    for cid, row in got.items():
        assert row["n_a"] == len(ca.get(cid, []))
        assert row["n_b"] == len(cb.get(cid, []))
        assert row["share_a"] == _round6(len(ca.get(cid, [])) / len(a_ids))
        if cid in ma and cid in mb:
            va, vb = ma[cid], mb[cid]
            want = _round6(
                float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            )
            assert abs(row["mean_cosine"] - want) < 2e-6, (cid, row["mean_cosine"], want)

    # identical snapshots: zero drift by construction
    same = {
        r.centroid_id: r
        for r in embedding_drift_report(
            emb.where(F.col("vec_id") % 2 == 0),
            emb.where(F.col("vec_id") % 2 == 0),
            "vec_id",
            "embedding",
        ).collect()
    }
    assert all(r.mean_cosine == 1.0 and r.n_a == r.n_b for r in same.values())
