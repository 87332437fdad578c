"""Round-13 optimization pins: restructured operators must stay
bit-identical to the shapes they replaced.

- fused ``simhash64`` (single SQL aggregate with packing in the finish
  lambda) vs the two-step ``pack_bits64(simhash_bits(...))`` Column form,
  both word-hash families;
- the packed BIGINT ``simhash_pairs`` path vs the 64-int-array path it
  replaced (same chunk blocking -> identical candidate and pair sets);
- ``sort_boundary`` is ordering-neutral: a boundary below a global sort
  must not change row content or order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators import dedup as D
from tdei_extract_load_service_spark.session import sort_boundary


TEXTS = [
    "alpha beta gamma alpha",
    "alpha beta gamma delta",
    "one",
    "repeated repeated repeated",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "",  # split('') -> [''] — the empty-word edge both paths must agree on
    "x " * 40 + "y",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


@pytest.mark.parametrize(
    ("family", "word_hash"),
    [("xxhash64", None), ("md5", D.md5_word_hash)],
)
def test_simhash64_fused_equals_two_step(corpus, family, word_hash):
    fused = D.simhash64("text", family)
    two_step = D.pack_bits64(D.simhash_bits(F.col("text"), word_hash=word_hash))
    rows = corpus.select(
        "doc_id", fused.alias("a"), two_step.alias("b")
    ).collect()
    assert rows, "corpus must not be empty"
    for r in rows:
        assert r["a"] == r["b"], f"doc {r['doc_id']}: {r['a']} != {r['b']}"


def test_simhash_sql_fragment_equals_column_fold(corpus):
    # the str-input SQL-fragment path vs the Column fallback must agree
    # bit for bit (integer shiftright decode vs bin()-string decode)
    for wh in (None, D.md5_word_hash):
        rows = corpus.select(
            D.simhash_bits("text", word_hash=wh).alias("a"),
            D.simhash_bits(F.col("text"), word_hash=wh).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in rows)


def test_simhash_pairs_packed_equals_array_path(corpus):
    # str text_col -> packed BIGINT path; Column text_col -> the legacy
    # 64-int-array path. Same 16-bit chunk blocking, so candidate sets
    # and emitted (doc_a, doc_b, hamming) rows must be identical.
    for mh in (3, 6, 10):
        packed = set(
            map(tuple, D.simhash_pairs(corpus, "doc_id", "text", max_hamming=mh).collect())
        )
        legacy = set(
            map(
                tuple,
                D.simhash_pairs(
                    corpus, "doc_id", F.col("text"), max_hamming=mh
                ).collect(),
            )
        )
        assert packed == legacy


def test_sort_boundary_is_ordering_neutral(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    plain = df.orderBy(F.col("k").asc(), F.col("v").desc()).collect()
    bounded = (
        sort_boundary(df, "k", "v")
        .orderBy(F.col("k").asc(), F.col("v").desc())
        .collect()
    )
    assert plain == bounded


def test_outlier_sql_exprs_equal_fluent_form(spark):
    """embedding_outliers' memoized SQL fragments (_outlier_exprs) must
    emit bit-identical doubles to the fluent Column form they replaced."""
    import random

    from tdei_extract_load_service_spark.operators import similarity as S
    from tdei_extract_load_service_spark.operators.dedup import (
        _dot,
        cosine_similarity,
    )

    rnd = random.Random(7)
    dim = 8
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(dim)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vid long, vec array<double>")

    # r14 (ADVICE r13): the fragments reference fixed pre-aliased names
    base = df.select(F.col("vid").alias("__eo_id"), F.col("vec").alias("__eo_v"))
    sum_cols, score_cols = S._outlier_exprs(dim)
    sums_sql = base.agg(*sum_cols).select(
        F.array(*[F.col(f"_s{i}") for i in range(dim)]).alias("_cv")
    )
    got = sorted(
        map(tuple, base.crossJoin(F.broadcast(sums_sql)).select(*score_cols).collect())
    )

    v = F.col("vec")
    sums_fluent = df.agg(
        *[
            F.sum(v[i].cast("double").cast("decimal(25,12)"))
            .cast("double")
            .alias(f"_s{i}")
            for i in range(dim)
        ]
    ).select(F.array(*[F.col(f"_s{i}") for i in range(dim)]).alias("_cv"))
    want = sorted(
        map(
            tuple,
            df.crossJoin(F.broadcast(sums_fluent))
            .select(
                F.col("vid").alias("id"),
                F.round(cosine_similarity(v, F.col("_cv")), 6).alias(
                    "cos_centroid"
                ),
                F.round(_dot(v, v), 6).alias("norm2"),
            )
            .collect(),
        )
    )
    assert got == want


def test_bm25_index_read_memo_invalidates_on_rebuild(spark, tmp_path):
    """_index_read memoizes the parquet read PLAN per (session, path),
    validated against the publish marker's (mtime, size, content
    digest) (r14, ADVICE r13): a rebuilt index under the same path (new
    part files, rewritten _meta.json) must yield fresh rows, never the
    stale file listing."""
    import json
    import os
    import time

    from tdei_extract_load_service_spark.operators import text as TX

    root = str(tmp_path / "idx")
    sub = os.path.join(root, "postings")
    os.makedirs(root, exist_ok=True)

    def publish(vals):
        spark.createDataFrame(
            [(t, v) for t, v in vals], "term string, df long"
        ).coalesce(1).write.mode("overwrite").parquet(sub)
        with open(os.path.join(root, "_meta.json"), "w") as fh:
            json.dump({"v": time.time_ns()}, fh)

    publish([("a", 1)])
    first = TX._index_read(spark, sub).collect()
    assert [(r["term"], r["df"]) for r in first] == [("a", 1)]
    # same marker -> memo hit (same plan object)
    assert TX._index_read(spark, sub) is TX._index_read(spark, sub)
    time.sleep(0.01)
    publish([("b", 2), ("c", 3)])
    second = sorted((r["term"], r["df"]) for r in TX._index_read(spark, sub).collect())
    assert second == [("b", 2), ("c", 3)]


def test_bm25_term_buckets_match_engine_hash(spark):
    """_term_buckets must agree with the engine's xxhash64 as computed
    over a plain frame (the shape the old createDataFrame path used)."""
    from tdei_extract_load_service_spark.operators import text as TX

    terms = ("spark", "join", "window", "scan")
    got = TX._term_buckets(spark, terms, 64)
    want = sorted(
        {
            int(r["b"])
            for r in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(
                F.pmod(F.xxhash64("term"), F.lit(64)).cast("int").alias("b")
            )
            .collect()
        }
    )
    assert got == want
    # memoized second call returns the identical list
    assert TX._term_buckets(spark, terms, 64) == want
