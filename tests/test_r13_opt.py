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
