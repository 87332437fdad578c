"""As-of join and session-window semantics on crafted data; LSH-verified
dedup equivalence to the exact inverted-index result."""

from __future__ import annotations

from datetime import datetime

from tests.conftest import SF_SMOKE
from tdei_extract_load_service_spark.operators.asof import join_asof
from tdei_extract_load_service_spark.operators.dedup import (
    lsh_verified_pairs,
    ngram_jaccard_pairs,
)
from tdei_extract_load_service_spark.streaming.windows import sessionized_event_aggs


def _ts(s):
    return datetime.fromisoformat(s)


def test_join_asof_semantics(spark):
    clicks = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100),
         (1, _ts("2024-01-01 12:00:00"), 101),
         (2, _ts("2024-01-01 09:00:00"), 102)],
        "user_id int, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 900, 10.0),
         (1, _ts("2024-01-01 11:00:00"), 901, 20.0),
         # simultaneous with the click -> inclusive ("at or before")
         (2, _ts("2024-01-01 09:00:00"), 902, 30.0)],
        "user_id int, ts timestamp, event_id long, value double",
    )
    out = {r.event_id: (r.asof_event_id, r.asof_value) for r in
           join_asof(clicks, purchases, "user_id", "ts", "ts", ["event_id", "value"]).collect()}
    assert out[100] == (900, 10.0)   # latest prior purchase
    assert out[101] == (901, 20.0)   # newer purchase supersedes
    assert out[102] == (902, 30.0)   # equal timestamp is inclusive


def test_join_asof_no_prior_is_null(spark):
    clicks = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 1)], "user_id int, ts timestamp, event_id long"
    )
    purchases = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 9, 1.0)],
        "user_id int, ts timestamp, event_id long, value double",
    )
    row = join_asof(clicks, purchases, "user_id", "ts", "ts", ["event_id", "value"]).collect()[0]
    assert row.asof_event_id is None and row.asof_value is None


def test_session_window_gap_semantics(spark):
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0),
         (1, _ts("2024-01-01 10:30:00"), 2.0),    # same session (<1h gap)
         (1, _ts("2024-01-01 12:00:00"), 3.0),    # 90min silence -> new session
         (2, _ts("2024-01-01 10:00:00"), 4.0)],
        "user_id int, ts timestamp, value double",
    )
    out = sorted(
        (r.user_id, str(r.session_start), r.n_events, r.total_value)
        for r in sessionized_event_aggs(events, gap="1 hour").collect()
    )
    assert out == [
        (1, "2024-01-01 10:00:00", 2, 3.0),
        (1, "2024-01-01 12:00:00", 1, 3.0),
        (2, "2024-01-01 10:00:00", 1, 4.0),
    ]


def test_lsh_verified_equals_exact(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = {(r.doc_a, r.doc_b, r.jaccard) for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()}
    verified = {(r.doc_a, r.doc_b, r.jaccard) for r in
                lsh_verified_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()}
    # verified pairs carry exact scores; candidate loss bounded (~2e-4/pair)
    assert verified <= exact
    assert len(exact - verified) <= max(1, len(exact) // 10)


def test_bucketed_range_join_matches_theta_join(spark):
    """Property check: bucketization meets every qualifying (point,
    interval) pair exactly once — equal to the naive theta join on random
    data, across bucket widths (narrower/wider than typical intervals)."""
    import random

    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.range_join import bucketed_range_join

    rng = random.Random(42)
    points = [(i, rng.randint(0, 10_000)) for i in range(400)]
    intervals = []
    for j in range(60):
        lo = rng.randint(0, 9_500)
        intervals.append((j, lo, lo + rng.randint(1, 900)))
    pdf = spark.createDataFrame(points, "pid int, p long")
    idf = spark.createDataFrame(intervals, "iid int, lo long, hi long")

    expected = sorted(
        (p_id, i_id)
        for p_id, p in points
        for i_id, lo, hi in intervals
        if lo <= p < hi
    )
    for width in (64, 500, 2048):
        got = sorted(
            (r.pid, r.iid)
            for r in bucketed_range_join(pdf, idf, "p", "lo", "hi", width).collect()
        )
        assert got == expected, f"width={width}"
