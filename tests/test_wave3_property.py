"""Property tests for the round-8 wave-3 operators: incremental view
maintenance must equal the full recompute for ANY feed, the blocked
fuzzy join must equal the quadratic scan for ANY word set, and gap
filling must tile each group's span exactly."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


# -- incremental_agg_maintain == full recompute -------------------------

_vals = st.floats(min_value=-100, max_value=100, allow_nan=False).map(
    lambda v: round(v, 2)
)
_groups = st.sampled_from(["g0", "g1", "g2"])


@settings(max_examples=12, deadline=None)
@given(
    base=st.lists(st.tuples(_groups, _vals), min_size=1, max_size=12),
    ops=st.lists(
        st.tuples(
            st.sampled_from(["del", "move", "update", "insert"]),
            st.integers(min_value=0, max_value=11),
            _groups,
            _vals,
        ),
        max_size=6,
        unique_by=lambda t: t[1],  # at most one change per key
    ),
)
def test_ivm_equals_recompute_for_any_feed(spark, base, ops):
    import pyspark.sql.functions as F

    from tdei_extract_load_service_spark.operators.cdc import (
        incremental_agg_maintain,
    )

    rows = [(i, g, v) for i, (g, v) in enumerate(base)]
    by_key = {k: (g, v) for k, g, v in rows}

    feed, merged = [], dict(by_key)
    for op, key, newg, newv in ops:
        if op == "insert" or key not in by_key:
            k = 1000 + key  # guaranteed-new key
            feed.append((None, None, newg, newv))
            merged[k] = (newg, newv)
            continue
        oldg, oldv = by_key[key]
        if op == "del":
            feed.append((oldg, oldv, None, None))
            merged.pop(key, None)
        elif op == "move":
            feed.append((oldg, oldv, newg, newv))
            merged[key] = (newg, newv)
        else:  # in-place update
            feed.append((oldg, oldv, oldg, newv))
            merged[key] = (oldg, newv)

    def agg(pairs):
        out = {}
        for g, v in pairs:
            n, s = out.get(g, (0, 0.0))
            out[g] = (n + 1, round(s + v, 6))
        return {g: (n, s) for g, (n, s) in out.items() if n > 0}

    base_df = (
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "g", "v"])
        )
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        )
    )
    feed_df = spark.createDataFrame(
        pd.DataFrame(feed or [(None, None, None, None)],
                     columns=["bg", "bv", "ag", "av"]).astype(
            {"bv": "float64", "av": "float64"}
        )
    )
    got = {
        r["g"]: (r["n"], round(float(r["s"]), 6))
        for r in incremental_agg_maintain(
            base_df, feed_df, "g", "n", "s", "bg", "bv", "ag", "av"
        ).collect()
    }
    assert got == agg(merged.values())


# -- fuzzy blocking completeness ----------------------------------------

_words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=6),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(left=_words, right=_words)
def test_blocked_fuzzy_equals_quadratic_scan(spark, left, right):
    import pyspark.sql.functions as F

    from tdei_extract_load_service_spark.operators.fuzzy import (
        fuzzy_join_blocked,
    )

    ldf = spark.createDataFrame(
        pd.DataFrame(list(enumerate(left)), columns=["lid", "lt"])
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(list(enumerate(right)), columns=["rid", "rt"])
    )
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_join_blocked(
            ldf, rdf, "lid", "rid", "lt", "rt"
        ).collect()
    }
    brute = {
        (r["lid"], r["rid"])
        for r in ldf.crossJoin(rdf)
        .where(F.levenshtein("lt", "rt") <= 1)
        .collect()
    }
    assert got == brute


# -- gap filling tiles the span exactly ---------------------------------

@settings(max_examples=10, deadline=None)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=40),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
def test_fill_gaps_tiles_span_and_counts_add_up(spark, offsets):
    from tdei_extract_load_service_spark.operators.events import (
        fill_time_gaps,
    )

    base = pd.Timestamp("2024-03-01 00:30")
    rows = [
        ("g", base + pd.Timedelta(hours=h), float(h + 1)) for h in offsets
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "v"]))
    out = fill_time_gaps(df, "g", "ts", "v").collect()
    buckets = sorted(r["bucket"] for r in out)
    # dense: exactly min..max, no holes, no extras
    assert buckets == list(range(min(buckets), max(buckets) + 1))
    assert len(buckets) == max(offsets) - min(offsets) + 1
    # observed rows preserved; gap rows are zero-count and flagged
    assert sum(r["n_events"] for r in out) == len(offsets)
    for r in out:
        assert r["is_gap"] == (r["n_events"] == 0)
        assert r["value_locf"] is not None
