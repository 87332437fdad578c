"""Property tests for the round-9 wave-4/5 operators: exact heavy
hitters must equal the Counter-based reference for ANY key stream, the
join-size estimate must equal the actual join cardinality for ANY key
multisets, the Markov matrix must row-normalize for ANY event log, and a
z-order range scan must equal the plain filter for ANY rectangle."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.sampled_from(["a", "b", "c", "d"])


@settings(max_examples=12, deadline=None)
@given(
    keys=st.lists(_keys, min_size=1, max_size=40),
    k=st.integers(min_value=2, max_value=6),
)
def test_heavy_hitters_equals_counter_reference(spark, keys, k):
    from collections import Counter

    from tdei_extract_load_service_spark.operators.profiling import (
        heavy_hitters,
    )

    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    got = [(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=k).collect()]
    counts = Counter(keys)
    n = len(keys)
    want = sorted(
        ((key, c) for key, c in counts.items() if c * k > n),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
    assert len(got) <= k - 1  # pigeonhole


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.integers(min_value=0, max_value=6), max_size=25),
    right=st.lists(st.integers(min_value=0, max_value=6), max_size=25),
)
def test_join_size_estimate_equals_actual_join(spark, left, right):
    from collections import Counter

    from tdei_extract_load_service_spark.operators.skew import (
        join_size_estimate,
    )

    ldf = spark.createDataFrame(
        pd.DataFrame({"lk": pd.Series(left, dtype="int64")}), schema="lk long"
    )
    rdf = spark.createDataFrame(
        pd.DataFrame({"rk": pd.Series(right, dtype="int64")}), schema="rk long"
    )
    r = join_size_estimate(ldf, rdf, "lk", "rk").collect()[0]
    ca, cb = Counter(left), Counter(right)
    actual = sum(ca[k] * cb[k] for k in ca if k in cb)
    assert r["est_rows"] == actual
    assert r["n_keys_left"] == len(ca)
    assert r["n_keys_right"] == len(cb)
    assert r["n_match_keys"] == len(set(ca) & set(cb))
    if actual:
        assert r["max_key_pairs"] == max(ca[k] * cb[k] for k in ca if k in cb)
    else:
        assert r["max_key_pairs"] == 0 and r["top_share"] == 0.0


@settings(max_examples=10, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=9),   # ts
            st.sampled_from(["A", "B", "C"]),        # type
        ),
        min_size=2,
        max_size=30,
    )
)
def test_markov_rows_normalize_and_count_transitions(spark, events):
    from collections import Counter

    from tdei_extract_load_service_spark.operators.events import (
        event_transition_matrix,
    )

    rows = [(u, t, ty, i) for i, (u, t, ty) in enumerate(events)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["u", "ts", "ty", "eid"])
    )
    got = event_transition_matrix(df, "u", "ts", "ty", "eid").collect()
    # reference: per user, order by (ts, eid), count adjacent pairs
    want = Counter()
    by_user: dict[int, list] = {}
    for u, t, ty, i in rows:
        by_user.setdefault(u, []).append((t, i, ty))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert {(r["prev_type"], r["next_type"]): r["cnt"] for r in got} == dict(want)
    # probabilities row-normalize exactly (sum of p per prev ~ 1 up to
    # the 6-dp rounding of each term)
    from collections import defaultdict

    per_prev = defaultdict(float)
    sizes = defaultdict(int)
    for r in got:
        per_prev[r["prev_type"]] += r["p"]
        sizes[r["prev_type"]] += 1
    for prev, total in per_prev.items():
        assert abs(total - 1.0) <= 1e-6 * sizes[prev]


@settings(max_examples=8, deadline=None)
@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=63),
            st.integers(min_value=0, max_value=63),
        ),
        min_size=1,
        max_size=30,
    ),
    rect=st.tuples(
        st.integers(min_value=0, max_value=63),
        st.integers(min_value=0, max_value=63),
        st.integers(min_value=0, max_value=63),
        st.integers(min_value=0, max_value=63),
    ),
)
def test_zorder_scan_equals_plain_filter_for_any_rect(
    spark, tmp_path_factory, points, rect
):
    from tdei_extract_load_service_spark.operators import zorder as Z

    a1, a2, b1, b2 = min(rect[0], rect[1]), max(rect[0], rect[1]), min(
        rect[2], rect[3]
    ), max(rect[2], rect[3])
    spec = Z.ZorderSpec(
        a_col="a", b_col="b", a_lo=0, a_hi=63, b_lo=0, b_hi=63,
        bits=3, dir_shift=2,
    )
    rows = [(i, a, b) for i, (a, b) in enumerate(points)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "a", "b"]))
    path = Z.build_zorder_layout(
        df, spec, corpus_key=f"prop:{sorted(rows)!r}"
    )
    got = sorted(
        r["rid"]
        for r in Z.zorder_range_scan(spark, path, spec, a1, a2, b1, b2).collect()
    )
    want = sorted(
        i for i, a, b in rows if a1 <= a <= a2 and b1 <= b <= b2
    )
    assert got == want
