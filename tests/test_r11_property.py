"""Property tests for the round-11 wave 4-6 operators: merge_upsert
must equal a dict-based MERGE reference for ANY target/source pair,
dq_check metrics must equal Counter-based references for ANY frame,
k_anonymize must release exactly the rows whose class clears k, and
triangle counts must be orientation-invariant for ANY graph."""

from __future__ import annotations

import itertools

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_key = st.integers(min_value=0, max_value=9)


@settings(max_examples=10, deadline=None)
@given(
    target=st.dictionaries(_key, st.integers(0, 100), max_size=8),
    source=st.dictionaries(
        _key,
        st.tuples(st.sampled_from(["U", "D"]), st.integers(0, 100)),
        max_size=8,
    ),
)
def test_merge_upsert_equals_dict_reference(spark, target, source):
    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    tdf = spark.createDataFrame(
        pd.DataFrame(
            [(k, float(v)) for k, v in sorted(target.items())],
            columns=["k", "bal"],
        ),
        schema="k long, bal double",
    )
    sdf = spark.createDataFrame(
        pd.DataFrame(
            [(k, op, float(v)) for k, (op, v) in sorted(source.items())],
            columns=["k", "op", "val"],
        ),
        schema="k long, op string, val double",
    )
    got = {
        r["k"]: r["bal"]
        for r in merge_upsert(
            tdf,
            sdf,
            ["k"],
            update_set={"bal": F.col("s.val")},
            matched_delete=F.col("s.op") == "D",
            insert_values={"bal": F.col("s.val")},
            insert_condition=F.col("s.op") != "D",
        ).collect()
    }
    want = {k: float(v) for k, v in target.items()}
    for k, (op, v) in source.items():
        if op == "D":
            want.pop(k, None)  # delete of absent key: no-op, no insert
        else:
            want[k] = float(v)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        min_size=1,
        max_size=30,
    ),
    lo=st.integers(-3, 0),
    hi=st.integers(1, 4),
)
def test_dq_check_equals_counter_reference(spark, vals, lo, hi):
    from tdei_extract_load_service_spark.operators.profiling import dq_check

    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(vals, dtype="Int64")}), schema="v long"
    )
    out = {
        r["rule"]: (r["metric_fp"], r["passed"])
        for r in dq_check(
            df,
            [
                {"rule": "nn", "kind": "not_null", "col": "v",
                 "min_ratio": 0.5},
                {"rule": "uq", "kind": "unique", "col": "v"},
                {"rule": "rng", "kind": "between", "col": "v",
                 "lo": lo, "hi": hi, "min_ratio": 0.5},
                {"rule": "cnt", "kind": "row_count_between",
                 "lo": 1, "hi": 1000},
            ],
        ).collect()
    }
    n = len(vals)
    nn = sum(1 for v in vals if v is not None)
    nd = len({v for v in vals if v is not None})
    inr = sum(1 for v in vals if v is not None and lo <= v <= hi)
    assert out["nn"] == (1_000_000 * nn // n, 1_000_000 * nn // n >= 500_000)
    assert out["uq"] == (1_000_000 * nd // n, 1_000_000 * nd // n >= 1_000_000)
    assert out["rng"] == (
        1_000_000 * inr // n,
        1_000_000 * inr // n >= 500_000,
    )
    assert out["cnt"] == (n, True)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2)),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 5),
)
def test_k_anonymize_release_is_exactly_clearing_classes(spark, rows, k):
    from collections import Counter

    from tdei_extract_load_service_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, a, b) for i, (a, b) in enumerate(rows)],
            columns=["id", "qa", "qb"],
        ),
        schema="id long, qa long, qb long",
    )
    got = k_anonymize(df, ["qa", "qb"], k=k).collect()
    counts = Counter(rows)
    want_ids = {i for i, quasi in enumerate(rows) if counts[quasi] >= k}
    assert {r["id"] for r in got} == want_ids
    assert all(r["eq_class_n"] == counts[(r["qa"], r["qb"])] for r in got)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=40
    )
)
def test_triangle_counts_equals_brute_force_any_graph(spark, edges):
    from tdei_extract_load_service_spark.operators.graph import triangle_counts

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(
        pd.DataFrame(sorted(edges) or [(0, 0)], columns=["src", "dst"]),
        schema="src long, dst long",
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, "src", "dst").collect()
    }
    assert got == want
