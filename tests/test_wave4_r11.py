"""Round-11 fourth-wave operators: triangle counting, declarative DQ
expectations, condition-driven MERGE, n-gram containment, batch ANN.

Each test pins the operator against an independent driver-side
reference (brute force or hand computation), complementing the DuckDB
value oracles in catalog_entries/*.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _brute_triangles(edges: set[tuple[int, int]]) -> dict[int, int]:
    """Per-node triangle counts by enumerating all node triples."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_known_graph(spark):
    from tdei_extract_load_service_spark.operators.graph import triangle_counts

    # two triangles sharing node 3; input carries a duplicate, the
    # reverse orientation and a self-loop — all must be canonicalized
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (2, 1), (6, 6)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges, "src", "dst").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_counts_random_graph_vs_brute_force(spark):
    from tdei_extract_load_service_spark.operators.graph import triangle_counts

    rng = random.Random(20260816)
    nodes = list(range(40))
    edges = {
        (u, v)
        for u in nodes
        for v in nodes
        if u < v and rng.random() < 0.25
    }
    expected = _brute_triangles(edges)
    assert expected, "fixture must contain triangles"
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, "src", "dst").collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# dq_check
# ---------------------------------------------------------------------------


def test_dq_check_metrics_and_verdicts(spark):
    from tdei_extract_load_service_spark.operators.profiling import dq_check

    rows = [
        (1, "A", 10.0),
        (2, "A", 20.0),
        (2, "B", 5000.0),  # duplicate key, out-of-range value
        (4, None, 30.0),  # null category
        (5, "C", 40.0),  # unaccepted category
    ]
    df = spark.createDataFrame(rows, "id long, cat string, v double")
    out = {
        r["rule"]: r
        for r in dq_check(
            df,
            [
                {"rule": "id_unique", "kind": "unique", "col": "id"},
                {"rule": "cat_not_null", "kind": "not_null", "col": "cat",
                 "min_ratio": 0.9},
                {"rule": "cat_accepted", "kind": "accepted_values",
                 "col": "cat", "values": ["A", "B"], "min_ratio": 0.5},
                {"rule": "v_range", "kind": "between", "col": "v",
                 "lo": 0, "hi": 100, "min_ratio": 0.8},
                {"rule": "rows", "kind": "row_count_between",
                 "lo": 5, "hi": 5},
            ],
        ).collect()
    }
    # 4 distinct of 5 rows
    assert out["id_unique"]["metric_fp"] == 800_000
    assert not out["id_unique"]["passed"]
    # 4 non-null of 5 < 0.9
    assert out["cat_not_null"]["metric_fp"] == 800_000
    assert not out["cat_not_null"]["passed"]
    # 3 in {A,B} of 5 >= 0.5
    assert out["cat_accepted"]["metric_fp"] == 600_000
    assert out["cat_accepted"]["passed"]
    # 4 of 5 in range >= 0.8
    assert out["v_range"]["metric_fp"] == 800_000
    assert out["v_range"]["passed"]
    assert out["rows"]["metric_fp"] == 5
    assert out["rows"]["passed"]


def test_dq_check_unknown_kind_raises(spark):
    from tdei_extract_load_service_spark.operators.profiling import dq_check

    df = spark.range(1)
    with pytest.raises(ValueError, match="unknown dq rule kind"):
        dq_check(df, [{"rule": "x", "kind": "nope"}])


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def _merge_fixture(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    source = spark.createDataFrame(
        [
            (2, 5.0, False, None),  # matched update
            (3, 0.0, True, None),  # matched delete
            (9, 99.0, False, "new"),  # not matched -> insert
        ],
        "k long, delta double, is_del boolean, new_name string",
    )
    return target, source


def test_merge_upsert_all_arms(spark):
    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    target, source = _merge_fixture(spark)
    out = merge_upsert(
        target,
        source,
        ["k"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        matched_delete=F.col("s.is_del"),
        insert_values={"name": F.col("s.new_name"), "bal": F.col("s.delta")},
    )
    got = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0),  # untouched
        2: ("b", 25.0),  # updated (name kept — not in update_set)
        9: ("new", 99.0),  # inserted
        4: ("d", 40.0),  # untouched
    }
    assert out.columns == target.columns


def test_merge_upsert_insert_disabled(spark):
    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    target, source = _merge_fixture(spark)
    out = merge_upsert(
        target,
        source,
        ["k"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        matched_delete=F.col("s.is_del"),
        insert_values=None,
    )
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 4]


def test_merge_upsert_no_delete_clause(spark):
    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    target, source = _merge_fixture(spark)
    out = merge_upsert(
        target,
        source,
        ["k"],
        update_set={"bal": F.col("s.delta")},
        insert_values={"name": F.col("s.new_name"), "bal": F.col("s.delta")},
    )
    got = {r["k"]: r["bal"] for r in out.collect()}
    # without a delete clause, k=3 is a plain update
    assert got == {1: 10.0, 2: 5.0, 3: 0.0, 4: 40.0, 9: 99.0}


def test_merge_upsert_duplicate_matched_key_raises(spark):
    """ANSI MERGE cardinality violation (ADVICE r11): a source key that
    matches a target row more than once must RAISE at runtime, never
    silently multiply the target row."""
    import pytest as _pytest

    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    target, _ = _merge_fixture(spark)
    dup = spark.createDataFrame(
        [(2, 1.0, False, None), (2, 2.0, False, None)],
        "k long, delta double, is_del boolean, new_name string",
    )
    out = merge_upsert(
        target,
        dup,
        ["k"],
        update_set={"bal": F.col("s.delta")},
        insert_values={"bal": F.col("s.delta")},
    )
    with _pytest.raises(Exception, match="cardinality violation"):
        out.collect()


def test_merge_upsert_null_and_insert_dup_keys_are_well_defined(spark):
    """NULL keys derive match state from presence flags, not key
    nullness: a null-keyed source row never matches (SQL join
    semantics) and flows to the insert arm; duplicate keys on the
    INSERT side insert both rows (ANSI does not raise there)."""
    from tdei_extract_load_service_spark.operators.cdc import merge_upsert

    target, _ = _merge_fixture(spark)
    src = spark.createDataFrame(
        [(None, 7.0, False, "nul"), (9, 1.0, False, "x"), (9, 2.0, False, "y")],
        "k long, delta double, is_del boolean, new_name string",
    )
    out = merge_upsert(
        target,
        src,
        ["k"],
        update_set={"bal": F.col("s.delta")},
        insert_values={"name": F.col("s.new_name"), "bal": F.col("s.delta")},
    ).collect()
    assert len(out) == 4 + 3  # 4 target rows untouched + 3 inserts
    inserted = sorted(
        (r["name"], r["bal"]) for r in out if r["k"] is None or r["k"] == 9
    )
    assert inserted == [("nul", 7.0), ("x", 1.0), ("y", 2.0)]


# ---------------------------------------------------------------------------
# ngram_containment_pairs
# ---------------------------------------------------------------------------


def test_containment_catches_what_jaccard_misses(spark):
    from tdei_extract_load_service_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, small), (2, small + " " + filler)],
        "doc_id long, text string",
    )
    # doc 1 has 3 shingles, all present in doc 2 -> containment 1.0;
    # doc 2 has ~62 shingles -> jaccard ~ 3/62, far below 0.8
    cont = ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9)
    rows = cont.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.1
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    assert jac.count() == 0


def test_containment_values_match_manual_sets(spark):
    from tdei_extract_load_service_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    t1 = "a b c d e f"
    t2 = "a b c d x y z"

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    s1, s2 = shingles(t1), shingles(t2)
    inter = len(s1 & s2)
    want_cont = round(inter / min(len(s1), len(s2)), 6)
    want_jac = round(inter / len(s1 | s2), 6)
    docs = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    got = ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0
    ).collect()
    assert len(got) == 1
    assert got[0]["containment"] == pytest.approx(want_cont, abs=1e-9)
    assert got[0]["jaccard"] == pytest.approx(want_jac, abs=1e-9)


# ---------------------------------------------------------------------------
# lsh_bucket_topk_batch
# ---------------------------------------------------------------------------


def test_batch_topk_equals_per_query_probes(spark):
    from tdei_extract_load_service_spark.operators.similarity import (
        lsh_bucket_topk,
        lsh_bucket_topk_batch,
        make_planes,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = make_planes(4, 64)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    batch = lsh_bucket_topk_batch(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k=5, dim=64, n_planes=4, planes=planes,
    ).collect()
    by_query: dict[int, list] = {}
    for r in batch:
        by_query.setdefault(r["query_id"], []).append(r)
    qvecs = {
        r["vec_id"]: list(r["embedding"]) for r in queries.collect()
    }
    assert set(by_query) == set(qvecs)
    for qid, qvec in qvecs.items():
        single = lsh_bucket_topk(
            emb, "vec_id", "embedding", [float(x) for x in qvec],
            k=5, dim=64, n_planes=4, planes=planes,
        ).collect()
        got = sorted(by_query[qid], key=lambda r: r["rnk"])
        assert [(r["id"], r["cosine"]) for r in got] == [
            (r["id"], r["cosine"]) for r in single
        ]


def test_batch_topk_exclude_self(spark):
    """exclude_self drops id == query_id BEFORE the ranking window:
    ranks stay dense 1..k and the k-th real neighbor is kept (a
    post-hoc filter would yield k-1 gapped rows — ADVICE r11)."""
    from tdei_extract_load_service_spark.operators.similarity import (
        lsh_bucket_topk_batch,
        make_planes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = make_planes(4, 64)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    kwargs = dict(k=5, dim=64, n_planes=4, planes=planes)
    with_self = lsh_bucket_topk_batch(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", **kwargs
    ).collect()
    no_self = lsh_bucket_topk_batch(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        exclude_self=True, **kwargs
    ).collect()
    assert all(r["id"] != r["query_id"] for r in no_self)
    by_q: dict[int, list] = {}
    for r in no_self:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    # dense 1..n ranks per query, no gaps
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # equal to ranking the self-free candidate set (not post-filtering):
    # every query whose bucket held >= 6 candidates still gets 5 rows
    with_by_q: dict[int, int] = {}
    for r in with_self:
        with_by_q[r["query_id"]] = max(with_by_q.get(r["query_id"], 0), r["rnk"])
    for qid, rnks in by_q.items():
        if with_by_q.get(qid, 0) == 5:
            assert len(rnks) >= 4


def test_dq_check_empty_table(spark):
    """Ratio rules over an empty table must not divide by zero (ANSI
    DIV 0 throws): metric 0, failed; row_count reports the emptiness."""
    from tdei_extract_load_service_spark.operators.profiling import dq_check

    df = spark.range(0).select(F.col("id").alias("v"))
    out = {
        r["rule"]: (r["metric_fp"], r["passed"])
        for r in dq_check(
            df,
            [
                {"rule": "nn", "kind": "not_null", "col": "v"},
                {"rule": "cnt", "kind": "row_count_between",
                 "lo": 1, "hi": 10},
            ],
        ).collect()
    }
    assert out["nn"] == (0, False)
    assert out["cnt"] == (0, False)


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_drop_rule_and_cluster_fence(spark):
    """Within-cluster near-twins drop to the lowest id; a near-identical
    pair SPLIT by the cluster boundary survives (the published
    SemDeDup trade, asserted so the fence is a pinned behavior, not an
    accident)."""
    import pandas as pd

    from tdei_extract_load_service_spark.operators.dedup import semantic_dedup

    dim = 4

    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * (dim - len(xs))

    rows = [
        # cluster around +x: ids 0,1 nearly identical -> 1 drops;
        # id 2 orthogonal-ish enough to survive the 0.95 bar
        (0, vec(1.0, 0.0)),
        (1, vec(0.999, 0.01)),
        (2, vec(0.8, 0.6)),
        # cluster around +y: 3,4 near-identical -> 4 drops
        (3, vec(0.0, 1.0)),
        (4, vec(0.01, 0.999)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    got = {
        r["id"]: r["centroid_id"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", k_clusters=2, iters=2,
            threshold=0.95, dim=dim,
        ).collect()
    }
    assert set(got) == {0, 2, 3}
    # the fence: 0 and 3's clusters differ, so even a threshold of -1
    # (everything similar) would never compare them across clusters
    all_pairs = semantic_dedup(
        df, "vec_id", "embedding", k_clusters=2, iters=2,
        threshold=-1.0, dim=dim,
    ).collect()
    survivors = {r["id"] for r in all_pairs}
    # one survivor PER CLUSTER (threshold -1 drops every within-cluster
    # junior), proving cross-cluster pairs were never examined
    assert len(survivors) == 2
