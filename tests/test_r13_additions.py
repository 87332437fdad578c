"""Round-13 additions: cross-run drift alerting and the streaming
incremental-dedup certification — each pinned against an independent
reference (pure Python / batch recompute)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# embedding_drift_alerts
# ---------------------------------------------------------------------------


def _alerts_reference(vecs: dict, snapshots, num_centroids, dim,
                      share_swing_fp, min_rot_fp, snap_of):
    """Pure-Python restatement: frozen lowest-id model, rounded-cosine
    argmax, DECIMAL-exact cell means, dense matrix, integer shares,
    consecutive-pair rules."""

    def rnd(x, p):
        return float(Decimal(repr(x)).quantize(
            Decimal(f"1e-{p}"), ROUND_HALF_UP))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return rnd(d / (na * nb), 6)

    model = sorted(vecs)[:num_centroids]
    cells = sorted(model)

    def assign(v):
        best = None
        for cid in cells:
            sim = cos(v, vecs[cid])
            key = (-sim, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        return best[1]

    # dense (snap, cell) -> [n, mean|None]
    groups: dict = {(s, c): [] for s in snapshots for c in cells}
    for vid, v in vecs.items():
        groups[(snap_of(vid), assign(v))].append(v)
    stats = {}
    for key, members in groups.items():
        n = len(members)
        mean = None
        if n:
            mean = [
                rnd(float(sum(Decimal(repr(m[i])) for m in members)
                          / Decimal(n)), 9)
                for i in range(dim)
            ]
        stats[key] = (n, mean)
    tot = {s: sum(stats[(s, c)][0] for c in cells) for s in snapshots}
    share = {k: (1_000_000 * v[0]) // tot[k[0]] for k, v in stats.items()}

    out = []
    swing_hist: dict = {}
    for idx, s in enumerate(snapshots):
        if idx == 0:
            continue
        prev = snapshots[idx - 1]
        for c in cells:
            n, mean = stats[(s, c)]
            pn, pmean = stats[(prev, c)]
            swing = abs(share[(s, c)] - share[(prev, c)])
            rot = None
            if mean is not None and pmean is not None:
                rot = int(rnd(1_000_000.0 * cos(pmean, mean), 0))
            sw_fired = swing >= share_swing_fp
            prev_sw = swing_hist.get(c)
            streak = 0 if not sw_fired else 1 + (1 if prev_sw else 0)
            swing_hist[c] = sw_fired
            out.append((s, c, "cell_vanished", n, 1, pn > 0 and n == 0))
            out.append((s, c, "mean_rotation", rot, min_rot_fp,
                        rot is not None and rot < min_rot_fp))
            out.append((s, c, "share_swing", swing, share_swing_fp, sw_fired))
            out.append((s, c, "sustained_swing", streak, 2, streak >= 2))
    return sorted(out)


def test_drift_alerts_match_pure_python(spark):
    """The operator over an ENGINEERED corpus (one cell vanishes, one
    swings hard, one rotates) must equal the pure-Python restatement
    row for row."""
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_drift_alerts,
    )

    dim, C = 8, 2
    # ids 0..1 are the model (cell seeds); snapshot = id // 10
    vecs = {}
    vecs[0] = [1.0] + [0.0] * (dim - 1)            # cell-0 seed
    vecs[1] = [0.0, 1.0] + [0.0] * (dim - 2)       # cell-1 seed
    # snapshot 0 (ids 0..9): both cells populated
    vecs[2] = [0.2, 0.8] + [0.0] * (dim - 2)
    vecs[3] = [0.1, 0.9] + [0.0] * (dim - 2)
    # snapshot 1 (ids 10..19): cell 1 vanishes, cell 0 swings to 100%
    vecs[10] = [0.8, 0.2] + [0.0] * (dim - 2)
    vecs[11] = [0.7, 0.3, 0.3] + [0.0] * (dim - 3)  # rotated mean
    # snapshot 2 (ids 20..29): cell 1 reappears
    vecs[20] = [0.9, 0.05] + [0.0] * (dim - 2)
    vecs[21] = [0.05, 0.95] + [0.0] * (dim - 2)
    vecs[22] = [0.1, 0.9] + [0.0] * (dim - 2)
    pdf = pd.DataFrame(
        {"vec_id": list(vecs), "embedding": [vecs[k] for k in vecs]}
    )
    df = spark.createDataFrame(pdf)
    got = [
        tuple(r)
        for r in embedding_drift_alerts(
            df, "vec_id", "embedding",
            snapshot_of=lambda c: F.floor(c / 10),
            snapshots=[0, 1, 2],
            num_centroids=C, dim=dim,
            share_swing_fp=200_000, min_mean_cosine_fp=990_000,
        ).collect()
    ]
    want = _alerts_reference(
        vecs, [0, 1, 2], C, dim, 200_000, 990_000, lambda i: i // 10
    )
    assert sorted(got) == want
    # the engineered events actually fire
    fired = {(r[0], r[1], r[2]) for r in got if r[5]}
    assert (1, 1, "cell_vanished") in fired, "cell-1 vanish must alert"
    assert any(r[2] == "share_swing" and r[5] for r in got)


def test_drift_alerts_full_matrix_and_invariants(spark):
    """Catalog-entry shape at sf0.001: dense (pairs x cells x 4 rules)
    matrix, no NULL fired, sustained implies swing, vanished implies
    n == 0."""
    from tdei_extract_load_service_spark.catalog import REGISTRY

    rows = REGISTRY["embedding_drift_alert"].query(spark, SF_DIR).collect()
    assert len(rows) == 3 * 16 * 4
    by_key = {(r.snapshot_id, r.centroid_id, r.rule): r for r in rows}
    assert all(r.fired is not None for r in rows)
    for (s, c, rule), r in by_key.items():
        if rule == "sustained_swing" and r.fired:
            assert by_key[(s, c, "share_swing")].fired
            assert r.metric_fp == 2
        if rule == "cell_vanished" and r.fired:
            assert r.metric_fp == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.integers(min_value=-99, max_value=99).map(lambda v: v / 10.0),
            min_size=4,
            max_size=4,
        ),
        min_size=4,
        max_size=24,
    ),
    n_snaps=st.integers(min_value=2, max_value=4),
)
def test_drift_alerts_property_matches_reference(spark, data, n_snaps):
    """Randomized corpora through the operator must equal the
    pure-Python restatement — the drift-alert analogue of the r11
    property suites. Zero vectors are nudged (cosine undefined);
    snapshot = id % n_snaps, 2 cells, dim 4."""
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_drift_alerts,
    )

    dim, C = 4, 2
    vecs = {}
    for i, v in enumerate(data):
        if all(x == 0.0 for x in v):
            v = [1.0] + v[1:]
        vecs[i] = v
    snaps = list(range(n_snaps))
    got = [
        tuple(r)
        for r in embedding_drift_alerts(
            spark.createDataFrame(
                pd.DataFrame(
                    {"vec_id": list(vecs), "embedding": [vecs[k] for k in vecs]}
                )
            ),
            "vec_id",
            "embedding",
            snapshot_of=lambda c: c % n_snaps,
            snapshots=snaps,
            num_centroids=C,
            dim=dim,
            share_swing_fp=150_000,
            min_mean_cosine_fp=900_000,
        ).collect()
    ]
    want = _alerts_reference(
        vecs, snaps, C, dim, 150_000, 900_000, lambda i: i % n_snaps
    )
    assert sorted(got) == want


def test_drift_alerts_empty_snapshot_is_defined(spark):
    """A requested snapshot label with ZERO corpus rows must not divide
    by zero (ANSI throws) nor poison the streak with NULLs: every cell
    of the empty snapshot reports share 0, cell_vanished fires for
    cells populated at t-1, and no fired verdict is NULL (r13 review
    finding)."""
    from tdei_extract_load_service_spark.operators.similarity import (
        embedding_drift_alerts,
    )

    dim = 8
    vecs = {
        0: [1.0] + [0.0] * (dim - 1),
        1: [0.0, 1.0] + [0.0] * (dim - 2),
        2: [0.9, 0.1] + [0.0] * (dim - 2),
        # snapshot 1 (ids 10..19): EMPTY — no ids in range
        20: [0.8, 0.2] + [0.0] * (dim - 2),
    }
    pdf = pd.DataFrame(
        {"vec_id": list(vecs), "embedding": [vecs[k] for k in vecs]}
    )
    df = spark.createDataFrame(pdf)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = embedding_drift_alerts(
            df, "vec_id", "embedding",
            snapshot_of=lambda c: F.floor(c / 10),
            snapshots=[0, 1, 2],
            num_centroids=2, dim=dim,
        ).collect()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
    assert rows and all(r.fired is not None for r in rows)
    by = {(r.snapshot_id, r.centroid_id, r.rule): r for r in rows}
    # both cells populated at snap 0 vanish at the empty snap 1
    assert by[(1, 0, "cell_vanished")].fired
    assert by[(1, 1, "cell_vanished")].fired
    # shares at the empty snapshot are 0, so the swing vs snap 0 is
    # snap 0's full share
    assert by[(1, 0, "share_swing")].metric_fp > 0


def test_drift_alerts_stored_equals_inline(spark):
    """The stored-history serving path must be bit-identical to the
    inline operator (parquet round-trip of longs + round-9 doubles)."""
    from tdei_extract_load_service_spark.catalog import REGISTRY

    inline = sorted(
        tuple(r)
        for r in REGISTRY["embedding_drift_alert"].query(spark, SF_DIR).collect()
    )
    stored = sorted(
        tuple(r)
        for r in REGISTRY["embedding_drift_alert_stored"]
        .query(spark, SF_DIR)
        .collect()
    )
    assert stored == inline


def test_drift_history_grown_equals_rebuilt(spark, tmp_path):
    """The nightly-append property: a history grown snapshot-by-snapshot
    equals the full rebuild, because each (snapshot, cell) row depends
    only on its own snapshot's rows against the frozen model."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.similarity import (
        drift_history_stats,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    model = ivf_centroids(emb, "vec_id", "embedding", 16).collect()
    snap = lambda c: c % 4  # noqa: E731
    full = drift_history_stats(emb, "vec_id", "embedding", snap, model, 64)
    grown_path = str(tmp_path / "hist")
    for s in range(4):
        drift_history_stats(
            emb.where(F.col("vec_id") % 4 == s),
            "vec_id", "embedding", snap, model, 64,
        ).write.mode("append").partitionBy("_snap").parquet(grown_path)
    grown = spark.read.parquet(grown_path).select(
        F.col("_snap").cast("long"), "centroid_id", "n", "mean"
    )
    want = sorted(tuple(r) for r in full.collect())
    got = sorted(tuple(r) for r in grown.collect())
    assert got == want


# ---------------------------------------------------------------------------
# stream_dedup_incremental_shadow
# ---------------------------------------------------------------------------


def test_stream_dedup_equals_batch_recompute(spark):
    """The streamed survivor state must be bit-identical to
    dedup_exact_groups over the whole corpus — for a batch count that
    does NOT divide the corpus evenly (the associativity claim)."""
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_exact_groups,
    )
    from tdei_extract_load_service_spark.streaming.shadow import (
        dedup_incremental_shadow,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = sorted(
        tuple(r)
        for r in dedup_exact_groups(docs, "doc_id", ["text"]).collect()
    )
    got = sorted(
        tuple(r) for r in dedup_incremental_shadow(spark, SF_DIR, n_batches=3).collect()
    )
    assert got == want


def test_merge_survivor_states_associative(spark):
    """min/+ algebra: merging three splits in two different orders must
    equal the one-shot recompute."""
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_exact_groups,
        merge_survivor_states,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = [
        dedup_exact_groups(
            docs.where(F.col("doc_id") % 3 == i), "doc_id", ["text"]
        )
        for i in range(3)
    ]
    full = sorted(
        tuple(r)
        for r in dedup_exact_groups(docs, "doc_id", ["text"]).collect()
    )
    ab_c = merge_survivor_states(
        merge_survivor_states(parts[0], parts[1]), parts[2]
    )
    c_ba = merge_survivor_states(
        parts[2], merge_survivor_states(parts[1], parts[0])
    )
    assert sorted(tuple(r) for r in ab_c.collect()) == full
    assert sorted(tuple(r) for r in c_ba.collect()) == full


def test_dedup_merge_sink_replayed_batch_is_noop(spark, tmp_path):
    """Exactly-once: re-invoking the handler with an already-committed
    batch id must not change the table (the ledger no-op)."""
    from tdei_extract_load_service_spark.sinks.manifest import read_table
    from tdei_extract_load_service_spark.streaming.sink import (
        DEDUP_STATE_SCHEMA,
        dedup_merge_sink,
    )

    root = str(tmp_path / "dedup_root")
    handler = dedup_merge_sink(root, "dedup_state", "doc_id", ["text"])
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    handler(docs, 0)
    before = sorted(
        tuple(r)
        for r in read_table(
            spark, root, "dedup_state", schema=DEDUP_STATE_SCHEMA
        ).collect()
    )
    # replay batch 0 with DIFFERENT (corrupted) content: must be ignored
    handler(docs.withColumn("text", F.lit("poison")), 0)
    after = sorted(
        tuple(r)
        for r in read_table(
            spark, root, "dedup_state", schema=DEDUP_STATE_SCHEMA
        ).collect()
    )
    assert after == before
    # a NEW batch id does merge
    handler(docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000), 1)
    grown = read_table(
        spark, root, "dedup_state", schema=DEDUP_STATE_SCHEMA
    ).count()
    assert grown >= len(before)
