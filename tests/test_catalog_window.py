"""Driver-window ordering guard (VERDICT r2 finding #1).

The correctness driver checks the first 50 entries of ``queries()`` in dict
order.  Round 2 silently lost driver rows for 11 flagships when new
registrations pushed them past the window.  These tests pin the window so
that can never happen again without a loud failure here.
"""

from __future__ import annotations

import importlib.util
import os

from tdei_extract_load_service_spark.catalog import DRIVER_WINDOW, REGISTRY, ordered_registry

# Entries that must always be driver-checked.  r14 rotation: the
# permanent core is the 20-op v1 engine contract (never rotated out),
# plus rule (a) — ALL 18 round-13 registrations, never driver-sampled —
# plus rule (b): the r13/r14-REWRITTEN hot paths, on VERDICT r13 #4's
# explicit instruction (their post-rewrite parity evidence was
# builder-run only; this window puts them in front of the driver).
# Everything rotated out stays swept by tools/oracle_check.py every
# round.  This list mirrors catalog.DRIVER_WINDOW deliberately: every
# rotation must edit BOTH (a silent window edit fails here loudly).
FLAGSHIPS = [
    # the 20-op v1 contract
    "scan",
    "project",
    "filter",
    "route_case",
    "join_inner",
    "join_semi",
    "join_anti",
    "agg_group",
    "agg_prefix_count",
    "sort",
    "paginate_keyset",
    "explode_unnest",
    "header_project",
    "strip_z",
    "extract_elevation",
    "normalize_ts",
    "dedup_exact",
    "topk_similarity",
    "text_quality",
    "etl_load_dataset",
    # rule (a): the 18 round-13 registrations (never driver-sampled)
    "embedding_drift_alert",
    "embedding_drift_alert_stored",
    "stream_dedup_incremental_shadow",
    "text_dsir_select",
    "anonymize_t_closeness",
    "similarity_mmr",
    "stream_drift_history_shadow",
    "text_bpe_train",
    "text_bpe_apply",
    "text_bpe_fertility",
    "embedding_outliers",
    "stream_bm25_index_shadow",
    "embedding_pca_power",
    "embedding_abtt_topk",
    "text_keywords",
    "events_interval_coverage",
    "text_dsir_resample",
    "dq_profile_diff",
    # rule (b): the r13/r14-rewritten hot paths (VERDICT r13 #4)
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_stored",
    "dedup_embedding_incremental",
    "dedup_simhash_exact",
    "merge_upsert",
    "graph_triangles",
    "ts_resample_ohlc",
    "join_asof_nearest",
    "embedding_knn_batch",
    "text_lm_score",
    "dedup_golden_record",
    "dedup_lsh_verified",
]


def test_window_is_exactly_50():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_names_all_registered():
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW references unregistered entries: {missing}"


def test_flagships_inside_window():
    out = [n for n in FLAGSHIPS if n not in DRIVER_WINDOW]
    assert not out, f"flagships outside the driver's 50-entry window: {out}"


def test_ordered_registry_prefix_is_window():
    ordered = list(ordered_registry())
    assert ordered[:50] == DRIVER_WINDOW
    assert set(ordered) == set(REGISTRY), "ordering must not drop or invent entries"


def test_entrypoint_exports_ordered_registry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries())
    assert names[:50] == DRIVER_WINDOW
    oracle = mod.oracle_sql()
    # every in-window entry should be hash-checked (oracle) unless it is a
    # deliberate rows-only estimator
    rows_only_allowed = {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "similarity_pq_trained",
        "column_distinct_sketch",
    }
    missing_oracle = [
        n for n in DRIVER_WINDOW if n in mod.queries() and n not in oracle and n not in rows_only_allowed
    ]
    # similarity_ivf_kmeans / multimodal_decode may be rows-only until their
    # oracle lands; tolerate but surface anything else.
    missing_oracle = [
        n for n in missing_oracle if n not in {"similarity_ivf_kmeans", "multimodal_decode"}
    ]
    assert not missing_oracle, f"in-window entries without an oracle: {missing_oracle}"
