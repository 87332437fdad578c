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

# Entries that must always be driver-checked.  r10 rotation (VERDICT r9
# #1): the permanent core is the 20-op v1 engine contract (never
# rotated out), plus ALL 21 entries with no green driver row in any
# round's CORRECTNESS ledger (the 9 r9 deferrals, the 7 r9 wave-4/5
# registrations, and 5 early-wave entries the r8 pre-commit
# undercounted), plus the oldest rule-(b) re-certification cohort
# (r2-certified, seven rounds stale).  The r9-certified flagships moved
# to the rule-(b) queue: driver-green last round, still swept by
# tools/oracle_check.py every round.
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
    # never-driver-certified rule-(a) debt (9 r9 deferrals)
    "similarity_pq_trained",
    "stream_dedup_shadow",
    "stream_session_shadow",
    "stream_join_shadow",
    "text_bm25_topk",
    "sample_split_grouped",
    "similarity_ivf_pq_incremental",
    "table_compact",
    "events_attribution",
    # never-driver-certified rule-(a) debt (7 r9 wave-4/5)
    "heavy_hitters",
    "join_size_estimate",
    "text_readability",
    "events_markov",
    "zorder_range_scan",
    "table_time_travel",
    "corpus_temperature_mix",
    # never-driver-certified rule-(a) debt (early waves, undercounted)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "column_distinct_sketch",
    "sample_stratified",
    "quantiles_exact",
    # oldest rule-(b) re-certification cohort (r2)
    "cube",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "distinct",
    "sample_split",
    "text_char_entropy",
    "top_k",
    "window_running_sum",
    "window_sliding",
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
