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

# Entries that must always be driver-checked.  r8 rotation (VERDICT r7
# #1): the window saturated — 25 round-7 promotions plus rule-(b)
# re-certification debt exceeded 50 slots — so this round the permanent
# core is the 20-op v1 engine contract (the driver's correctness story,
# never rotated out) and every round-7 entry (certification debt paid in
# full).  The long-stable r6-era flagships (tpch_q1/q3/q5/q6, dedup
# family, profile/multimodal/quantiles) moved to the round-9
# re-certification queue: multi-round driver-green, still swept by
# tools/oracle_check.py every round, back in-window round 9.
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
    # round-7 certification debt (VERDICT r7 "What's missing" #5)
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q12_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    "embedding_pq_code",
    "similarity_pq",
    "similarity_pq_recall",
    "similarity_ivf_pq",
    "dedup_winnow_cluster",
    "text_contamination",
    "text_normalize",
    "text_chunk",
    "embedding_normalize",
    "corpus_prep_full",
    "text_token_budget_sample",
    "events_funnel",
    "events_retention",
    "events_retention_cohorts",
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
    rows_only_allowed = {"dedup_minhash_lsh", "dedup_simhash"}
    missing_oracle = [
        n for n in DRIVER_WINDOW if n in mod.queries() and n not in oracle and n not in rows_only_allowed
    ]
    # similarity_ivf_kmeans / multimodal_decode may be rows-only until their
    # oracle lands; tolerate but surface anything else.
    missing_oracle = [
        n for n in missing_oracle if n not in {"similarity_ivf_kmeans", "multimodal_decode"}
    ]
    assert not missing_oracle, f"in-window entries without an oracle: {missing_oracle}"
