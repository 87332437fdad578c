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

# Entries that must always be driver-checked.  r9 rotation (VERDICT r8
# #3): the permanent core is the 20-op v1 engine contract (the driver's
# correctness story, never rotated out), plus the FIVE entries that
# failed the driver hash in round 8 (they carry this round's
# oracle-canon fix and must re-certify), plus the never-sampled rule-(a)
# promotion queue.  The long-stable r7-era flagships (tpch wave 1+2,
# PQ family, text/corpus/events) moved to the round-10
# re-certification queue: multi-round driver-green, still swept by
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
    # round-8 driver failures re-certifying the round-9 canon fix
    "tpch_q12_priority_class",
    "embedding_pq_code",
    "embedding_normalize",
    "corpus_prep_full",
    "text_token_budget_sample",
    # never-driver-sampled rule-(a) promotions (VERDICT r8 #3)
    "tpch_q8_national_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "text_source_overlap",
    "stream_window_shadow",
    "text_bm25_topk_stored",
    "text_pii_scrub",
    "text_lm_score",
    "corpus_mix_sample",
    "join_skew_salted",
    "scd2_history",
    "cdc_apply",
    "events_anomaly",
    "incremental_agg",
    "temporal_join",
    "join_bucketed",
    "stream_sink_shadow",
    "ts_fill_gaps",
    "referential_audit",
    "join_fuzzy",
    "graph_pagerank",
    "window_percentiles",
    "key_skew_profile",
    "dedup_golden_record",
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
