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

# Entries the north star cares most about — must always be driver-checked.
# r7 rotation (VERDICT r6 #3): the promoted round-6 entries take
# flagship status; the demoted shape-subsumed entries (text_ngram_topk,
# multimodal_audio, interval_join, unpivot, window_range_frame,
# histogram) hand it to their in-window siblings — histogram_auto runs
# the same binning agg plus the bounds pass, column_profile_categorical
# certifies the Expand/melt machinery, corpus_prep exercises
# fingerprint(), and the winnow pair (post-O(len^2)-fix) anchors the
# substring-dedup family.
FLAGSHIPS = [
    "dedup_lsh_verified",
    "quantiles",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "join_asof",
    "session_window",
    "grouped_normalize",
    "dedup_cluster",
    "etl_load_dataset",
    "similarity_ivf",
    "dedup_embedding_lsh",
    "join_range",
    "text_tfidf_topk",
    "text_pack_sequences",
    "embedding_quantize",
    "text_repetition_stats",
    "text_winnow_fingerprint",
    "dedup_winnow",
    "corpus_prep",
    "histogram_auto",
    "column_profile",
    "column_profile_categorical",
    "column_correlations",
    "multimodal_decode_jpeg",
    "multimodal_resize",
    "multimodal_video_frames",
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
