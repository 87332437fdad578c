"""Regression tests for the four ADVICE r12 findings."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_filtered_run_never_records_sweep(capsys):
    """ADVICE r12 #1: a run filtered to specific queries must not write
    the sweep artifact (it would clobber a full-sweep mode record)."""
    from oracle_check import sweep_destination

    path, mode = sweep_destination("SWEEP.json", {"scan"}, {})
    assert path is None and mode == "default"
    assert "NOT recorded" in capsys.readouterr().out
    # unfiltered full sweep records normally
    path, mode = sweep_destination("SWEEP.json", set(), {})
    assert path == "SWEEP.json" and mode == "default"


def test_both_mode_envs_is_an_error_not_a_silent_pick():
    """ADVICE r12 #4: VANILLA+ANSI simultaneously set must die loudly
    instead of recording under 'vanilla'."""
    from oracle_check import sweep_destination

    with pytest.raises(SystemExit, match="both set"):
        sweep_destination(
            "SWEEP.json",
            set(),
            {"SPARK_GRAFT_VANILLA": "1", "SPARK_GRAFT_ANSI": "1"},
        )
    # single modes resolve to their own key
    assert sweep_destination(None, set(), {"SPARK_GRAFT_ANSI": "1"})[1] == "ansi"
    assert (
        sweep_destination(None, set(), {"SPARK_GRAFT_VANILLA": "1"})[1]
        == "vanilla"
    )


def test_bloom_bitmap_broadcast_reused_per_identity(spark):
    """ADVICE r12 #2: repeated probes of the SAME bitmap must reuse one
    broadcast (no per-call leak); a different bitmap gets its own; the
    cache is capped."""
    import numpy as np

    from tdei_extract_load_service_spark.operators import dedup as D

    sc = spark.sparkContext
    D._BLOOM_BCAST_CACHE.clear()
    arr = np.arange(8, dtype=np.int64)
    b1 = D._bloom_bitmap_broadcast(sc, arr)
    b2 = D._bloom_bitmap_broadcast(sc, np.arange(8, dtype=np.int64))
    assert b1 is b2, "same bitmap content must reuse the broadcast"
    b3 = D._bloom_bitmap_broadcast(sc, np.arange(9, dtype=np.int64))
    assert b3 is not b1
    # cap: inserting past the max evicts the least-recently-used
    for i in range(D._BLOOM_BCAST_CACHE_MAX + 1):
        D._bloom_bitmap_broadcast(sc, np.full(4, i, dtype=np.int64))
    assert len(D._BLOOM_BCAST_CACHE) <= D._BLOOM_BCAST_CACHE_MAX
    D._BLOOM_BCAST_CACHE.clear()


def test_audio_envelope_hash_low_bit_packing(spark):
    """ADVICE r12 #3: for windows < 64 the bits occupy the LOW `windows`
    bits (window 0 at bit windows-1) and the value is non-negative —
    the docstring now says exactly that; pin the behavior."""
    from tdei_extract_load_service_spark.multimodal.binary_ops import (
        audio_envelope_hash,
        synth_wav,
    )

    media = synth_wav(spark.range(3).selectExpr("id AS media_id"))
    rows = audio_envelope_hash(media, windows=8).collect()
    assert rows and all(r["decoded"] for r in rows)
    for r in rows:
        assert 0 <= r["ehash"] < (1 << 8), (
            "windows=8 must land in the low 8 bits, non-negative"
        )
