"""Semantic tests for row-level CDC application (operators/cdc.py)."""

from __future__ import annotations

import pandas as pd
import pytest


def _apply(spark, snap_rows, chg_rows):
    from tdei_extract_load_service_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(
        pd.DataFrame(snap_rows, columns=["k", "name", "bal"])
    )
    chg = spark.createDataFrame(
        pd.DataFrame(chg_rows, columns=["k", "seq", "op", "bal"])
    )
    out = cdc_apply(snap, chg, "k", ("seq",), "op")
    return {r["k"]: (r["name"], r["bal"]) for r in out.collect()}


def test_upsert_delete_insert_passthrough(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        [(1, 1, "U", 11.0), (2, 1, "D", None), (4, 1, "U", 40.0)],
    )
    # 1 updated, 2 deleted, 3 untouched, 4 inserted (no snapshot name)
    assert got == {1: ("a", 11.0), 3: ("c", 30.0), 4: (None, 40.0)}


def test_latest_change_wins_by_sequence(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 3, "U", 33.0), (1, 1, "D", None), (1, 2, "U", 22.0)],
    )
    assert got == {1: ("a", 33.0)}  # seq 3 upsert outlives the seq 1 delete


def test_delete_then_reinsert_order(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 2, "D", None), (1, 1, "U", 11.0)],
    )
    assert got == {}  # latest is the delete


def test_null_payload_is_partial_update(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 1, "U", None)],
    )
    assert got == {1: ("a", 10.0)}  # NULL = no change, not set-to-NULL


def test_unknown_payload_column_rejected(spark):
    from tdei_extract_load_service_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(pd.DataFrame([(1, 1.0)], columns=["k", "bal"]))
    chg = spark.createDataFrame(
        pd.DataFrame([(1, 1, "U", 5.0)], columns=["k", "seq", "op", "extra"])
    )
    with pytest.raises(ValueError):
        cdc_apply(snap, chg, "k", ("seq",), "op")
