"""Write-audit-publish gate (sinks/manifest.write_audit_publish):
expectations audited against the STAGED files decide the pointer swap."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v"]), schema="k long, v double"
    )


RULES = [
    {"rule": "k_unique", "kind": "unique", "col": "k"},
    {"rule": "v_range", "kind": "between", "col": "v", "lo": 0, "hi": 100},
    {"rule": "rows", "kind": "row_count_between", "lo": 1, "hi": 1000},
]


def test_wap_publishes_clean_data(spark):
    from tdei_extract_load_service_spark.sinks.manifest import (
        read_table,
        write_audit_publish,
    )

    root = tempfile.mkdtemp(prefix="wap_test_")
    report = write_audit_publish(
        root, "t", _df(spark, [(1, 10.0), (2, 20.0)]), RULES
    )
    assert all(r["passed"] for r in report) and len(report) == 3
    assert read_table(spark, root, "t").count() == 2


def test_wap_rejects_and_reverts(spark):
    from tdei_extract_load_service_spark.errors import ExpectationFailedError
    from tdei_extract_load_service_spark.sinks.manifest import (
        read_manifest,
        read_table,
        write_audit_publish,
    )

    root = tempfile.mkdtemp(prefix="wap_test_")
    write_audit_publish(root, "t", _df(spark, [(1, 10.0)]), RULES, "good")
    txn_before = read_manifest(root)["txn"]
    # duplicate key AND out-of-range value: both rules must be in .failed
    with pytest.raises(ExpectationFailedError) as exc:
        write_audit_publish(
            root, "t", _df(spark, [(7, 10.0), (7, 500.0)]), RULES, "bad"
        )
    assert sorted(r["rule"] for r in exc.value.failed) == [
        "k_unique", "v_range",
    ]
    # pointer untouched, previous version intact, staging reverted
    assert read_manifest(root)["txn"] == txn_before
    assert [r["k"] for r in read_table(spark, root, "t").collect()] == [1]
    leftovers = [
        d
        for d in os.listdir(os.path.join(root, "data", "t"))
        if d.startswith("bad")
    ]
    assert leftovers == []


def test_wap_supersede_replaces_snapshot(spark):
    from tdei_extract_load_service_spark.sinks.manifest import (
        read_manifest,
        read_table,
        write_audit_publish,
    )

    root = tempfile.mkdtemp(prefix="wap_test_")
    write_audit_publish(root, "t", _df(spark, [(1, 1.0)]), RULES, "v1")
    write_audit_publish(
        root, "t", _df(spark, [(2, 2.0)]), RULES, "v2", supersede=True
    )
    assert [r["k"] for r in read_table(spark, root, "t").collect()] == [2]
    assert list(read_manifest(root)["tables"]["t"]) == ["v2"]


def test_wap_audits_the_staged_files_not_the_plan(spark):
    """The audit reads back the parquet the txn wrote: a frame whose
    PLAN would pass but whose materialization differs must be judged on
    the materialization. Proxy assertion: the report's row_count metric
    equals the staged file's count (observed post-write), pinned by
    pointing the rule at an exact count."""
    from tdei_extract_load_service_spark.sinks.manifest import (
        write_audit_publish,
    )

    root = tempfile.mkdtemp(prefix="wap_test_")
    rules = [{"rule": "rows", "kind": "row_count_between", "lo": 3, "hi": 3}]
    report = write_audit_publish(
        root, "t", _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), rules
    )
    assert report[0]["metric_fp"] == 3
