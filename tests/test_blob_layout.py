"""Blob-upload sink layout parity (storage-service.ts:13-19): the
``{year}/{month}/{project}/{record}`` folder scheme, month un-padded."""

from __future__ import annotations

import os

from tdei_extract_load_service_spark.sinks.writers import blob_upload_layout


def _mkdf(spark):
    return spark.createDataFrame(
        [
            ("pg-a", "rec-1", "2026-03-05 10:00:00", "payload-1"),
            ("pg-a", "rec-2", "2026-03-05 11:00:00", "payload-2"),
            ("pg-b", "rec-9", "2025-12-31 23:59:59", "payload-3"),
        ],
        "project_group_id string, record_id string, ts_raw string, body string",
    ).selectExpr("project_group_id", "record_id", "CAST(ts_raw AS TIMESTAMP) AS up_ts", "body")


def test_raw_layout_matches_reference_scheme(spark, tmp_path):
    base = str(tmp_path / "blob")
    blob_upload_layout(_mkdf(spark), base, ts_col="up_ts")
    # year/month/project/record with month NOT zero-padded (getMonth()+1)
    assert os.path.isdir(os.path.join(base, "2026", "3", "pg-a", "rec-1"))
    assert os.path.isdir(os.path.join(base, "2026", "3", "pg-a", "rec-2"))
    assert os.path.isdir(os.path.join(base, "2025", "12", "pg-b", "rec-9"))
    # no hive-style names survive anywhere in the tree
    for root, dirs, _ in os.walk(base):
        for d in dirs:
            assert "=" not in d, f"hive-style dir left behind: {root}/{d}"
    # leaf content is readable parquet with the data columns
    leaf = spark.read.parquet(os.path.join(base, "2026", "3", "pg-a", "rec-1"))
    assert [r.body for r in leaf.collect()] == ["payload-1"]


def test_hive_style_layout_keeps_partition_discovery(spark, tmp_path):
    base = str(tmp_path / "blob_hive")
    blob_upload_layout(_mkdf(spark), base, ts_col="up_ts", hive_style=True)
    assert os.path.isdir(os.path.join(base, "year=2026", "month=3"))
    back = spark.read.parquet(base)
    assert back.count() == 3
    assert back.where("project_group_id = 'pg-b' AND year = 2025").count() == 1
