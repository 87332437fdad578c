"""Semantic tests for manifest-table compaction (sinks/compact.py)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def fragmented(spark, tmp_path):
    from tdei_extract_load_service_spark.sinks.manifest import ManifestTxn

    root = str(tmp_path / "wh")
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"v{i % 7}") for i in range(500)], columns=["k", "v"]
        )
    )
    txn = ManifestTxn(root)
    txn.write("t", df.repartition(32), "ds")
    txn.commit()
    return root


def test_compaction_reduces_files_and_preserves_rows(spark, fragmented):
    from tdei_extract_load_service_spark.sinks.compact import compact_table
    from tdei_extract_load_service_spark.sinks.manifest import read_table

    before = sorted(
        (r["k"], r["v"])
        for r in read_table(spark, fragmented, "t", dataset_id="ds").collect()
    )
    stats = compact_table(spark, fragmented, "t", "ds")
    assert stats["rows"] == 500
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1
    assert stats["txn"] == 2
    after = sorted(
        (r["k"], r["v"])
        for r in read_table(spark, fragmented, "t", dataset_id="ds").collect()
    )
    assert after == before


def test_compaction_respects_target_file_sizing(spark, fragmented):
    from tdei_extract_load_service_spark.sinks.compact import compact_table

    stats = compact_table(
        spark, fragmented, "t", "ds", target_rows_per_file=100
    )
    assert stats["files_after"] == 5  # ceil(500/100)


def test_missing_table_raises(spark, fragmented):
    from tdei_extract_load_service_spark.sinks.compact import compact_table

    with pytest.raises(ValueError):
        compact_table(spark, fragmented, "nope", "ds")
