"""Dataset statistics recompute — the engine-internal replacement for the
``content.tdei_update_osw_stats`` stored procedure the reference calls
after every load (O19, extract-load-service.ts:326-336; the procedure body
lives in the DB, so per SURVEY.md §2.1 the contract is "aggregate
recomputation per dataset").

Pure Spark aggregation: map-side partials, one row per (dataset, kind) on
the shuffle — O(groups), not O(features), at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.sinks.writers import overwrite_by_key


def dataset_stats(features: DataFrame) -> DataFrame:
    """Per-(dataset, kind) statistics over transformed feature rows."""
    return features.groupBy("tdei_dataset_id", "kind").agg(
        F.count("*").alias("n_features"),
        F.countDistinct("entry").alias("n_files"),
        F.sum(
            F.when(F.col("feature").contains('"ext:elevation"'), 1).otherwise(0)
        ).alias("n_with_elevation"),
    )


def update_dataset_stats(features: DataFrame, warehouse: str) -> None:
    """Recompute and key-scoped-overwrite the stats table for the datasets
    present in ``features`` (the post-load hook shape of O19).

    Output is one row per (dataset, kind) — bounded by the kind taxonomy —
    so the write coalesces to one file instead of scattering a handful of
    rows across the full shuffle partitioning."""
    overwrite_by_key(
        dataset_stats(features).coalesce(1), os.path.join(warehouse, "dataset_stats")
    )
