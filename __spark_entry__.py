"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's operator catalog
(tdei_extract_load_service_spark/catalog.py) — one entry per implemented
operator from SURVEY.md §2.4, each with a DuckDB oracle twin where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tdei_extract_load_service_spark.catalog import REGISTRY, ordered_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["agg_group"].query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    production flagships sit inside the driver's 50-entry window
    (catalog.DRIVER_WINDOW); tail entries are oracle-twins / rows-only
    estimators still covered by tools/oracle_check.py."""
    return {name: entry_.query for name, entry_ in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: entry_.oracle
        for name, entry_ in ordered_registry().items()
        if entry_.oracle is not None
    }
