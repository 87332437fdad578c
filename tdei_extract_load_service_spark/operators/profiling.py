"""Column-profiling primitives (VERDICT r4 cleanup: query bodies that
stabilized in the catalog move here as reusable operators).

``fixed_width_histogram`` is the one-pass profiling aggregation behind
every column-stats pass: bin assignment is pure arithmetic (floor +
least), so there is no two-pass min/max scan and no driver-side model —
one map-side-combined aggregation, |bins| result rows. Data-dependent
ranges compose by bolting collected bounds (e.g. from the quantiles
operator) onto the same shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fixed_width_histogram(
    df: DataFrame,
    value_col: str | Column,
    bin_width: float,
    n_bins: int,
    lo: float = 0.0,
) -> DataFrame:
    """Fixed-width histogram of ``value_col``: ``n_bins`` bins of
    ``bin_width`` starting at ``lo``, the last bin open-ended (values
    past the top clamp into it, values below ``lo`` clamp into bin 0).

    Returns ``(bin, bin_lo, n, total)`` with ``total`` the per-bin sum of
    the raw value (rounded to 2 for cross-engine display stability).

    Scale shape: single hash aggregation with map-side partial combine —
    the shuffle carries at most ``n_bins`` rows per map task regardless of
    input size. No collect, no second pass.
    """
    v = _col(value_col)
    bin_col = (
        F.greatest(
            F.least(F.floor((v - F.lit(lo)) / bin_width), F.lit(n_bins - 1)),
            F.lit(0),
        ).cast("bigint")
    )
    return (
        df.select(bin_col.alias("bin"), v.alias("_v"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.round(F.sum("_v"), 2).alias("total"))
        .select(
            "bin",
            (F.col("bin") * bin_width + lo).cast("double").alias("bin_lo"),
            "n",
            "total",
        )
    )
