"""Skew-mitigation utilities.

AQE (on by default in session.py) splits skewed *join* partitions at
runtime, but heavily-skewed **aggregations** — a handful of keys holding
most rows, e.g. one giant dataset id among thousands, one hot shingle —
still funnel each hot key through a single reducer. Classic fix: salt the
key, aggregate twice.

Two-phase shape: ``groupBy(key, salt) -> partial aggs`` (hot key now spread
over ``n_salts`` reducers) then ``groupBy(key) -> merge partials``. Works
for any algebraic aggregate (sum/count/min/max and their compositions);
use it when one key exceeds what a single task should hold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn, partial_expr) pairs for the algebraic aggregates supported.
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggregates: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggregates`` maps output name -> (kind, input expression) with kind in
    {sum, count, min, max}. Example::

        salted_agg(df, ["dataset_id"], {
            "n":       ("count", F.lit(1)),
            "qty":     ("sum",   F.col("quantity")),
            "max_ts":  ("max",   F.col("ts")),
        })

    Phase 1 shuffles on (key, salt): a key with 10^9 rows lands on
    ``n_salts`` reducers instead of one. Phase 2 shuffles ``n_salts`` tiny
    partial rows per key. Results are identical to a direct groupBy.
    """
    for name, (kind, _) in aggregates.items():
        if kind not in _MERGES:
            raise ValueError(f"unsupported aggregate kind {kind!r} for {name!r}")
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial_exprs = []
    for name, (kind, expr) in aggregates.items():
        partial = F.count(expr) if kind == "count" else getattr(F, kind)(expr)
        partial_exprs.append(partial.alias(f"_p_{name}"))
    partials = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    merge_exprs = [
        _MERGES[kind](F.col(f"_p_{name}")).alias(name)
        for name, (kind, _) in aggregates.items()
    ]
    return partials.groupBy(*keys).agg(*merge_exprs)
