"""Sketch-based grouped quantiles with rank-error-bound verification.

The 100 TB default for percentiles: ``approx_percentile``
(Greenwald-Khanna) keeps O(accuracy * log n) state per group instead of
buffering every value the way exact ``percentile`` does (reference
capability: stats aggregation, src/service/stats-service analogue; the
exact interpolated twin lives in the catalog as ``quantiles_exact``).

Verification is a second map-side-combined pass: for each returned
quantile v the exact rank interval [count(x < v)+1, count(x <= v)] must
intersect [(p-eps)*n, (p+eps)*n], eps = 1/accuracy — the GK guarantee
checked on the data itself, engine-independent.

How the per-group thresholds reach pass 2 is cardinality-dependent:

- |groups| <= ``broadcast_threshold``: inline CASE literals (no join at
  all; the thresholds ride the aggregate expressions).
- |groups| > ``broadcast_threshold``: a broadcast-joined threshold table.
  The CASE chain grows one WHEN branch per group per quantile, so a
  high-cardinality key would blow the codegen expression tree (Catalyst
  64KB method splits, minutes-long planning); k threshold rows are a
  bounded model either way, and a BroadcastHashJoin keeps the plan size
  O(1) in the group count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_quantiles_checked(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    accuracy: int = 1000,
    broadcast_threshold: int = 100,
) -> DataFrame:
    """Per-group approx quantiles + GK-bound verification flags.

    Returns one row per group: ``(group_col, n_rows, p{P}_ok ...)`` with a
    boolean per requested quantile. Both passes are narrow scans with
    partial (map-side) aggregation; the collected quantile values are a
    model of |groups| x |ps| floats, never data.

    Null policy (one behavior on BOTH code paths): rows with a null group
    key or a null value are excluded up front — a group whose values are
    all null has no quantiles to verify (approx_percentile returns NULL
    for it) and simply does not appear in the output, and null keys
    previously diverged between the CASE path (counted, check false) and
    the join path (silently dropped by the null-key inner join).
    """
    df = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    eps = 1.0 / accuracy
    approx = (
        df.groupBy(group_col)
        .agg(
            F.expr(
                f"approx_percentile({value_col}, array({', '.join(map(str, ps))}), {accuracy})"
            ).alias("qv")
        )
        .collect()
    )
    # defensive: after the null filter no group should yield a NULL
    # quantile array, but skip rather than TypeError if one does
    qv = {
        r[group_col]: [float(v) for v in r["qv"]]
        for r in approx
        if r["qv"] is not None and all(v is not None for v in r["qv"])
    }

    if len(qv) <= broadcast_threshold:
        # small-key path: thresholds as inline CASE literals — zero joins
        def thr(i: int) -> Column:
            c = F.lit(None).cast("double")
            for g, values in qv.items():
                c = F.when(F.col(group_col) == g, F.lit(values[i])).otherwise(c)
            return c

        scored = df
    else:
        # high-cardinality path: broadcast the (group, thresholds) model —
        # plan size stays O(1) in |groups|, the join build side is k rows
        spark = df.sparkSession
        group_field = next(f for f in df.schema.fields if f.name == group_col)
        schema = T.StructType(
            [group_field]
            + [T.StructField(f"_thr{i}", T.DoubleType()) for i in range(len(ps))]
        )
        thr_df = spark.createDataFrame(
            [(g, *values) for g, values in qv.items()], schema
        )
        scored = df.join(F.broadcast(thr_df), group_col)

        def thr(i: int) -> Column:
            return F.col(f"_thr{i}")

    checks = scored.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(F.col(value_col) < thr(i), 1).otherwise(0)).alias(f"lt{i}")
            for i in range(len(ps))
        ],
        *[
            F.sum(F.when(F.col(value_col) <= thr(i), 1).otherwise(0)).alias(f"le{i}")
            for i in range(len(ps))
        ],
    )

    def ok(i: int, p: float) -> Column:
        # GK guarantee: the returned element's rank is within eps*n of the
        # p-quantile target rank; +-1 absorbs the floor/ceil discretization
        # of the target (observed: GK sits exactly at the eps*n boundary).
        lo = F.ceil((F.lit(p) - F.lit(eps)) * F.col("n_rows")) - 1
        hi = F.ceil((F.lit(p) + F.lit(eps)) * F.col("n_rows")) + 1
        return ((F.col(f"lt{i}") + 1) <= hi) & (F.col(f"le{i}") >= lo)

    return checks.select(
        group_col,
        "n_rows",
        *[ok(i, p).alias(f"p{round(p * 100)}_ok") for i, p in enumerate(ps)],
    )
