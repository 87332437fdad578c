"""As-of join — for each left row, the most recent right row with
``right_ts <= left_ts`` within the same key (the point-in-time join Spark
lacks natively; absent from the reference too — SURVEY.md §2.3 joins row —
but core to event/training-data pipelines).

Implementation is the scalable union+window formulation, NOT a per-row
subquery or a range cross-join:

1. tag right rows and union them with left rows on (key, ts);
2. one window per key ordered by (ts, right-first, tiebreak) carries the
   latest non-null right payload forward (``last(..., ignorenulls=True)``);
3. keep only left rows.

One shuffle on the key + one per-partition sort — O(n log n) per key at any
scale; skewed keys split by AQE. Right-before-left at equal timestamps
makes the join inclusive ("at or before").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: prefix of the attached right-payload columns in the output
ASOF_PREFIX = "asof_"


def join_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Attach ``asof_<col>`` for each payload column to every left row —
    the value of the latest right row at or before the left row's
    timestamp; nulls when no prior right row exists (left-outer
    semantics). Ties among simultaneous right rows resolve to the largest
    payload tuple (deterministic)."""
    payload = list(right_payload)
    out_cols = [f"{ASOF_PREFIX}{c}" for c in payload]

    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(o) for c, o in zip(payload, out_cols)],
    )
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(payload, out_cols)],
        *[F.col(c) for c in left.columns],
    )
    for c in left.columns:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_right").desc(),
            *[F.col(o).asc_nulls_first() for o in out_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_is_right") == 1, F.col(o)), ignorenulls=True)
            .over(w)
            .alias(f"_c_{o}")
            for o in out_cols
        ],
    )
    return carried.where(F.col("_is_right") == 0).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_c_{o}").alias(o) for o in out_cols],
    )
