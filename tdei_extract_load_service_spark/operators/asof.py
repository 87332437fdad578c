"""As-of join — for each left row, the most recent right row with
``right_ts <= left_ts`` within the same key (the point-in-time join Spark
lacks natively; absent from the reference too — SURVEY.md §2.3 joins row —
but core to event/training-data pipelines).

Implementation is the scalable union+window formulation, NOT a per-row
subquery or a range cross-join:

1. tag right rows and union them with left rows on (key, ts);
2. one window per key ordered by (ts, right-first, tiebreak) carries the
   latest right row forward as ONE struct (``last(when(_is_right,
   struct(...)), ignorenulls=True)``) — a single struct per direction so
   timestamp and payload always come from the SAME right row, even when
   that row holds NULL payload values (pandas ``merge_asof`` returns the
   matched row's NaN, never an older row's value);
3. keep only left rows and project the struct's fields.

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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Attach ``asof_<col>`` for each payload column to every left row —
    the matched right row's values under ``direction`` (the pandas
    ``merge_asof`` surface, re-expressed scale-first):

    - ``backward`` (default): latest right row at or before the left
      timestamp;
    - ``forward``: earliest right row at or after it;
    - ``nearest``: whichever of those two is closer in time, ties going
      backward (pandas' rule).

    Nulls when no qualifying right row exists (left-outer semantics).
    Ties among simultaneous right rows resolve to the largest payload
    tuple in BOTH directions (deterministic; the backward and forward
    carries therefore agree on a right row at exactly the left
    timestamp, so ``nearest`` is unambiguous there too).

    ``tolerance`` (optional Column/literal comparable to a timestamp
    difference, e.g. ``F.expr("INTERVAL 2 HOURS")``): a match farther
    than this from the left timestamp is nulled out. Applied per
    direction BEFORE the nearest pick — equivalent to the global rule
    because the per-direction candidate is already the minimum-distance
    one on its side.

    Scale shape: ONE shuffle on the key for every direction. backward/
    forward are one window sort each; nearest sorts the same partitioned
    data twice (asc + desc) inside the one exchange — never a per-row
    subquery, never a range cross-join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward or nearest")
    payload = list(right_payload)
    out_cols = [f"{ASOF_PREFIX}{c}" for c in payload]

    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(o) for c, o in zip(payload, out_cols)],
    )
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(payload, out_cols)],
        *[F.col(c) for c in left.columns],
    )
    for c in left.columns:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    carry_cols = ["_rts", *out_cols]

    def _carry(frame: DataFrame, tag: str, descending: bool) -> DataFrame:
        # at equal _ts the right row must be visible to the left row in
        # either scan direction (inclusive at-or-before / at-or-after),
        # and simultaneous right rows order by payload so last() —
        # the row nearest the current one — is the largest tuple.
        # ONE struct per direction: the when() is NULL exactly for left
        # rows, so ignorenulls skips those but never a right row with a
        # NULL payload field — the matched timestamp and every payload
        # column come from the same right row (the ADVICE r11 mixed-row
        # carry defect).
        w = (
            Window.partitionBy("_k")
            .orderBy(
                F.col("_ts").desc() if descending else F.col("_ts").asc(),
                F.col("_is_right").desc(),
                *[F.col(o).asc_nulls_first() for o in out_cols],
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return frame.select(
            "*",
            F.last(
                F.when(
                    F.col("_is_right") == 1,
                    F.struct(*[F.col(o).alias(o) for o in carry_cols]),
                ),
                ignorenulls=True,
            )
            .over(w)
            .alias(f"_{tag}_m"),
        ).select(
            "*",
            *[F.col(f"_{tag}_m.{o}").alias(f"_{tag}_{o}") for o in carry_cols],
        )

    def _tol_ok(tag: str) -> F.Column:
        matched = F.col(f"_{tag}__rts")
        if tolerance is None:
            return matched.isNotNull()
        dist = (
            F.col("_ts") - matched if tag == "b" else matched - F.col("_ts")
        )
        return matched.isNotNull() & (dist <= tolerance)

    if direction in ("backward", "forward"):
        tag = "b" if direction == "backward" else "f"
        carried = _carry(unioned, tag, descending=direction == "forward")
        keep = _tol_ok(tag)
        return carried.where(F.col("_is_right") == 0).select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(keep, F.col(f"_{tag}_{o}")).alias(o)
                for o in out_cols
            ],
        )

    carried = _carry(_carry(unioned, "b", False), "f", True)
    b_ok, f_ok = _tol_ok("b"), _tol_ok("f")
    # nearest: backward wins ties (pandas); a side outside tolerance or
    # with no row at all simply loses to the other
    b_dist = F.col("_ts") - F.col("_b__rts")
    f_dist = F.col("_f__rts") - F.col("_ts")
    use_b = b_ok & (~f_ok | (b_dist <= f_dist))
    return carried.where(F.col("_is_right") == 0).select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(use_b, F.col(f"_b_{o}"))
            .when(f_ok, F.col(f"_f_{o}"))
            .alias(o)
            for o in out_cols
        ],
    )
