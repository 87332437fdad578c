"""Range (interval-containment) join — points joined to the intervals that
contain them, without a cross join.

Spark has no native range-join operator (Databricks' range-join hint is a
proprietary extension); the open-source-safe formulation is bucketization:

- each interval explodes to the fixed-width buckets it overlaps;
- each point maps to exactly ONE bucket;
- an equi-join on the bucket id meets every qualifying (point, interval)
  pair exactly once (the point's bucket is unique, and an interval covers
  any bucket at most once — no post-join dedup needed);
- the exact ``lo <= p < hi`` predicate filters residual false candidates
  inside the join.

Scale shape: the shuffle is an equi-join keyed on bucket id; work is
proportional to points + Σ interval-spans, never |points| x |intervals|.
Pick ``bucket_width`` near the median interval length: wider -> fewer
interval replicas but more residual false candidates; narrower -> the
reverse. Long-tail intervals that span many buckets amplify their
replication — cap them (split at a max length) or rely on AQE skew-join
splitting for hot buckets.

Derived from the reference's declared relational surface (SURVEY.md §2.2 —
joins delegated to Postgres, where BETWEEN joins are planned as nested
loops); this is the distributed-safe equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (hi exclusive). Numeric columns (use epoch
    micros for timestamps). Returns the joined frame with all columns of
    both inputs.

    ``how`` accepts the point-preserving joins only (inner / left /
    left_semi / left_anti): the exact range predicate is part of the JOIN
    CONDITION, so a left join null-extends points with no containing
    interval exactly once. right/full are rejected — the interval side is
    replicated per bucket it spans, so an unmatched interval would emit
    one null-extended row per replica, which is not the semantics anyone
    wants from this operator.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    allowed = {"inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"bucketed_range_join supports {sorted(allowed)}; '{how}' would emit "
            "one row per bucket replica of an unmatched interval"
        )
    p = points.withColumn("_pbucket", F.floor(_col(point_col) / bucket_width))
    # hi is exclusive: an interval ending exactly on a bucket boundary does
    # not cover that next bucket, hence the -1
    iv = intervals.withColumn(
        "_ibucket",
        F.explode(
            F.sequence(
                F.floor(_col(lo_col) / bucket_width),
                F.floor((_col(hi_col) - 1) / bucket_width),
            )
        ),
    )
    cond = (
        (F.col("_pbucket") == F.col("_ibucket"))
        & (_col(point_col) >= _col(lo_col))
        & (_col(point_col) < _col(hi_col))
    )
    return p.join(iv, cond, how).drop("_pbucket", "_ibucket")
