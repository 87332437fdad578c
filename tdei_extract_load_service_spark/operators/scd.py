"""Slowly-changing-dimension history construction (gaps and islands).

The reference's sinks only ever hold the LATEST row per key
(overwrite_by_key / delete-by-key reload, sinks/writers.py — parity
with extract-load-service.ts's delete-then-reload). A warehouse that
wants to answer "what was this dimension's value WHEN the fact
happened" needs the historical form: SCD Type 2 validity intervals
reconstructed from the change stream. This module derives them
relationally — the gaps-and-islands shape (change detection via lag,
island ids via a running sum, interval close via lead) that none of the
other window entries exercise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change stream into SCD Type-2 validity intervals: one
    row per run of consecutive equal ``attr_col`` values per key, with
    ``valid_from`` (first observation of the run), ``valid_to`` (start
    of the next run; NULL = current), and ``n_obs`` (observations in
    the run).

    Ordering must be total per key or runs are nondeterministic:
    ``tiebreak_cols`` extends ``ts_col`` to a unique sort (pass the
    event/order primary key whenever timestamps can collide —
    asserted nowhere, but every catalog use does).

    Three windows, ONE partitioning: lag (change detection), running
    sum (island id), and the post-aggregation lead (interval close) all
    partition by the key — Catalyst plans a single hash exchange for
    the first two and one more for the lead over the collapsed (much
    smaller) frame. No joins, no self-reads of the fact: at 100 TB this
    is two shuffles, the second over one row per run.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.when(
        F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)), 0
    ).otherwise(1)
    runs = df.withColumn(
        "_island",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    collapsed = runs.groupBy(*keys, F.col("_island")).agg(
        # every row in an island carries the same attr value; min() keeps
        # the aggregation deterministic-by-construction (first() would
        # depend on intra-island arrival order)
        F.min(F.col(attr_col)).alias(attr_col),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count("*").alias("n_obs"),
    )
    # _island is monotone in the underlying (ts, tiebreak) order, and two
    # runs CAN share a valid_from (same-ts rows with different attrs), so
    # the interval-close ordering must include it or lead() ties are
    # nondeterministic (caught by the oracle on same-day status flips)
    w2 = Window.partitionBy(*keys).orderBy(
        F.col("valid_from").asc(), F.col("_island").asc()
    )
    return collapsed.select(
        *key_cols,
        attr_col,
        "valid_from",
        F.lead(F.col("valid_from")).over(w2).alias("valid_to"),
        "n_obs",
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts: Column | str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row joins the dimension VERSION
    whose ``[valid_from, valid_to)`` interval contains the fact's
    timestamp (``valid_to`` NULL = the open current version) — the
    companion consumer of :func:`scd2_intervals`, answering "what was
    the dimension's value WHEN the fact happened" instead of the
    latest-only answer the reference's overwrite_by_key sinks can give.

    The intervals produced by scd2_intervals partition each key's
    timeline from its first observation onward, so at most ONE version
    matches per fact; facts predating the key's first interval (or with
    no dimension key at all) drop under ``how='inner'`` and survive
    with NULL version columns under ``'left'``.

    Scale shape: an EQUI join on the key with the interval containment
    as a join residual — one hash exchange per side (or none, with both
    sides bucketed by key), never a range-only/cartesian plan. Version
    rows per key are few (runs, not observations), so the residual
    evaluates on a short per-key candidate list; skew follows the fact
    key distribution exactly like any fact-dim join (salt upstream if a
    key is pathological).
    """
    ts = F.col(fact_ts) if isinstance(fact_ts, str) else fact_ts
    f, d = facts.alias("f"), dim.alias("d")
    keys_eq = [f[k] == d[k] for k in key_cols]
    in_interval = (ts >= d[valid_from]) & (
        d[valid_to].isNull() | (ts < d[valid_to])
    )
    cond = keys_eq[0]
    for k in keys_eq[1:]:
        cond = cond & k
    dim_payload = [c for c in dim.columns if c not in key_cols]
    return f.join(d, cond & in_interval, how).select(
        *[f[c] for c in facts.columns],
        *[d[c] for c in dim_payload],
    )
