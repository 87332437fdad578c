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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_by: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join salting: replicate the small side ``n_salts`` times
    and scatter each big-side row to one replica, so a single hot join
    key spreads over ``n_salts`` reducers instead of funneling through
    one.

    When to reach for it: AQE's skew-join split (on in session.py)
    already rescues *sort-merge* joins by splitting oversized partitions
    at runtime, and tiny dims should simply broadcast. The gap this
    fills is the mid-size dimension — too big to broadcast, hot enough
    that a single key dominates — on plan shapes AQE won't split
    (shuffled-hash builds, streaming joins, or any stage where the skew
    only materializes after a UDF fan-out). The rewrite is
    semantics-preserving for ``inner`` and ``left`` regardless of how
    rows scatter: every big row still meets exactly one replica of each
    matching small row.

    The salt is ``pmod(xxhash64(salt_by), n_salts)`` — a deterministic
    row-local function of caller-named columns (the fact table's primary
    key), never ``rand()``: task retries and speculative duplicates
    must salt a row identically or a retried partition joins against a
    different replica than its speculative twin (harmless for inner
    joins but a divergence bomb for anything stateful downstream).
    ``salt_by`` must NOT be the join key itself — a hot key would hash
    to one salt and nothing spreads (asserted).

    Scale shape: small side shuffles ``n_salts`` copies (bounded:
    |small| * n_salts rows); big side shuffles once on (key, salt) —
    same volume as the plain join, one extra narrow column. The join
    output is identical to the unsalted join, so any downstream
    aggregation re-shuffles as it would have anyway."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    if set(salt_by) & set(on):
        raise ValueError("salt_by must be disjoint from the join key")
    replicas = small.withColumn(
        "_salt",
        F.explode(F.array([F.lit(i) for i in range(n_salts)])),
    )
    scattered = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    return scattered.join(replicas, [*on, "_salt"], how).drop("_salt")
