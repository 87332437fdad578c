"""Deterministic sampling for training-data pipelines.

``rand()``/``sampleBy`` draw from engine-specific RNG streams — a split
made that way is irreproducible across engines, re-runs with different
partitioning, and retries. Content-addressed (hash-based) sampling fixes
that: membership is a pure function of the row key and a seed string, so
the same row lands on the same side of the split everywhere, forever —
the property training/eval splits and A/B cohorts actually need.

Scale shape: a narrow ``where`` over a scan — no shuffle, no state; the
predicate pushes into the scan's filter stage and composes with column
pruning. (md5 is chosen over xxhash64 deliberately: both engines and the
DuckDB oracle compute identical digests, keeping the op verifiable.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: str | Column, buckets: int = 100, seed: str = "") -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of
    md5(key || seed) as an integer, mod buckets."""
    digest = F.md5(F.concat(_col(key).cast("string"), F.lit(seed)))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % buckets).cast(
        "int"
    )


def hash_sample(
    df: DataFrame, key_col: str | Column, percent: int, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ``percent``% of rows by key hash."""
    if not 0 <= percent <= 100:
        raise ValueError("percent must be in [0, 100]")
    return df.where(hash_bucket(key_col, 100, seed) < percent)


def hash_split(
    df: DataFrame, key_col: str | Column, percents: dict[str, int], seed: str = ""
) -> DataFrame:
    """Disjoint named splits (e.g. {'train': 90, 'eval': 5, 'test': 5}):
    adds a ``split`` column assigning each row by its hash bucket. The
    percents must sum to <= 100; rows beyond the sum get NULL (dropped
    from every split — a holdout)."""
    total = sum(percents.values())
    if total > 100 or any(p < 0 for p in percents.values()):
        raise ValueError("split percents must be >= 0 and sum to <= 100")
    bucket = hash_bucket(key_col, 100, seed)
    expr = F.lit(None).cast("string")
    lo = 0
    for name, p in percents.items():
        expr = F.when((bucket >= lo) & (bucket < lo + p), F.lit(name)).otherwise(expr)
        lo += p
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str | Column,
    strata_col: str | Column,
    rates: dict[str, int],
    default_percent: int = 0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    hash-rate (e.g. downsample the dominant language to 10% while keeping
    100% of the rare ones — the class-rebalancing move every training-mix
    pipeline makes). Strata missing from ``rates`` use ``default_percent``.

    Same scale shape as ``hash_sample``: membership is a pure row-local
    predicate (hash + CASE on the stratum value) — no shuffle, no
    per-group state, unlike ``sampleBy`` whose fractions draw from an
    engine-specific RNG."""
    if any(not 0 <= p <= 100 for p in rates.values()) or not 0 <= default_percent <= 100:
        raise ValueError("rates must be in [0, 100]")
    bucket = hash_bucket(key_col, 100, seed)
    threshold = F.lit(default_percent)
    for stratum, p in rates.items():
        threshold = F.when(_col(strata_col) == stratum, F.lit(p)).otherwise(threshold)
    return df.where(bucket < threshold)


def token_budget_sample(
    df: DataFrame,
    key_col: str | Column,
    strata_col: str | Column,
    tokens_col: str | Column,
    budget: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum token-budget sampling: keep documents,
    in content-addressed (md5) order, until each stratum's cumulative
    token count reaches ``budget`` — the "give me ~1B tokens per domain,
    reproducibly" primitive of training-mix construction. A document is
    kept iff the running total INCLUDING it is <= budget, so the sample
    never exceeds the budget and is a prefix of a stable shuffle: the
    same rows survive across engines, re-runs and retries, and growing
    the corpus only ever APPENDS candidates after the budget line
    (existing survivors keep surviving — cache-stable mixes).

    Adds ``cum_tokens`` (the running total including the row).

    Scale shape: ONE hash shuffle on the stratum plus the window's
    per-partition sort — exactly the partitioning a per-domain budget
    needs; no join, no global sort, no second pass. Skewed strata are
    bounded by the budget itself: the window scans a stratum's rows in
    order but every row after the budget line is filtered map-side
    post-window. (md5 ordering over xxhash64 for cross-engine
    verifiability, as with hash_bucket.)
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    from pyspark.sql import Window

    order_key = F.md5(F.concat(_col(key_col).cast("string"), F.lit(seed)))
    w = (
        Window.partitionBy(_col(strata_col))
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cum_tokens", F.sum(_col(tokens_col)).over(w)
    ).where(F.col("cum_tokens") <= budget)


def mix_budget_sample(
    df: DataFrame,
    key_col: str | Column,
    strata_col: str | Column,
    tokens_col: str | Column,
    weights: dict[str, float],
    total_budget: int,
    seed: str = "",
) -> DataFrame:
    """Training-mix construction: allocate ``total_budget`` tokens across
    strata by target ``weights`` (the "40% web, 30% code, 20% books, 10%
    wiki" recipe every pretraining run starts from), then keep each
    stratum's documents in content-addressed order until its allocation
    is filled. Strata absent from ``weights`` are dropped — the mix IS
    the allowlist. Per-stratum budgets are ``floor(weight / sum(weights)
    * total_budget)`` computed driver-side in exact integer arithmetic
    (micro-weight units), so the allocation is reproducible and
    auditable; the same cum <= budget prefix rule as
    ``token_budget_sample`` means a stratum whose corpus is smaller than
    its allocation keeps everything (under-filled, reported, never
    silently rebalanced — rebalancing belongs to the caller's policy
    loop, not the sampler).

    Adds ``cum_tokens`` and ``budget`` columns.

    Scale shape: identical to ``token_budget_sample`` — ONE hash shuffle
    on the stratum + per-partition sort, with the budget lookup a
    broadcast-free literal CASE map (bounded by |weights|, a query
    constant). At 100 TB the dominant-stratum window is the only heavy
    partition and it is bounded by its own budget line.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be >= 0 with a positive sum")
    from pyspark.sql import Window

    # exact integer allocation: scale weights to micro-units so the
    # per-stratum floor() is engine- and float-order-independent
    micro = {s: int(round(w * 1_000_000)) for s, w in weights.items()}
    underflow = [s for s, w in weights.items() if w > 0 and micro[s] == 0]
    if underflow:
        # a positive weight at or below ~5e-7 rounds to 0 micro-units
        # (banker's rounding sends exactly 5e-7 to 0 as well): its
        # stratum would silently get budget 0 (and if ALL weights are
        # that small, denom would be 0) despite passing the
        # positive-weight validation above — error loudly instead
        # (ADVICE r8); callers with genuinely tiny shares should rescale
        # their weight vector (only ratios matter)
        raise ValueError(
            "weights at or below ~5e-7 of the vector's scale round to a zero "
            f"micro-unit allocation: {sorted(underflow)}; rescale the "
            "weight vector (only relative weights matter)"
        )
    denom = sum(micro.values())
    budgets = {s: (m * total_budget) // denom for s, m in micro.items()}
    budget = F.lit(None).cast("bigint")
    for s, b in budgets.items():
        budget = F.when(_col(strata_col) == s, F.lit(b)).otherwise(budget)
    order_key = F.md5(F.concat(_col(key_col).cast("string"), F.lit(seed)))
    w = (
        Window.partitionBy(_col(strata_col))
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("budget", budget)
        .where(F.col("budget").isNotNull())
        .withColumn("cum_tokens", F.sum(_col(tokens_col)).over(w))
        .where(F.col("cum_tokens") <= F.col("budget"))
    )


def temperature_mix_sample(
    df: DataFrame,
    key_col: str | Column,
    strata_col: str | Column,
    tokens_col: str | Column,
    total_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled training mix: per-stratum budgets proportional
    to ``count^alpha`` — the standard pretraining rebalance that damps
    dominant sources without dropping rare ones (alpha=1 reproduces the
    corpus proportions, alpha->0 approaches uniform). Composes with
    ``mix_budget_sample``'s exact-integer allocation and prefix rule.

    ``alpha`` is restricted to {0.5, 1.0}: sqrt is IEEE
    correctly-rounded (bit-identical on Spark, DuckDB and Python, so the
    scaled weight ``floor(sqrt(cnt) * 1e6)`` is the same BIGINT
    everywhere), while a general ``pow`` is NOT correctly-rounded and
    would put a cross-engine knife edge inside the floor.

    Scale shape: one map-side-combined count aggregation collapses the
    corpus to |strata| rows collected driver-side (a model, not data);
    the sample itself is ``mix_budget_sample``'s single stratum-key
    window pass."""
    import math

    if alpha not in (0.5, 1.0):
        raise ValueError(
            "alpha must be 0.5 or 1.0 (IEEE-exact cross-engine scaling; "
            "general pow is not correctly rounded)"
        )
    counts = {
        r["_s"]: r["_c"]
        for r in df.groupBy(_col(strata_col).alias("_s"))
        .agg(F.count("*").alias("_c"))
        .collect()
    }
    if not counts:
        raise ValueError("temperature_mix_sample needs a non-empty input")
    scaled = {
        s: (
            int(math.floor(math.sqrt(c) * 1_000_000))
            if alpha == 0.5
            else c * 1_000_000
        )
        for s, c in counts.items()
    }
    # mix_budget_sample re-derives micro-units as round(w * 1e6), which
    # round-trips these integer-scaled weights exactly (v < 2^52)
    weights = {s: v / 1_000_000 for s, v in scaled.items()}
    return mix_budget_sample(
        df, key_col, strata_col, tokens_col, weights, total_budget
    )


def shard_assign(
    df: DataFrame,
    key_col: str | Column,
    n_shards: int,
    seed: str = "",
    with_position: bool = True,
) -> DataFrame:
    """Deterministic shuffled-shard layout — the LAST stage of every
    training-data pipeline: assign each row a shard in ``[0, n_shards)``
    by key hash and (optionally) its position within the shard under a
    pseudo-random but fully deterministic order, so a training job reads
    shard files whose within-file order is a seeded global shuffle that
    any engine can reproduce. Bumping ``seed`` per epoch yields a fresh
    global permutation — shard MEMBERSHIP moves too (the digest seeds
    both), which is exactly an epoch-level reshuffle; hold ``seed``
    fixed where stable shard composition matters (incremental appends).

    ``shard`` is the md5 bucket of the key (``hash_bucket`` machinery —
    hex-prefix parse, engine-portable); ``_shuffle_key`` is the full md5
    digest, and ``pos`` is the row_number within the shard ordered by
    (digest, key) — collision-proof total order.

    Scale shape: ONE hash exchange on ``shard`` serves both the window
    position and a ``write.partitionBy("shard")`` sink; the per-shard
    sort the window pays IS the deterministic within-file order the
    sink needs (``sortWithinPartitions`` would repeat it). With
    ``with_position=False`` the assignment is a pure projection — no
    shuffle at all (use when the sink sorts).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    clash = {"shard", "_shuffle_key"} | ({"pos"} if with_position else set())
    clash &= set(df.columns)
    if clash:
        raise ValueError(
            f"shard_assign writes columns {sorted(clash)} that already "
            "exist on the input — rename them first"
        )
    key = _col(key_col)
    digest = F.md5(F.concat(key.cast("string"), F.lit(seed)))
    out = df.withColumn("_shuffle_key", digest).withColumn(
        "shard",
        (
            F.conv(F.substring(F.col("_shuffle_key"), 1, 8), 16, 10).cast(
                "bigint"
            )
            % n_shards
        ).cast("int"),
    )
    if not with_position:
        return out.drop("_shuffle_key")
    w = Window.partitionBy("shard").orderBy(
        F.col("_shuffle_key").asc(), key.asc()
    )
    return out.withColumn("pos", F.row_number().over(w)).drop("_shuffle_key")
