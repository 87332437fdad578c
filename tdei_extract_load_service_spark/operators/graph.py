"""Iterative graph algorithms on DataFrames.

The engine's only other graph shape is dedup_cluster's label
propagation (operators/dedup.py) — a fixpoint of MIN over neighbors.
PageRank is the weighted dual: a fixed number of damped mass-spreading
rounds, the canonical "iterative algorithm the engine must express as
a driver loop over declarative plans" (there is no relational fixpoint
operator in Spark; each iteration is one join + one aggregation, with
the frame persisted to truncate lineage so iteration k doesn't replan
iterations 1..k-1).

Cross-engine exactness (the DuckDB oracle unrolls the same
iterations): the recurrence runs in FIXED-POINT integers — ranks are
BIGINT multiples of 1e-12, per-edge contributions are integer DIV, the
damping multiply is ``(85 * s) DIV 100`` — so there is no float
anywhere in the loop and no rounding mode to disagree on. (The first
cut rounded doubles to 12 dp per iteration; Spark's ROUND and DuckDB's
ROUND disagree at shortest-repr-vs-exact-binary knife edges ~1e-12,
and three iterations amplified a handful of rows — fixed-point is the
reproducibility answer a 1000-executor rerun needs anyway.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list; for an
    undirected graph pass both orientations. Every node must have at
    least one out-edge (an undirected graph satisfies this for free) —
    dangling-mass redistribution is deliberately out of scope, so the
    caller owns that invariant.

    Returns ``(node, rank_fp)`` for every node — the rank as a BIGINT
    in units of 1e-12 (divide by 1e12 for the float; callers that
    compare across engines keep the integer).

    ``damping`` must be expressible in hundredths (0.85 -> 85/100): the
    damping multiply runs as integer ``(d100 * s) DIV 100``.

    Scale shape: out-degrees and the degree-annotated edge list are
    computed once and PERSISTED — repartitioned on the join key and
    sorted within partitions, so every iteration's sort-merge join
    consumes the cache with no exchange and no re-sort on the edge
    side; each iteration is one equi join of the rank frame onto the
    edges plus a map-side-combined aggregation to |nodes| rows,
    persisted and the predecessor released — lineage stays one
    iteration deep, so 30 iterations over 100 TB of edges never
    replans (or re-shuffles) round one. |nodes| is the only
    driver-side scalar (one COUNT)."""
    d100 = round(damping * 100)
    if abs(d100 / 100.0 - damping) > 1e-12:
        raise ValueError("damping must be a multiple of 0.01")
    deg = edges.groupBy(F.col(src).alias("_node")).agg(
        F.count("*").alias("_deg")
    )
    # Rebuilding ranks from the contribution agg alone would drop any
    # node with no in-edges after iteration 1 (and its outgoing mass
    # would silently stop spreading — ADVICE r8). Fix: ONE sentinel
    # self-edge per node with a 2^62 degree, unioned into the persisted
    # edge frame BEFORE the loop. Its contribution is exactly
    # ``_r DIV 2^62 = 0`` (ranks are bounded by ~1e12 fixed-point units,
    # 50 bits below the sentinel degree), so every node reaches the
    # aggregation every iteration at zero cost to the recurrence — and
    # the loop body stays the plain join+agg plan (the two rejected
    # fixes, a per-iteration left join and a per-iteration union,
    # measured +51% and +45% on the sf0.1 bench for identical
    # semantics).
    real = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .join(deg, F.col("_src") == F.col("_node"))
        .select("_src", "_dst", "_deg")
    )
    sentinel = deg.select(
        F.col("_node").alias("_src"),
        F.col("_node").alias("_dst"),
        F.lit(2**62).cast("long").alias("_deg"),
    )
    # The cache is REPARTITIONED ON THE JOIN KEY and sorted within
    # partitions before persisting: InMemoryRelation preserves both, so
    # every iteration's sort-merge join consumes ed with NO exchange and
    # NO re-sort on the edge side — only the (|nodes|-row) rank frame
    # moves per iteration, plus the contribution aggregation itself.
    # That is the shape a 30-iteration 100 TB run needs (the edge
    # shuffle happens once, not once per iteration), and on the r10
    # interleaved A/B it also tightened the sf0.1 medians
    # (3.91s vs 4.58s; the round-9 window-annotated alternative measured
    # SLOWER, 6.6s+, and was rejected — SCALE.md "pagerank r10 re-pin").
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    ed = (
        real.unionByName(sentinel)
        .repartition(n_part, F.col("_src"))
        .sortWithinPartitions("_src")
        .persist()
    )
    # ONE materializing job builds the whole working set; the node
    # count + the initial rank frame are then read back from ed's
    # CACHED sentinel rows — no second pass over the edge build.
    # (Persisting deg separately instead measured +1.2s at sf0.1: its
    # cache materialization is its own full job.)
    n = ed.where(F.col("_deg") == 2**62).count()
    unit = 1_000_000_000_000  # rank 1.0 == 1e12 fixed-point units
    base_fp = (100 - d100) * unit // 100 // n
    ranks = ed.where(F.col("_deg") == 2**62).select(
        F.col("_src").alias("_node"),
        F.lit(unit // n).cast("long").alias("_r"),
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["_src"] == ranks["_node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.expr("_r DIV _deg")).alias("_s"))
        )
        new_ranks = contrib.select(
            F.col("node").alias("_node"),
            (
                F.lit(base_fp) + F.expr(f"({d100} * _s) DIV 100")
            ).cast("long").alias("_r"),
        ).persist()
        new_ranks.count()  # materialize before releasing the predecessor
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select(
        F.col("_node").alias("node"), F.col("_r").alias("rank_fp")
    )
    ed.unpersist()
    # the FINAL iteration's rank frame must stay cached for the caller's
    # action, but a long session invoking pagerank repeatedly would leak
    # one generation per call — register it for recycling on the next call
    # (persist() on the already-persisted frame is a no-op)
    from tdei_extract_load_service_spark.session import persist_scoped

    persist_scoped(ranks, "graph.pagerank.final_ranks")
    return out
