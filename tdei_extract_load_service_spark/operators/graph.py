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
    computed once and PERSISTED (every iteration joins them); each
    iteration is one equi join of the rank frame onto the edges plus a
    map-side-combined aggregation to |nodes| rows, persisted and the
    predecessor released — lineage stays one iteration deep, so 30
    iterations over 100 TB of edges never replans round one. |nodes| is
    the only driver-side scalar (one COUNT)."""
    d100 = round(damping * 100)
    if abs(d100 / 100.0 - damping) > 1e-12:
        raise ValueError("damping must be a multiple of 0.01")
    deg = edges.groupBy(F.col(src).alias("_node")).agg(
        F.count("*").alias("_deg")
    )
    ed = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .join(deg, F.col("_src") == F.col("_node"))
        .select("_src", "_dst", "_deg")
        .persist()
    )
    # The |nodes|-row frame every iteration rebuilds ranks FROM: rebuilding
    # from the contribution agg alone drops any node with no in-edges after
    # iteration 1 (its outgoing mass silently stops spreading), so each
    # iteration unions a zero-contribution row per node INTO the
    # aggregation — every node keeps rank base_fp+ and keeps contributing.
    # (The union is a no-shuffle append absorbed by the groupBy that runs
    # anyway; the first fix — a per-iteration left join AFTER the agg —
    # measured +51% on the bench for the same semantics.)
    nodes = deg.select("_node").persist()
    n = nodes.count()
    unit = 1_000_000_000_000  # rank 1.0 == 1e12 fixed-point units
    base_fp = (100 - d100) * unit // 100 // n
    ranks = nodes.select(
        "_node", F.lit(unit // n).cast("long").alias("_r")
    )
    zero_rows = nodes.select(
        F.col("_node").alias("_cnode"), F.lit(0).cast("long").alias("_c")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["_src"] == ranks["_node"])
            .select(
                F.col("_dst").alias("_cnode"),
                F.expr("_r DIV _deg").alias("_c"),
            )
            .unionByName(zero_rows)
            .groupBy("_cnode")
            .agg(F.sum("_c").alias("_s"))
        )
        new_ranks = contrib.select(
            F.col("_cnode").alias("_node"),
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
    nodes.unpersist()
    # the FINAL iteration's rank frame must stay cached for the caller's
    # action, but a long session invoking pagerank repeatedly would leak
    # one generation per call — register it for recycling on the next call
    # (persist() on the already-persisted frame is a no-op)
    from tdei_extract_load_service_spark.session import persist_scoped

    persist_scoped(ranks, "graph.pagerank.final_ranks")
    return out
