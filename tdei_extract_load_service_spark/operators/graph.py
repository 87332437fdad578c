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
    src_partitioned: bool = False,
    broadcast_max_nodes: int = 2_000_000,
    materialize_every: int = 4,
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

    Scale shape (re-measured r11; the r10 form cost 4 edge-wide
    exchanges and one scheduled job PER iteration, 6.5s at sf0.1):

    - **Build = ONE edge exchange.** The edge list is hash-repartitioned
      on ``src`` once; ``HashPartitioning(src)`` satisfies the clustered
      distribution of everything downstream — the out-degree
      aggregation runs as chained in-partition HashAggregates and the
      degree join co-locates for free (deg is broadcast when its stats
      are small; either way, no further edge-wide exchange). Callers
      whose frame is ALREADY partitioned on ``src`` (they just ran
      ``repartition(n, src).dropDuplicates(...)``, or read a bucketed
      edge table) pass ``src_partitioned=True`` to skip even that one
      exchange — a pure performance hint: if the promise is wrong,
      Catalyst inserts the needed exchanges and results are unchanged.
    - **Loop joins are size-gated.** |nodes| is known driver-side (one
      COUNT, the same job that materializes the edge cache), so the
      rank-onto-edges join broadcasts the |nodes|-row frame when
      ``n <= broadcast_max_nodes`` (~50 MB of (long,long) rows at the
      default) — no exchange and no sort on EITHER side, per iteration
      just the map-side-combined contribution aggregation's |nodes|-row
      shuffle. Billion-node graphs exceed the gate and fall back to the
      r10 shape: the edge cache re-partitioned on the join key and
      sorted within partitions once, each iteration a sort-merge join
      that exchanges only the rank frame.
    - **Materialization is batched.** Iterations chain LAZILY —
      Catalyst pipelines ``materialize_every`` join+agg rounds into one
      scheduled job — and the rank frame is persisted (+ predecessor
      released) only at each batch boundary, so lineage stays bounded
      for a 30-iteration run without paying one job-scheduling
      round-trip per iteration. The FINAL rank frame is always
      persisted and materialized before the edge cache is released.
    |nodes| is the only driver-side scalar."""
    d100 = round(damping * 100)
    if abs(d100 / 100.0 - damping) > 1e-12:
        raise ValueError("damping must be a multiple of 0.01")
    if materialize_every < 1:
        raise ValueError("materialize_every must be >= 1")
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    if not src_partitioned:
        edges = edges.repartition(n_part, F.col(src))
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
    # ONE materializing job builds the whole working set; the node
    # count + the initial rank frame are then read back from ed's
    # CACHED sentinel rows — no second pass over the edge build.
    # (Persisting deg separately instead measured +1.2s at sf0.1: its
    # cache materialization is its own full job.)
    ed = real.unionByName(sentinel).persist()
    n = ed.where(F.col("_deg") == 2**62).count()
    smj = n > broadcast_max_nodes
    if smj:
        # billion-node fallback: pay one in-memory reshuffle to give the
        # per-iteration sort-merge join an exchange-free, pre-sorted
        # edge side (amortized over every iteration)
        ed_loop = (
            ed.repartition(n_part, F.col("_src"))
            .sortWithinPartitions("_src")
            .persist()
        )
        ed_loop.count()
        ed.unpersist()
    else:
        ed_loop = ed
    unit = 1_000_000_000_000  # rank 1.0 == 1e12 fixed-point units
    base_fp = (100 - d100) * unit // 100 // n
    ranks = ed_loop.where(F.col("_deg") == 2**62).select(
        F.col("_src").alias("_node"),
        F.lit(unit // n).cast("long").alias("_r"),
    )
    prev = None
    for i in range(iterations):
        rank_side = ranks if smj else F.broadcast(ranks)
        contrib = (
            ed_loop.join(rank_side, ed_loop["_src"] == rank_side["_node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.expr("_r DIV _deg")).alias("_s"))
        )
        ranks = contrib.select(
            F.col("node").alias("_node"),
            (
                F.lit(base_fp) + F.expr(f"({d100} * _s) DIV 100")
            ).cast("long").alias("_r"),
        )
        last = i == iterations - 1
        if last or (i + 1) % materialize_every == 0:
            ranks = ranks.persist()
            ranks.count()  # materialize before releasing the predecessor
            if prev is not None:
                prev.unpersist()
            prev = ranks
    out = ranks.select(
        F.col("_node").alias("node"), F.col("_r").alias("rank_fp")
    )
    ed_loop.unpersist()
    # the FINAL iteration's rank frame must stay cached for the caller's
    # action, but a long session invoking pagerank repeatedly would leak
    # one generation per call — register it for recycling on the next call
    # (persist() on the already-persisted frame is a no-op)
    from tdei_extract_load_service_spark.session import persist_scoped

    persist_scoped(ranks, "graph.pagerank.final_ranks")
    return out


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED edge list via
    degree-ordered edge orientation (Cohen 2009 / Suri-Vassilvitskii
    "Counting triangles and the curse of the last reducer", WWW'11 —
    the MapReduce-era result that made triangle counting shuffle-safe
    on power-law graphs).

    Input may carry either or both orientations, duplicates and
    self-loops; it is canonicalized first (u < v, distinct, loops
    dropped). Returns ``(node, n_triangles)`` for every node in at
    least one triangle.

    Scale shape — why orientation is the whole algorithm:

    - Each undirected edge is ORIENTED from its lower to its higher
      endpoint under the total order ``(degree, id)``. Every triangle
      then has exactly ONE wedge rooted at its minimum-order vertex, so
      each triangle is produced once, with no post-hoc dedup exchange.
    - Wedge volume is Σ out-degree², and orienting toward higher
      degree bounds every out-degree by O(√m) REGARDLESS of how skewed
      the raw degrees are — a celebrity node with 10M followers roots
      no wedges at all (its edges all point outward-in). Id-ordered
      orientation has no such bound; on this corpus it produces ~20%
      more wedges (measured, SCALE.md), and on a power-law web graph
      the gap is the difference between feasible and not.
    - The plan is three shuffles independent of triangle count: edge
      canonicalization (groupBy u,v), the wedge self-join on the shared
      root, and the closing-edge join on ``(y, z)`` — each keyed by
      small bigint pairs, never by adjacency lists, so no single
      reducer ever holds a hub's full neighborhood (the "curse of the
      last reducer" this orientation exists to avoid).

    The DuckDB oracle derives the same counts through the INDEPENDENT
    id-ordered formulation (a < b < c triple join) — orientation
    choice provably cannot change the triangle set, only the work.
    """
    u, v = F.col(src), F.col(dst)
    canon = (
        edges.where(u != v)
        .select(
            F.least(u, v).alias("u"),
            F.greatest(u, v).alias("v"),
        )
        .distinct()
    )
    from tdei_extract_load_service_spark.session import persist_scoped

    canon = persist_scoped(canon, "graph.triangles.canon")
    deg = persist_scoped(
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg")),
        "graph.triangles.deg",
    )
    # orient each edge toward the HIGHER (deg, id) endpoint. The degree
    # frame is |nodes|-sized — usually model-small next to edges, but a
    # billion-node graph must NOT be forced into executor memory, so the
    # broadcast is size-GATED exactly like pagerank's rank join (the
    # count is one cheap job over the already-persisted canon cache);
    # past the gate both attaches degrade to spillable shuffle joins
    n_nodes = deg.count()
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    if n_nodes <= broadcast_max_nodes:
        du, dv = F.broadcast(du), F.broadcast(dv)
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = persist_scoped(
        canon.join(du, "u").join(dv, "v").select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(lower_first, F.col("du")).otherwise(F.col("dv")).alias("dx"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dy"),
        ),
        "graph.triangles.oriented",
    )
    # wedges rooted at the minimum-order vertex: two out-edges of x,
    # ordered so (y, z) is itself an ORIENTED pair — the closing edge,
    # if present, is stored exactly as (y, z)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    y_before_z = (F.col("o1.dy") < F.col("o2.dy")) | (
        (F.col("o1.dy") == F.col("o2.dy")) & (F.col("o1.y") < F.col("o2.y"))
    )
    wedges = o1.join(o2, (F.col("o1.x") == F.col("o2.x")) & y_before_z).select(
        F.col("o1.x").alias("a"),
        F.col("o1.y").alias("b"),
        F.col("o2.y").alias("c"),
    )
    closing = oriented.select(F.col("x").alias("b"), F.col("y").alias("c"))
    triangles = wedges.join(closing, ["b", "c"], "left_semi")
    # each triangle credits all three corners: explode the corner array
    # instead of unioning three projections of ``triangles`` — Spark does
    # not dedup common subplans, so the union form re-ran the wedge join
    # + closing semi-join THREE times (one per branch; only canon/deg/
    # oriented sit behind caches)
    out = (
        triangles.select(
            F.explode(
                F.array(F.col("a"), F.col("b"), F.col("c"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return out
