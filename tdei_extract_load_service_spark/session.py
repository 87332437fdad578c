"""SparkSession factory and fixture-table loading.

Replaces the reference's process bootstrap (``src/app.ts:42-61``,
``src/database/data-source.ts:14-31``): instead of an Express app + a
Postgres pool, the engine's runtime is one SparkSession.

Scale notes: shuffle partitions default to the local core count for tests
(not Spark's 200 default); on a real cluster callers pass
``shuffle_partitions ~= 2-3x total executor cores``. AQE is always on so
runtime statistics re-plan skewed joins and coalesce small shuffle
partitions — at 100 TB this is what absorbs per-key skew without manual
salting in the common case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: call-site scope -> the frame that invocation persisted (see
#: :func:`persist_scoped`)
_SCOPED_PERSISTS: dict[str, DataFrame] = {}


def persist_scoped(df: DataFrame, scope: str) -> DataFrame:
    """``df.persist()`` with per-call-site recycling.

    Operators whose RETURNED plan reads a persisted intermediate twice
    (fill_time_gaps' bucket frame, bm25_topk's postings, lm_bigram_score's
    tf, source_overlap's gram sets) cannot unpersist before returning —
    the caller's action is the consumer.  But never unpersisting leaks one
    cached frame per invocation into executor storage memory for the life
    of the session (ADVICE r8: a bench/catalog loop accumulates hundreds).
    This helper unpersists the frame the SAME call site persisted on its
    PREVIOUS invocation, bounding the accumulation at one generation per
    scope.  If a caller still holds the previous result un-materialized,
    its plan silently degrades to recomputation — correctness is
    unaffected (persist is only ever a performance hint)."""
    prev = _SCOPED_PERSISTS.pop(scope, None)
    if prev is not None:
        # CacheManager keys entries by ANALYZED PLAN, not by DataFrame
        # object: a repeated invocation with an identical plan (bench
        # reps, a re-run catalog query) SHARES the previous generation's
        # cache entry, and unpersisting "the old frame" would drop the
        # data the new frame is about to serve from — the next action
        # silently recomputed the whole lineage (measured 5s/rep on
        # graph_pagerank, r11). Only unpersist a genuinely different
        # predecessor plan.
        try:
            same = prev.sameSemantics(df)
        except Exception:  # noqa: BLE001 - session may already be gone
            same = False
        if not same:
            try:
                prev.unpersist()
            except Exception:  # noqa: BLE001
                pass
    out = df.persist()
    _SCOPED_PERSISTS[scope] = out
    return out


def get_spark(
    app_name: str = "tdei_extract_load_service_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    In ``local[N]`` mode there is a single JVM, so ``spark.driver.memory``
    is the only memory knob; on a cluster the same conf dict applies to
    executors via spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    # local-mode is ONE JVM whose heap defaults to 1g — i.e. ~13 MB of
    # execution memory per task at 32 concurrent tasks, which forbids any
    # per-partition hash build (a shuffled-hash join build OOMs on tens of
    # MB). 8g ~= 250 MB/task — still far leaner than a real 32-core
    # executor (which gets 64-128 GB), so plans proven here have headroom,
    # not the other way round. Takes effect only at JVM launch; ignored on
    # session reuse.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE size CACHED plans' output partitions by bytes too
        # (default false): every persisted loop frame (label propagation,
        # BPE vocab, LSH signature caches) otherwise materializes at the
        # full shuffle-partition count and each loop round re-scans that
        # many near-empty partitions. Byte-based and scale-adaptive — big
        # caches keep their parallelism; explicit repartitions
        # (session.spread, the r13 residual-join pins) are
        # REPARTITION_BY_NUM and stay exempt from coalescing. Interleaved
        # A/B at sf0.1 (r14): dedup_golden_record -0.47 s, text_bpe_train
        # -0.27 s, dedup_lsh_verified -0.15 s, corpus_prep_full -0.15 s,
        # nothing worse beyond host noise across 17 probed queries.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    # ANSI sweep hook: SPARK_GRAFT_ANSI=1 runs the whole engine under
    # spark.sql.ansi.enabled=true (strict out-of-bounds/overflow/cast
    # semantics) — the test suite must stay green both ways
    if os.environ.get("SPARK_GRAFT_ANSI"):
        builder = builder.config("spark.sql.ansi.enabled", "true")
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Logical-plan node CLASSES whose presence means the frame is (or sits
#: above) shuffle output — already distributed by
#: ``spark.sql.shuffle.partitions`` — or carries an explicit
#: caller-chosen partitioning (Repartition covers coalesce/repartition:
#: don't second-guess it). Matched against node class names from a real
#: plan-tree walk, NOT a substring scan of the plan's toString() (where a
#: column named "Window" or a literal containing "Join " would
#: misclassify the frame).
_SHUFFLED_PLAN_NODES = frozenset(
    {
        "Aggregate",
        "Join",
        "Window",
        "WindowGroupLimit",
        "Deduplicate",
        "DeduplicateWithinWatermark",
        "Repartition",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Sort",
        "Intersect",
        "Except",
        "Distinct",
        "GlobalLimit",
        "FlatMapGroupsInPandas",
        "CoGroup",
    }
)


def _has_shuffled_node(jplan) -> bool:
    """Walk the analyzed logical plan (py4j) checking node class names
    against the blocklist. Driver-side tree walk — no job runs."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName().removesuffix("$")
        if name in _SHUFFLED_PLAN_NODES:
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False


def _parquet_split_count(files: list[str], stop_at: int) -> int:
    """Count parquet row groups across ``files``, early-exiting at
    ``stop_at``. Row groups — not byte-range splits — are the real unit of
    scan parallelism: a byte range inside someone else's row group is a
    partition that emits zero rows. Unreadable/non-local files count as one
    split each (conservative: fewer splits → we repartition)."""
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return 0
    total = 0
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri.removeprefix("file:")
        try:
            total += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            total += 1
        if total >= stop_at:
            return total
    return total


def spread(
    df: DataFrame,
    factor: int = 1,
    well_partitioned: bool = False,
    key: str | list | None = None,
) -> DataFrame:
    """Round-robin repartition UP to the session's full parallelism —
    a no-op on input that demonstrably already has it.

    ``key`` (optional): name(s) of a HIGH-CARDINALITY column in ``df``.
    When given, the repartition hashes a deterministic synthetic key
    (``pmod(xxhash64(key), 100 * target)`` — the guide's deterministic
    replacement for keyless round-robin) instead of round-robin. This
    skips the local sort every keyless ``repartition(n)`` pays
    (``spark.sql.execution.sortBeforeRepartition``, needed so RETRIED
    map tasks reproduce row-to-partition assignment; a content-derived
    key is retry-stable by construction, so no sort is needed —
    measured 0.96s -> 0.55s on the 600k-row column_profile aggregation
    at sf0.1, the sort being single-threaded on a one-row-group scan).
    Only pass columns whose value diversity comfortably exceeds 100x
    the core count; low-cardinality keys would funnel partitions and
    round-robin stays the safe default. The key must also be
    (near-)non-null: ``xxhash64(NULL)`` is the seed constant, so every
    null-key row funnels into ONE partition — the exact skew the
    spread exists to avoid (ADVICE r13). Callers with nullable keys
    must keep round-robin or coalesce the null away first.

    Parquet scans can't split inside a row group, so a single-row-group
    file (the SF fixtures; any small-file corpus) pins every pre-shuffle
    operator to one task. Compute-heavy operators (shingling, MinHash
    signatures, vector math, document scoring) call this first: the
    repartition shuffle moves only the input rows once and unlocks all
    cores for the per-row work that dominates.

    Guard ladder (at 100 TB inputs have thousands of row groups and an
    unconditional ``repartition(defaultParallelism)`` would funnel them
    through a needless full shuffle):

    1. ``well_partitioned=True`` — caller's explicit opt-out, no probe.
    2. Frame contains a shuffle (agg/join/window/sort/... in the analyzed
       plan) — skip: it is already spread across shuffle partitions, and
       probing such a frame via ``df.rdd`` could eagerly execute upstream
       stages under AQE.
    3. Pure scan with >= target input FILES — skip: file boundaries alone
       give enough splits.
    4. Pure scan with few files — count actual parquet ROW GROUPS in their
       footers (driver-side metadata read, bounded by ``stop_at``). This is
       the honest gate: a giant single-row-group file reports >= target
       byte-range partitions while only one split emits rows, which is
       exactly the pathology spread exists to fix — partition count lies,
       footers don't.
    5. In-memory frames (no input files, no shuffle): fall back to the
       partition-count probe, which is safe there (no scan, no AQE stage).
    """
    if well_partitioned:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    try:
        if _has_shuffled_node(df._jdf.queryExecution().analyzed()):
            return df
    except Exception:  # pragma: no cover - py4j internals moved
        pass
    try:
        files = list(df.inputFiles())
    except Exception:
        files = []
    if files:
        if len(files) >= target:
            return df
        if _parquet_split_count(files, stop_at=target) >= target:
            return df
        return _spread_exchange(df, target, key)
    if df.rdd.getNumPartitions() >= target:
        return df
    return _spread_exchange(df, target, key)


def _spread_exchange(df: DataFrame, target: int, key) -> DataFrame:
    """The spread repartition itself: keyless round-robin by default,
    deterministic content-hash partitioning when ``key`` is given (see
    ``spread``)."""
    if key is None:
        return df.repartition(target)
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    synth = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(100 * target))
    return df.repartition(target, synth)


def sort_boundary(df: DataFrame, *key_cols: str) -> DataFrame:
    """Materialization boundary for a final global ``orderBy``: hash-
    repartition on the output sort keys immediately below the sort.

    A bare ``orderBy`` plans Exchange(rangepartitioning), whose
    RangePartitioner runs a SAMPLING job over the child RDD before the
    shuffle-map job — and under AQE both jobs re-execute everything above
    the last materialized stage. When the final stage holds the query's
    expensive work (a join residual, a window, a verify pass), that work
    runs TWICE (guide §2.4: duplicated subtrees). Interposing one hash
    exchange on the sort keys materializes the stage as shuffle files, so
    the sampling pass and the range shuffle both READ instead of
    recompute (measured: temporal_join 1.78 -> 1.30s at sf0.1).

    Cost/benefit at scale: one extra exchange of the OUTPUT rows. Worth
    it exactly when the final stage is more expensive than shuffling its
    output once — use for sorts over join/window/HOF stages; a plain
    ``orderBy`` stays right when the sort input is already behind its
    own exchange (a final aggregate) or trivially cheap. Partition count
    follows ``spark.sql.shuffle.partitions`` + AQE coalescing, so the
    boundary stays scale-adaptive."""
    from pyspark.sql import functions as F

    return df.repartition(*[F.col(k) for k in key_cols])


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the parquet fixture tables, optionally registering temp views.

    Column pruning + predicate pushdown reach the parquet scan because these
    are plain ``spark.read.parquet`` frames — no caching, no collect.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
