"""Relational operator surface.

Re-expresses the reference's relational semantics — the
``DynamicQueryObject`` SQL builder (reference
``src/database/dynamic-query-object.ts:5-66``) plus the routing CASE
(``src/service/extract-load-service.ts:74-82``) and the stats aggregation it
delegates to Postgres (``:329-336``) — as native DataFrame transformations.
Where the reference concatenates SQL strings and lets Postgres plan them,
here Catalyst is the planner: filters and projections push down to the scan,
small join sides broadcast, aggregates get map-side partials automatically.

Scale notes per operator are inline; nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Pagination cap, ported from dynamic-query-object.ts:52.
MAX_PAGE_SIZE = 50


def project(df: DataFrame, columns: Sequence[str | Column]) -> DataFrame:
    """``SELECT c1, ..., cn`` — reference ``buildSelect``
    (dynamic-query-object.ts:30-32).

    Catalyst prunes unselected columns all the way into the parquet
    ``ReadSchema``, so a 2-column projection over a 16-column table reads
    2 columns' pages at any scale.
    """
    return df.select(*columns)


def filter_conjunctive(df: DataFrame, predicates: Sequence[Column]) -> DataFrame:
    """``WHERE p1 AND p2 AND ...`` — reference ``condition``/``buildWhere``
    (dynamic-query-object.ts:18-28,38-41).

    Each conjunct is a Column expression, so all of them reach
    ``PushedFilters`` on the parquet scan (row-group + page-level skipping).
    """
    if not predicates:
        return df
    return df.where(reduce(lambda a, b: a & b, predicates))


def route_case(
    df: DataFrame,
    source_col: str | Column,
    routes: Sequence[tuple[str, str]],
    default: str = "extension",
    output_col: str = "kind",
) -> DataFrame:
    """Multi-way substring CASE, first match wins.

    Port of the entry-path router (extract-load-service.ts:74-82): nested
    ternaries ``path.includes('nodes') ? 'nodes' : ...`` become one
    ``when/otherwise`` chain — a single JVM-side projection, fused into
    whole-stage codegen with neighbouring expressions (no shuffle, no UDF).

    ``routes`` is an *ordered* list of ``(substring, label)``.
    """
    col = F.col(source_col) if isinstance(source_col, str) else source_col
    expr: Column | None = None
    for substring, label in routes:
        cond = col.contains(substring)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    routed = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn(output_col, routed)


#: The reference's route table, in declaration order (first match wins).
OSW_ROUTES: tuple[tuple[str, str], ...] = (
    ("nodes", "nodes"),
    ("edges", "edges"),
    ("points", "points"),
    ("lines", "lines"),
    ("polygons", "polygons"),
    ("zones", "zones"),
)


def join_inner(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """Inner equi-join — reference ``buildInnerJoin``
    (dynamic-query-object.ts:34-36), which only supports same-named keys.

    ``broadcast_right=True`` forces a broadcast-hash join for dimension
    tables (region/nation/customer-scale sides): at 100 TB the fact side
    then never shuffles for the join. Without the hint Catalyst still
    auto-broadcasts under ``spark.sql.autoBroadcastJoinThreshold``, and AQE
    can convert sort-merge -> broadcast at runtime.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="inner")


def join_semi(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS semantics (``left_semi``).

    Models the reference's delete-by-key / reload membership checks
    (extract-load-service.ts:290-295) as a distributed semi-join: no columns
    from the right survive, so Spark ships only the join keys.
    """
    return left.join(right, on=on, how="left_semi")


def join_anti(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS semantics (``left_anti``) — the complement used by the
    idempotent-reload pattern (extract-load-service.ts:290-295)."""
    return left.join(right, on=on, how="left_anti")


def agg_group(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggregates: Sequence[Column],
) -> DataFrame:
    """Grouped aggregation — the engine-internal replacement for the
    ``content.tdei_update_osw_stats`` stored procedure the reference calls
    (extract-load-service.ts:329-336).

    Spark plans this as partial (map-side) + final aggregation, so the
    shuffle carries one partial row per (task, key), not one row per input
    row — the property that keeps per-dataset stats cheap at 100 TB.
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*key_cols).agg(*aggregates)


def sort(df: DataFrame, order_by: Sequence[Column]) -> DataFrame:
    """``ORDER BY`` — reference ``buildOrder`` (dynamic-query-object.ts:42-44)
    supports a single column; the engine generalizes to a key list.

    Spark executes this as a range-partitioned sample-based total sort —
    no single-node sort bottleneck.
    """
    return df.orderBy(*order_by)


def paginate(
    df: DataFrame,
    order_by: Sequence[Column],
    page_no: int = 1,
    page_size: int = 10,
) -> DataFrame:
    """LIMIT/OFFSET pagination — reference ``buildPagination``
    (dynamic-query-object.ts:45-58): defaults page 1 / size 10, page size
    hard-capped at 50, page/size floors of 1.

    An explicit total ``order_by`` (callers must include a unique tiebreak
    key) is required: LIMIT/OFFSET without a total order is nondeterministic
    on any parallel engine. OFFSET is driver-side skip of a prefix — fine
    for the reference's cap of 50 rows/page, never for deep paging at scale
    (use keyset pagination: ``WHERE key > last_seen ORDER BY key LIMIT n``).
    """
    page_no = max(int(page_no), 1)
    page_size = max(min(int(page_size), MAX_PAGE_SIZE), 1)
    return df.orderBy(*order_by).offset((page_no - 1) * page_size).limit(page_size)


def paginate_keyset(
    df: DataFrame,
    key: Column,
    after: object | None = None,
    page_size: int = 10,
) -> DataFrame:
    """Keyset (seek) pagination — the deep-paging upgrade over OFFSET
    (``paginate``): ``WHERE key > after ORDER BY key LIMIT n``.

    OFFSET must produce and discard every prior row (page 1e6 scans 1e7
    rows); keyset pushes the predicate into the scan (parquet min/max row
    groups skip, partition pruning applies) and plans
    ``TakeOrderedAndProject`` — page cost is O(page), independent of page
    depth. ``key`` must be unique (or a composite struct) for gap-free
    iteration; callers thread the last row's key as ``after``.
    """
    page_size = max(min(int(page_size), MAX_PAGE_SIZE), 1)
    out = df if after is None else df.where(key > F.lit(after))
    return out.orderBy(key.asc()).limit(page_size)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k. Spark plans ``TakeOrderedAndProject``: each task
    keeps a k-row heap and only k rows per partition reach the driver —
    the right top-k shape at any scale (north-star similarity search relies
    on this, SURVEY.md §2.4)."""
    return df.orderBy(*order_by).limit(k)


def unpivot_measures(
    df: DataFrame,
    id_cols: Sequence[str],
    measures: dict[str, str | Column],
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Wide -> long melt of several measure columns: one output row per
    (id row, measure), ``metric_col`` holding the measure's alias. Pure
    narrow projection (Spark ``unpivot`` / SQL ``stack``): no shuffle, no
    data movement — row count multiplies by |measures| but each output
    row carries only the id columns + one value, so this is how you feed
    per-metric pipelines without |measures| separate scans."""
    mcols = [
        (F.col(c) if isinstance(c, str) else c).alias(alias)
        for alias, c in measures.items()
    ]
    return df.unpivot(list(id_cols), mcols, metric_col, value_col)


def rolling_range_sum(
    df: DataFrame,
    partition_col: str,
    order_ts_col: str,
    value_col: str,
    preceding_seconds: int,
    alias: str = "rolling_sum",
) -> DataFrame:
    """VALUE-based rolling window: per partition, the sum of ``value_col``
    over rows whose timestamp lies within ``preceding_seconds`` before the
    current row's (inclusive) — RANGE frame over epoch seconds, distinct
    from ROWS frames (gaps and duplicate timestamps behave by VALUE
    distance, not row position).

    Scale shape: one shuffle on ``partition_col`` + an in-partition sort;
    frame evaluation is streaming within the sort (no per-row rescan).
    Skewed partitions (one giant customer) are the caller's salting
    concern, same as any keyed window."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(partition_col)
        .orderBy(F.unix_timestamp(order_ts_col))
        .rangeBetween(-preceding_seconds, 0)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))


def time_window_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    aggs: dict[str, Column],
    slide: str | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling (``slide`` omitted) or sliding time-window aggregation —
    the batch twin of the streaming windowed aggs (same ``F.window``
    semantics, no watermark needed on bounded input). Returns one row per
    (window, keys) with ``window_start``/``window_end`` timestamps plus
    the aggregate columns.

    Scale shape: ``F.window`` with a slide replicates each row into
    size/slide windows BEFORE the shuffle, but the exchange carries the
    aggregate-input columns only (the groupBy keys + agg operands), so a
    4x window fan-out is 4x the aggregate rows — not 4x the table."""
    w = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(*[c.alias(a) for a, c in aggs.items()])
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Interval UNION length per key — the sweep-line / gaps-and-islands
    composition behind uptime, SLA and session-coverage reporting:
    overlapping (and touching) intervals merge into islands, and the
    key's coverage is the summed island span, never double-counting
    overlap. Returns ``(key, n_intervals, n_islands, covered_s)``.

    Determinism: islands derive from a running ``max(end)`` over rows
    ordered by (start, end, id) — and the partition into islands is
    ORDER-INDEPENDENT under the tiebreak because equal-start intervals
    always overlap (end >= start), so a tie permutation can never flip
    a merge decision; both engines state the identical window. Spans
    are integer seconds (``timestampdiff`` / ``date_diff`` — timestamp
    DIFFERENCES are session-timezone-independent, unlike formatting).

    Spans are summed in MICROSECONDS (the timestamps' native unit, so
    elapsed == boundary count and DuckDB's boundary-crossing date_diff
    agrees with Spark's truncating timestampdiff — at SECOND
    granularity the two semantics diverge by 1 on any sub-second
    timestamp, caught by the oracle on first contact); the reported
    covered_s is the integer-divided total.

    Scale shape: ONE key-partitioned sort feeds both windows (the
    scd2_history single-exchange discipline), then two map-side-
    combinable aggregations (per-island, per-key). Nothing else
    shuffles; state per key is bounded by its interval count."""
    from pyspark.sql.window import Window

    key = F.col(key_col)
    order = [
        F.col(start_col).asc(),
        F.col(end_col).asc(),
        F.col(id_col).asc(),
    ]
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max = F.max(F.col(end_col)).over(w_prev)
    flag = F.when(
        prev_max.isNull() | (F.col(start_col) > prev_max), 1
    ).otherwise(0)
    islands = (
        df.withColumn("_island", F.sum(flag).over(w_run))
        .groupBy(key.alias("_key"), F.col("_island"))
        .agg(
            F.min(F.col(start_col)).alias("_s"),
            F.max(F.col(end_col)).alias("_e"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        islands.groupBy(F.col("_key").alias(key_col))
        .agg(
            F.sum("_n").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_islands"),
            F.expr(
                "sum(timestampdiff(MICROSECOND, _s, _e)) DIV 1000000"
            ).alias("covered_s"),
        )
        .orderBy(F.col(key_col).asc())
    )
