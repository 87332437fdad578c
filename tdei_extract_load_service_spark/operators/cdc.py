"""Row-level change-data-capture application (MERGE semantics).

The reference's load path replaces state at TABLE granularity: delete
every row for the dataset key, then reload (O17,
sinks/writers.py:overwrite_by_key; extract-load-service.ts
delete-then-reload). A pipeline consuming an incremental feed needs the
row-level dual: fold a stream of keyed upserts/deletes into a snapshot,
latest change per key winning — Delta/Iceberg's MERGE INTO, derived
here relationally so it runs on plain parquet snapshots and is
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change feed to a snapshot, latest-wins per key.

    ``changes`` carries one row per change event: the key, a total
    per-key sequence (``seq_cols`` — pass (ts, event_id) so replays and
    out-of-order arrivals resolve deterministically; a ts alone is NOT
    total and the winner would be arrival-order nondeterministic), the
    op (``delete_op`` deletes the key; anything else upserts), and
    payload columns. The result is the snapshot with:

    - keys whose LATEST change is a delete: removed;
    - keys whose latest change is an upsert: payload columns replaced
      (keys new to the snapshot are inserted);
    - keys without changes: passed through unchanged.

    Payload columns are every non-key, non-seq, non-op column of
    ``changes``; they must be a subset of the snapshot's columns (the
    merge coalesces change payloads over snapshot values per column).
    A NULL in an upsert's payload column means "no change" for that
    column — partial updates, the Debezium-style sparse-field
    convention — NOT "set to NULL" (tombstone a whole key with the
    delete op instead).

    Scale shape: one window shuffle on the change feed's key (the feed
    is the small side — a day's changes, not the corpus), then ONE
    full-outer hash join against the snapshot; deletes ride the same
    joined frame as a filter instead of a second anti-join pass. At
    100 TB the snapshot never shuffles twice, and with both sides
    bucketed by key the join is shuffle-free.
    """
    seq = [F.col(c).desc() for c in seq_cols]
    w = Window.partitionBy(F.col(key_col)).orderBy(*seq)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", *[c for c in seq_cols if c != key_col])
    )
    payload = [c for c in latest.columns if c not in (key_col, op_col)]
    missing = [c for c in payload if c not in snapshot.columns]
    if missing:
        raise ValueError(f"change payload columns absent from snapshot: {missing}")
    snap = snapshot.alias("s")
    chg = latest.alias("c")
    joined = snap.join(chg, F.col(f"s.{key_col}") == F.col(f"c.{key_col}"), "full_outer")
    is_delete = F.col(f"c.{op_col}") == delete_op
    out_cols = [
        F.coalesce(F.col(f"s.{key_col}"), F.col(f"c.{key_col}")).alias(key_col)
    ]
    for c in snapshot.columns:
        if c == key_col:
            continue
        if c in payload:
            out_cols.append(F.coalesce(F.col(f"c.{c}"), F.col(f"s.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"s.{c}").alias(c))
    return joined.where(is_delete.isNull() | ~is_delete).select(*out_cols)


def table_changes(
    v_from: DataFrame,
    v_to: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "change_op",
) -> DataFrame:
    """Derive the row-level CHANGE FEED between two snapshots of a
    keyed table — the inverse of :func:`cdc_apply` (which folds a feed
    into a snapshot) and the Delta/Iceberg ``table_changes``/CDF
    contract computed relationally over plain parquet versions (read
    them via ``sinks.manifest.read_table_at``): one row per key whose
    state differs, with op ``insert`` (key only in ``v_to``),
    ``delete`` (only in ``v_from``) or ``update`` (present in both with
    any non-key column differing, null-safe compare), carrying full
    before/after images per non-key column. Identical rows are absent
    — a no-op diff is empty.

    Preconditions: both snapshots share a schema, and key columns are
    non-null (presence on a side is detected by the key's null-ness in
    the full-outer join — the same convention ``cdc_apply`` uses).

    Scale shape: ONE full-outer join keyed on the key columns and
    nothing else — no window, no second pass; with both versions
    bucketed by key (``sinks/writers`` bucketed layout) the join plans
    zero-exchange, which is the nightly-diff shape for a 100 TB table:
    the diff costs the co-located merge, not a recompute."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty (else the diff "
                         "degenerates to a cross join)")
    if set(v_from.columns) != set(v_to.columns):
        raise ValueError(
            "snapshots must share a schema: "
            f"{sorted(v_from.columns)} vs {sorted(v_to.columns)}"
        )
    compare = [c for c in v_from.columns if c not in key_cols]
    a, b = v_from.alias("a"), v_to.alias("b")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    joined = a.join(b, cond, "full_outer")
    in_from = F.col(f"a.{key_cols[0]}").isNotNull()
    in_to = F.col(f"b.{key_cols[0]}").isNotNull()
    differs = F.lit(False)
    for c in compare:
        differs = differs | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    kept = joined.where(~in_from | ~in_to | differs)
    image_cols = []
    for c in compare:
        image_cols.append(F.col(f"a.{c}").alias(f"{c}_before"))
        image_cols.append(F.col(f"b.{c}").alias(f"{c}_after"))
    return kept.select(
        *[
            F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k)
            for k in key_cols
        ],
        F.when(~in_from, F.lit("insert"))
        .when(~in_to, F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias(op_col),
        *image_cols,
    )


def incremental_agg_maintain(
    base_aggs: DataFrame,
    changes: DataFrame,
    group_col: str,
    n_col: str,
    sum_col: str,
    before_group: str,
    before_value: str,
    after_group: str,
    after_value: str,
) -> DataFrame:
    """Incremental maintenance of per-group (COUNT, SUM) aggregates —
    the materialized-view dual of :func:`cdc_apply`: fold a change feed
    carrying before/after images (the Debezium envelope shape) into a
    stored aggregate table WITHOUT rescanning the base relation. At
    100 TB this is the whole point of keeping the aggregate: the feed
    is a day's changes and the stored aggregate is |groups| rows; the
    base table is never touched.

    ``changes`` carries at most one row per key (fold the feed with a
    latest-wins window first) with four image columns:

    - ``before_group`` / ``before_value``: the row's old state, NULL
      for inserts (key absent from the base);
    - ``after_group`` / ``after_value``: the new state, NULL for
      deletes.

    Each change contributes the textbook IVM delta: ``(-1,
    -before_value)`` to its old group and ``(+1, +after_value)`` to its
    new group — an update that moves groups decrements one and
    increments the other; an in-place update nets to a pure value
    delta. Groups whose maintained count reaches zero are dropped
    (matching a recompute, which would simply not emit them).

    Cross-engine exactness: value deltas are summed as DECIMAL(18,6)
    (order-independent), and DECIMAL addition is associative, so
    ``base + delta`` is bit-identical to the full recompute the oracle
    runs.

    Scale shape: ONE scan of the feed (both contributions materialize
    from an exploded 2-element struct array, not a self-union), a
    map-side-combined aggregation down to |touched groups| rows, then
    one full-outer join against the |groups|-row aggregate table. No
    base-relation scan, no window, nothing proportional to the corpus.
    """
    contrib = changes.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(before_group).alias("_g"),
                    F.lit(-1).cast("long").alias("_dn"),
                    (-F.col(before_value)).cast("decimal(18,6)").alias("_dv"),
                ),
                F.struct(
                    F.col(after_group).alias("_g"),
                    F.lit(1).cast("long").alias("_dn"),
                    F.col(after_value).cast("decimal(18,6)").alias("_dv"),
                ),
            )
        ).alias("c")
    ).select("c.*").where(F.col("_g").isNotNull())
    delta = contrib.groupBy("_g").agg(
        F.sum("_dn").alias("_delta_n"), F.sum("_dv").alias("_delta_v")
    )
    merged = base_aggs.join(
        delta, base_aggs[group_col] == delta["_g"], "full_outer"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    out_n = F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(
        F.col("_delta_n"), F.lit(0)
    )
    out_v = F.coalesce(F.col(sum_col).cast("decimal(18,6)"), zero) + F.coalesce(
        F.col("_delta_v"), zero
    )
    return (
        merged.select(
            F.coalesce(base_aggs[group_col], F.col("_g")).alias(group_col),
            out_n.alias(n_col),
            out_v.alias(sum_col),
        )
        .where(F.col(n_col) > 0)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    update_set: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    insert_condition: Column | None = None,
) -> DataFrame:
    """Condition-driven MERGE (ANSI ``MERGE INTO`` / Delta ``merge``):
    the dual of ``cdc_apply``. Where cdc_apply folds a feed that SAYS
    what to do per row (an op column), merge_upsert DERIVES the action
    from match state and predicates — the idiom a user migrating a
    warehouse MERGE statement reaches for:

    - ``WHEN MATCHED AND matched_delete`` -> row removed;
    - ``WHEN MATCHED`` -> ``update_set`` columns replaced (expressions
      reference the two sides as ``t.<col>`` / ``s.<col>``; omitted
      columns keep the target value);
    - ``WHEN NOT MATCHED [AND insert_condition]`` (source-only key) ->
      insert from ``insert_values`` (same ``s.`` references; target
      columns absent from the mapping become NULL). Pass
      ``insert_values=None`` to disable inserts (update/delete-only
      merge); ``insert_condition`` is ANSI's conditional-insert arm —
      source-only rows failing it are dropped, the guard a CDC feed
      needs so a delete action for a key the table never held does not
      resurrect as an insert;
    - target-only keys pass through unchanged.

    Returns the merged table with exactly the target's columns.
    Violations ANSI MERGE raises on are raised here too: a source key
    matching a target row MORE THAN ONCE raises a runtime cardinality
    error (collapse a raw feed upstream with ``cdc_apply``-style
    latest-wins first — ``manifest_merge_sink`` does). NULL keys are
    well-defined, not a precondition: match state comes from explicit
    presence flags, never key nullness, so a null-keyed source row
    simply never matches (SQL join semantics) and flows to the
    NOT MATCHED arm; a null-keyed target row passes through.

    Scale shape: ONE full-outer join on the key (full-outer joins
    cannot broadcast — Spark plans a spillable sort-merge, which is the
    right tool: both sides stream) — the 100 TB target shuffles exactly
    once. The cardinality guard is a count window over the source
    partitioned by the SAME keys, so its exchange is the join's own
    (one extra sort of the small side, no extra shuffle). Both sides
    bucketed by key -> shuffle-free, the same layout contract as
    ``cdc_apply``.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    clash = {"_mrg_t", "_mrg_s", "_mrg_sn"} & (
        set(target.columns) | set(source.columns)
    )
    if clash:
        raise ValueError(
            f"merge_upsert reserves working columns {sorted(clash)} — "
            "rename them on the input frames first"
        )
    # explicit presence flags: key nullness cannot stand in for match
    # state (a NULL key on either side would mis-derive it)
    src_n = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    t = target.withColumn("_mrg_t", F.lit(1)).alias("t")
    s = (
        source.withColumn("_mrg_s", F.lit(1))
        .withColumn("_mrg_sn", src_n)
        .alias("s")
    )
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")
    matched = (
        F.col("s._mrg_s").isNotNull() & F.col("t._mrg_t").isNotNull()
    )
    source_only = F.col("t._mrg_t").isNull()
    # ANSI cardinality violation: >1 source row hit this target row
    matched = F.when(
        matched & (F.col("s._mrg_sn") > 1),
        F.raise_error(
            F.concat(
                F.lit(
                    "MERGE cardinality violation: duplicate source key ("
                ),
                F.concat_ws(
                    ", ", *[F.col(f"s.{k}").cast("string") for k in keys]
                ),
                F.lit(") matched a target row more than once"),
            )
        ).cast("boolean"),
    ).otherwise(matched)
    update_set = update_set or {}
    out_cols = []
    for c in target.columns:
        if c in keys:
            val = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        else:
            updated = update_set.get(c, F.col(f"t.{c}"))
            inserted = (
                insert_values.get(c, F.lit(None))
                if insert_values is not None
                else F.lit(None)
            )
            val = (
                F.when(matched, updated)
                .when(source_only, inserted)
                .otherwise(F.col(f"t.{c}"))
            )
        out_cols.append(val.alias(c))
    keep = ~matched | matched_delete.isNull() | ~matched_delete if matched_delete is not None else F.lit(True)
    if insert_values is None:
        keep = keep & ~source_only
    elif insert_condition is not None:
        keep = keep & (
            ~source_only | insert_condition.isNotNull() & insert_condition
        )
    return joined.where(keep).select(*out_cols)
