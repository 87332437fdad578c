"""Event-sequence analytics: funnels and cohort retention.

The behavioral-analytics queries every event pipeline runs (reference
parity: the stats-aggregation family of O19 generalized to ordered
event sequences, SURVEY.md §2.3 extension). Both operators are
single-shuffle shapes: the funnel is one window pass over
(user, event-time) order; retention is one per-user aggregation whose
state is bounded by the observation window, never the event volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Epoch micros per day — UTC day bucketing via integer arithmetic is
#: session-timezone independent (the window_tumbling recipe), unlike
#: ``cast(ts as date)`` which follows the session zone.
_US_PER_DAY = 86_400_000_000

#: FLOOR-division day bucket over epoch micros.  Plain ``DIV`` truncates
#: toward zero, which puts 1969-12-31 23:00 in day 0 together with
#: 1970-01-01 01:00 — broken day-offset semantics for pre-epoch events
#: (ADVICE r7).  Spark ``%`` carries the dividend's sign, so the CASE
#: subtracts one exactly when truncation rounded the wrong way; the
#: arithmetic stays pure integer (micros ~1.7e18 are beyond double's
#: exact range — float division is banned here).  The DuckDB oracles use
#: the textually parallel ``//``/``%`` form (DuckDB integer ``//`` also
#: truncates — probed, v1.0.0), so both engines floor identically.
_FLOOR_DAY = (
    f"(_us DIV {_US_PER_DAY}) + (CASE WHEN _us % {_US_PER_DAY} < 0 THEN -1 ELSE 0 END)"
)


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: tuple[str, ...],
) -> DataFrame:
    """Strictly-ordered funnel: one row with, per step i, the number of
    users who performed step i at a strictly later event time than their
    qualifying step i-1 occurrence (step 0 qualifies unconditionally).

    Semantics pinned for determinism: a user's qualifying time for step
    i is the EARLIEST occurrence of step i strictly after the qualifying
    time of step i-1 ("earliest click after the first view"); ties in
    event time do NOT advance the funnel (strict ``<`` on the
    timestamp), so the result is independent of the arbitrary order of
    equal-timestamp rows.

    Scale shape: ONE shuffle — a single window partitioned by user and
    sorted by event time computes, at each row, the running qualifying
    time of every prior step (a running ``min(CASE ...)`` per step);
    the final count is one map-side-combined global aggregation of
    per-row booleans. No self-join per step (the textbook k-way join
    formulation shuffles the fact k times); window state is O(steps)
    per user. Window frames end at ``currentRow`` and qualification
    compares VALUES (prior-step time < this row's time), so
    equal-timestamp peers inside the frame cannot fake strict order."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    u, t, ty = _col(user_col), _col(ts_col), _col(type_col)
    df = events.select(u.alias("_u"), t.alias("_t"), ty.alias("_ty"))
    w = (
        Window.partitionBy("_u")
        .orderBy(F.col("_t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # qualified step times, computed left to right; _q{i} is this row's
    # "step i happened at this row and the funnel had reached step i-1
    # strictly earlier" flag, _m{i} the running earliest qualified time
    prev_time: Column | None = None
    flags = []
    for i, step in enumerate(steps):
        if prev_time is None:
            qualified = F.col("_ty") == step
        else:
            qualified = (F.col("_ty") == step) & prev_time.isNotNull() & (
                prev_time < F.col("_t")
            )
        df = df.withColumn(f"_q{i}", qualified)
        df = df.withColumn(
            f"_m{i}", F.min(F.when(F.col(f"_q{i}"), F.col("_t"))).over(w)
        )
        prev_time = F.col(f"_m{i}")
        flags.append(f"_q{i}")
    aggs = [
        F.count_distinct(F.when(F.col(f), F.col("_u"))).alias(
            f"n_step{i + 1}_{steps[i]}"
        )
        for i, f in enumerate(flags)
    ]
    return df.agg(*aggs)


def retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention curve: for each day offset d, the number of
    users active (>= 1 event) exactly d UTC days after their first-ever
    event day. Offset 0 is the cohort size (every user is active on
    their first day). Returns ``(day_offset, n_users)``.

    Scale shape: ONE per-user aggregation — ``min(day)`` plus the
    distinct active-day set (bounded by the observation window, 31 days
    here, NOT by event volume: collect_set dedups map-side) — then an
    explode to (user, offset) and a tiny second aggregation over at
    most ``max_offset`` groups. No (user, day) distinct pre-shuffle, no
    join back for the cohort day."""
    staged = events.select(
        _col(user_col).alias("_u"), F.unix_micros(_col(ts_col)).alias("_us")
    )
    per_user = (
        staged.select("_u", F.expr(_FLOOR_DAY).alias("_d"))
        .groupBy("_u")
        .agg(F.min("_d").alias("_cohort"), F.collect_set("_d").alias("_days"))
    )
    offsets = per_user.select(
        F.explode(
            F.transform("_days", lambda d: d - F.col("_cohort"))
        ).alias("day_offset")
    )
    if max_offset is not None:
        offsets = offsets.where(F.col("day_offset") <= max_offset)
    return (
        offsets.groupBy("day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("day_offset").asc())
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Per-cohort retention curve: for each (cohort first-activity day,
    day offset), the active-user count and the retention RATE against
    that cohort's size — the table behind every retention heatmap.
    Returns ``(cohort_day, day_offset, n_users, rate)`` with
    ``cohort_day`` as the UTC day number (exact integer arithmetic).

    Scale shape: the same single per-user aggregation as ``retention``
    (min day + bounded distinct-day set), exploded to (cohort, offset)
    pairs; cohort sizes fall out of the SAME aggregation (offset 0 rows
    ARE the cohort sizes), recovered with one window over the cohort —
    no second scan, no join."""
    from pyspark.sql import Window

    staged = events.select(
        _col(user_col).alias("_u"), F.unix_micros(_col(ts_col)).alias("_us")
    )
    per_user = (
        staged.select("_u", F.expr(_FLOOR_DAY).alias("_d"))
        .groupBy("_u")
        .agg(F.min("_d").alias("_cohort"), F.collect_set("_d").alias("_days"))
    )
    offsets = per_user.select(
        "_cohort",
        F.explode(F.transform("_days", lambda d: d - F.col("_cohort"))).alias(
            "day_offset"
        ),
    )
    if max_offset is not None:
        offsets = offsets.where(F.col("day_offset") <= max_offset)
    counts = offsets.groupBy("_cohort", "day_offset").agg(
        F.count("*").alias("n_users")
    )
    # offset-0 count IS the cohort size (every user is active on day 0)
    size = F.max(F.when(F.col("day_offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("_cohort")
    )
    return (
        counts.withColumn("rate", F.round(F.col("n_users") / size, 6))
        .select(
            F.col("_cohort").alias("cohort_day"),
            "day_offset",
            "n_users",
            "rate",
        )
        .orderBy(F.col("cohort_day").asc(), F.col("day_offset").asc())
    )


def fill_time_gaps(
    df: DataFrame,
    group_col: str | Column,
    ts_col: str | Column,
    value_col: str | Column,
    bucket_micros: int = 3_600_000_000,
) -> DataFrame:
    """Regularize an event series: bucket to fixed windows, GENERATE the
    missing buckets per group (dense grid from each group's own
    min..max bucket), and carry the last observed mean forward over the
    gaps (LOCF). Returns ``(group, bucket, n_events, value_locf,
    is_gap)`` with ``bucket`` as the floored epoch-micros division —
    session-tz independent and exactly DuckDB's ``epoch_us // n`` with
    the same sign-corrected floor (the ADVICE-r7 pre-epoch rule).

    Scale shape: the fact table aggregates ONCE down to |group x
    bucket| rows; the grid explodes from the |groups|-row span frame
    (generated, never scanned), and the gap join plus the LOCF window
    run on bucket-sized frames — nothing downstream of the first
    aggregation is proportional to the corpus. A group's grid length is
    its own time span, so one long-lived group cannot inflate every
    other group's output (per-group min..max, not global).
    """
    g, ts, v = _col(group_col), _col(ts_col), _col(value_col)
    # integer DIV with the sign-corrected floor — double division would
    # lose precision on ~1e18 micros, so project the micros first and
    # bucket with integer arithmetic
    projected = df.select(
        g.alias("_g"), F.unix_micros(ts).alias("_us"), v.alias("_v")
    )
    bucket = F.expr(
        f"(_us DIV {bucket_micros})"
        f" + (CASE WHEN _us % {bucket_micros} < 0 THEN -1 ELSE 0 END)"
    )
    b = projected.groupBy("_g", bucket.alias("_h")).agg(
        F.count("*").alias("_n"),
        (
            F.sum(F.col("_v").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("_mean"),
    )
    # the bucket frame feeds BOTH the span and the gap join — without a
    # persist Catalyst re-plans the shared subtree as two full fact
    # scans (the q20/text_source_overlap lesson); the frame is
    # |group x bucket| rows, safe to cache at any corpus size; scoped so
    # repeated invocations recycle the previous generation's cache
    from tdei_extract_load_service_spark.session import persist_scoped

    b = persist_scoped(b, "events.fill_time_gaps.bucket")
    span = b.groupBy("_g").agg(
        F.min("_h").alias("_lo"), F.max("_h").alias("_hi")
    )
    grid = span.select(
        "_g", F.explode(F.sequence("_lo", "_hi")).alias("_h")
    )
    filled = grid.join(b, ["_g", "_h"], "left")
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_h").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("_g").alias("group"),
        F.col("_h").alias("bucket"),
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_events"),
        F.last("_mean", ignorenulls=True).over(w).alias("value_locf"),
        F.col("_n").isNull().alias("is_gap"),
    )


def event_transition_matrix(
    events: DataFrame,
    user_col: str | Column,
    ts_col: str | Column,
    type_col: str | Column,
    id_col: str | Column,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered (prev_type, next_type) pair, the
    transition count and the row-normalized probability — the behavioral
    model behind next-event prediction, anomaly scoring ("this sequence
    is improbable") and funnel design. Returns ``(prev_type, next_type,
    cnt, p)`` ordered by (prev_type, next_type).

    Cross-engine exactness: sequence order is (ts, id) — the id tiebreak
    makes same-timestamp neighbors deterministic; row totals are a
    window SUM over the |types|^2-row count frame cast BIGINT; p is ONE
    double division of two exact integers, ROUND 6.

    Scale shape: one hash shuffle on the user key feeds the lag window
    (each user's timeline sorts within its partition), then a map-side-
    combined count aggregation collapses to at most |types|^2 rows —
    the row-total window runs on that bounded frame, never on fact
    data. Hot users are bounded by their own event count, not the
    corpus."""
    w = Window.partitionBy(_col(user_col)).orderBy(
        _col(ts_col).asc(), _col(id_col).asc()
    )
    pairs = (
        events.select(
            F.lag(_col(type_col)).over(w).alias("prev_type"),
            _col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("cnt"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / F.sum("cnt").over(tot).cast("bigint"),
            6,
        ).alias("p"),
    ).orderBy(F.col("prev_type").asc(), F.col("next_type").asc())


def resample_ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    keys: tuple[str, ...] = (),
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Time-series downsampling to OHLC bars: per (``keys``,
    ``date_trunc(unit, ts)``) bucket, the opening value (first by
    ``(ts, *tiebreak)``), high, low, closing value (last by the same
    order), event count and exact-DECIMAL value total. The financial
    bar idiom generalized to any event stream — the resample step every
    metrics pipeline needs before charting/modeling raw events.

    Pass a ``tiebreak`` (e.g. the event id) that makes ``(ts,
    *tiebreak)`` total per bucket, or simultaneous first/last rows are
    arrival-nondeterministic.

    Scale shape: ONE shuffle. A single ascending window assigns
    ``row_number`` and the bucket size (count over the same partition),
    so open is the rn==1 row and close the rn==n row WITHOUT a second
    descending sort; the group-by that follows aggregates on the same
    keys the window partitioned by, so it rides the exchange already
    done. No per-bucket collect, no value buffering beyond the window
    sort (which spills).

    Session-tz discipline (the window_tumbling precedent): bucketing is
    FLOOR arithmetic on the WALL-CLOCK epoch, so the bar boundary is
    the same under any session timezone (``date_trunc`` on the raw
    column resolves through the session zone — the first cut moved day
    boundaries under the VANILLA America/LA sweep). The wall epoch is
    dtype-dispatched exactly like ``catalog._read``'s normalization:

    - an already-normalized TIMESTAMP (what ``_read``/``_read_events``
      return — the instant whose UTC wall clock is the fixture wall
      clock) is used as-is; re-pinning it would double-shift (the
      second VANILLA failure mode this operator hit);
    - a raw TIMESTAMP_NTZ column is pinned here with the ``_read``
      recipe (cast, then ``from_utc_timestamp`` under a non-UTC
      session — the ``utc_literal`` direction lesson: ``to_utc_``
      shifts the same way as the cast and doubles it).

    ``pmod`` keeps the floor mathematical for pre-epoch timestamps.
    The returned ``bar`` is the instant whose UTC wall clock is the
    truncated input wall clock — render it with ``TS.normalize_ts``.
    """
    unit_us = {
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }.get(unit)
    if unit_us is None:
        raise ValueError("unit must be minute, hour or day")
    ts_attr = F.col(ts_col)
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        session_tz = df.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        ts_attr = ts_attr.cast("timestamp")
        if session_tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            ts_attr = F.from_utc_timestamp(ts_attr, F.current_timezone())
    wall = F.unix_micros(ts_attr)
    bar_col = F.timestamp_micros(wall - F.pmod(wall, F.lit(unit_us)))
    # project bar to an ATTRIBUTE before the window so the downstream
    # group-by keys are the window's own partition attributes — grouping
    # by a re-derived expression reads as a different key to Catalyst
    # and costs a second hash exchange (measured: 3 exchanges, not 2)
    base = df.select(
        *[F.col(k) for k in keys],
        bar_col.alias("bar"),
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak],
        F.col(value_col).alias("_v"),
    )
    part = [*[F.col(k) for k in keys], F.col("bar")]
    order = [F.col("_ts").asc(), *[F.col(f"_tb_{c}").asc() for c in tiebreak]]
    w = Window.partitionBy(*part).orderBy(*order)
    wc = Window.partitionBy(*part)
    marked = base.select(
        *[F.col(k) for k in keys],
        "bar",
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_n"),
    )
    return (
        marked.groupBy(*[F.col(k) for k in keys], F.col("bar"))
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max(
                F.when(F.col("_rn") == F.col("_n"), F.col("_v"))
            ).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("_v").cast("decimal(18,6)")).alias("_tv"),
        )
        .withColumn(
            "total_value", F.round(F.col("_tv"), 2).cast("double")
        )
        .drop("_tv")
    )


def rolling_active_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct active users (the DAU/WAU/MAU family):
    for every calendar day with activity in its trailing window, the
    count of DISTINCT users seen in the ``window_days`` days ending
    that day.

    Scale shape — the standard trap is a per-day rescan (30 windows =
    30 COUNT(DISTINCT) scans) or a day-grid range join against the raw
    events. Instead:

    1. collapse events to the DAILY-DISTINCT frame first (one
       aggregation: |days x active users| rows — at 100 TB this is the
       1000x reduction, events never touch the window machinery);
    2. each (day, user) row contributes to exactly ``window_days``
       target days — explode it to those targets via a bounded
       sequence (fan-out = W, a constant, not data);
    3. one count_distinct per target day.

    Day arithmetic is wall-clock epoch-floor (tz-safe, the
    resample_ohlc recipe, dtype-dispatched the same way). Returns
    ``(day, n_active)`` with ``day`` as the bar instant (render with
    ``TS.normalize_ts``); trailing windows that extend past the data's
    first day report what was seen (the industry DAU convention), and
    days with no activity in their entire trailing window are absent.
    """
    day_us = _US_PER_DAY
    ts_attr = F.col(ts_col)
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        session_tz = df.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        ts_attr = ts_attr.cast("timestamp")
        if session_tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            ts_attr = F.from_utc_timestamp(ts_attr, F.current_timezone())
    daily = (
        df.select(
            F.unix_micros(ts_attr).alias("_us"),
            _col(user_col).alias("_user"),
        )
        .select(F.expr(_FLOOR_DAY).alias("_day"), "_user")
        .distinct()
    )
    targets = daily.select(
        F.explode(
            F.sequence(
                F.col("_day"), F.col("_day") + F.lit(int(window_days) - 1)
            )
        ).alias("_target"),
        "_user",
        "_day",
    )
    # trailing-window convention: a user-day pair counts toward EVERY
    # day whose window contains it, so days with zero activity of their
    # own still appear while their window is non-empty (standard WAU)
    return (
        targets.groupBy("_target")
        .agg(F.count_distinct(F.col("_user")).alias("n_active"))
        .select(
            F.timestamp_micros(
                F.col("_target") * F.lit(day_us)
            ).alias("day"),
            "n_active",
        )
    )
