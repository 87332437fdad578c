"""Event-time streaming operators.

The reference has NO event-time semantics (SURVEY.md §1.3: its "streaming"
is incremental arrival + backpressure only) — these are the engine's
forward-looking extension over the ``events`` stream shape, built on
Structured Streaming's incremental-execution model:

- ``windowed_event_aggs``: tumbling event-time windows + watermark. State
  is one row per (window, event_type); the watermark bounds state size —
  windows older than it are finalized and evicted, so state is O(active
  windows), not O(stream length), at any scale.
- ``stateful_user_counts``: arbitrary stateful processing via
  ``applyInPandasWithState`` — the ``GroupState`` pattern for operators
  Spark lacks natively (the custom-stateful-op escape hatch).

Both operate on any DataFrame with (ts timestamp, event_type string,
user_id long, value double) — batch frames too (a batch DataFrame is the
bounded special case; the windowed agg is oracle-checked in batch form as
``window_tumbling``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATEFUL_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATEFUL_STATE_SCHEMA = "n_events bigint, total_value double"


def windowed_event_aggs(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a late-data bound.

    The watermark says "accept events up to ``watermark_delay`` late";
    anything later is dropped and the window's state row is freed — the
    contract that keeps 100 TB/day streams at bounded memory.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _update_user_counts(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals carried across micro-batches in GroupState."""
    (user_id,) = key
    if state.exists:
        n_events, total_value = state.get
    else:
        n_events, total_value = 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((n_events, total_value))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "total_value": [round(total_value, 2)]}
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event count + value
    total, updated each micro-batch (emits the current running totals for
    users seen in the batch). State: one tiny row per user, partitioned by
    user_id — shuffle-once, then local state updates."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counts,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_event_aggs(
    events: DataFrame,
    gap: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: per-key event runs separated by >= ``gap`` of
    silence (``F.session_window`` — dynamic-width state merged at event
    time; in streaming mode pair with a watermark and state closes
    ``gap`` after the last event).

    Returns (key, session_start, n_events, total_value).
    """
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose ``key_cols`` were already
    seen within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The streaming face of ``operators.dedup.dedup_exact``: state keeps one
    tiny row per distinct key and — unlike plain ``dropDuplicates``, whose
    state grows with stream length — evicts every key older than the
    watermark, so state is O(distinct keys per horizon) at any scale. The
    exactly-once contract this buys: a key is emitted once per horizon,
    duplicates inside the horizon are dropped even when they arrive in
    different micro-batches.

    On a batch frame Spark rejects the within-watermark form; callers use
    ``dedup_exact`` there (the semantics coincide on bounded input).
    """
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark_delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key_col`` where the right event falls
    within ``[left_ts - within, left_ts + within]`` — the event-correlation
    primitive (click->view attribution, request->response pairing).

    Both sides carry watermarks and the join condition bounds event-time
    distance, which is exactly what lets Spark EVICT buffered rows: a side's
    state row can be dropped once the other side's watermark has passed the
    farthest instant that could still match it (watermark_delay + within).
    Without the time-bound condition a stream-stream join must buffer both
    streams forever.

    ``how``: ``inner`` (default) or ``left_outer`` — the outer form emits
    a null-padded row for a left event only when its state EXPIRES (the
    watermark passes ``left_ts + within``, so no future right row can
    match); until then "unmatched so far" rows are invisible. The
    conversion-analysis shape: views that never got a click.

    Column contract: output carries the key, both timestamps and both
    payloads, with right-side columns suffixed ``_r``.
    """
    lw = left.withWatermark(left_ts, watermark_delay).alias("l")
    rename = {c: f"{c}_r" for c in right.columns if c != key_col}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rw = r.withWatermark(f"{right_ts}_r" if right_ts in rename else right_ts, watermark_delay).alias("r")
    rts = f"{right_ts}_r" if right_ts in rename else right_ts
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{rts}") >= F.expr(f"l.{left_ts} - INTERVAL {within}"))
        & (F.col(f"r.{rts}") <= F.expr(f"l.{left_ts} + INTERVAL {within}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    return lw.join(rw, cond, how).drop(F.col(f"r.{key_col}"))


SESSION_TIMEOUT_OUTPUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint,"
    " n_events bigint, closed_by string"
)
SESSION_TIMEOUT_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def stream_session_timeout(
    events: DataFrame, gap_us: int = 7_200_000_000
) -> DataFrame:
    """Per-user sessionization on GroupState with an EVENT-TIME TIMEOUT
    — the state-expiry callback path (``state.hasTimedOut``) that no
    built-in operator exercises: a session closes either when a new
    event arrives ``gap_us`` or more past the last one (the data path),
    or when the WATERMARK passes ``last_event + gap`` with no new data
    (the timeout path — Spark re-invokes the function for the expired
    group in a no-data batch, which is how an open session ever flushes
    on a quiet key). Each closed session emits EXACTLY ONCE with
    ``closed_by`` recording which path closed it.

    Input contract: ``events`` carries a watermarked instant ``ts``
    (EventTimeTimeout refuses to run without one) AND a JVM-computed
    ``ts_us`` long (``unix_micros(ts)``) — the state math never touches
    a pandas timestamp, because an instant renders session-local naive
    in Arrow and its epoch would shift under a non-UTC driver (the
    shadow-module timezone discipline).

    Exactly-once closure argument (for per-user event-time-ordered
    arrival, the staged-replay regime): if a timeout fired for a user,
    the watermark had passed ``last + gap``; any later event e arrives
    with ``e >= watermark >= last + gap``, so the data path would have
    opened a NEW session anyway — the two closure paths can never emit
    overlapping sessions, and boundaries are identical whichever fires
    first.

    Scale shape: one shuffle on user_id; state is three longs per OPEN
    session (closed state is removed immediately), bounded by the
    watermark exactly like the built-in session_window's."""
    gap_ms = gap_us // 1000

    def _update(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        rows: list[int] = []
        for pdf in pdfs:
            rows.extend(int(v) for v in pdf["ts_us"])
        rows.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for us in rows:
            if start is None:
                start, last, n = us, us, 1
            elif us - last >= gap_us:
                closed.append((start, last, n))
                start, last, n = us, us, 1
            else:
                last, n = us, n + 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "closed_by": ["data"] * len(closed),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_TIMEOUT_OUTPUT_SCHEMA,
        stateStructType=SESSION_TIMEOUT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


try:  # Spark 4 arbitrary-state v2 (transformWithState); absent on 3.x
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessor,
    )
except ImportError:  # pragma: no cover - the engine pins pyspark 4.1
    _StatefulProcessor = object


class SessionTimerProcessor(_StatefulProcessor):
    """transformWithStateInPandas sessionizer — the Spark-4-native twin
    of ``stream_session_timeout``: the SAME gap recurrence over the
    JVM-computed ``ts_us`` long, but on the v2 arbitrary-state API —
    typed ValueState plus REGISTERED TIMERS (``registerTimer`` /
    ``handleExpiredTimer``) instead of GroupState's single implicit
    timeout slot. Each input batch re-arms the key's one timer at
    ``last_event + gap`` (the previous timer is deleted — the v2 API
    allows many timers per key, the old API exactly one; parity needs
    exactly one live deadline). Sessions closed by a late-enough new
    event emit with ``closed_by='data'``; sessions flushed because the
    watermark crossed the armed deadline emit from the timer callback
    with ``closed_by='timer'``. The exactly-once/non-overlap argument
    is ``stream_session_timeout``'s verbatim — the two APIs must
    produce identical session sets, which the shadow pytest pins."""

    def __init__(self, gap_us: int = 7_200_000_000):
        self.gap_us = gap_us

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "session", "start_us long, last_us long, n long"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(v) for v in pdf["ts_us"])
        ts.sort()
        start, last, n = (
            tuple(self.state.get()) if self.state.exists() else (None, None, 0)
        )
        closed: list[tuple[int, int, int]] = []
        for us in ts:
            if start is None:
                start, last, n = us, us, 1
            elif us - last >= self.gap_us:
                closed.append((start, last, n))
                start, last, n = us, us, 1
            else:
                last, n = us, n + 1
        self.state.update((start, last, n))
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last // 1000 + self.gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "closed_by": ["data"] * len(closed),
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if self.state.exists():
            start, last, n = tuple(self.state.get())
            self.state.clear()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                    "closed_by": ["timer"],
                }
            )

    def close(self) -> None:
        pass


def stream_session_tws(
    events: DataFrame, gap_us: int = 7_200_000_000
) -> DataFrame:
    """Run :class:`SessionTimerProcessor` through
    ``transformWithStateInPandas`` (event-time mode; input must carry a
    watermarked instant ``ts`` and the JVM-computed ``ts_us`` long).
    Output schema matches ``stream_session_timeout`` (``closed_by``
    values are ``data``/``timer``).

    ENVIRONMENT GATE (the Kafka-jar / Postgres-driver policy,
    streaming/consumer.py:125): Spark's transformWithState runtime
    speaks protobuf to the Python state server, so it hard-requires
    ``google.protobuf`` — absent in this sandbox (and installs are
    off-limits). The check fails LOUDLY up front with the install
    recipe instead of letting the streaming runner crash with an
    opaque [STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE]; the
    cross-API equality pytest importorskips on the same module, and
    the GroupState twin (stream_session_timeout) carries the
    driver-certified timeout semantics meanwhile."""
    import importlib.util

    try:  # find_spec raises (not returns None) when the PARENT package
        # "google" itself is absent — the usual shape of the miss
        have_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        have_protobuf = False
    if not have_protobuf:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(Spark's Python state-server protocol): pip install "
            "'protobuf>=4.25' — absent in this environment; use "
            "stream_session_timeout (GroupState) for identical "
            "session semantics"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionTimerProcessor(gap_us),
        outputStructType=SESSION_TIMEOUT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


FUNNEL_OUTPUT_SCHEMA = "user_id bigint, steps_completed int, step_times array<bigint>"
FUNNEL_STATE_SCHEMA = "t0 bigint, t1 bigint, t2 bigint"


def stream_funnel(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Streaming twin of ``operators.events.funnel`` (3 steps): per-user
    GroupState carries the earliest qualifying event time of each step
    across micro-batches; each batch emits the user's current funnel
    depth and the qualifying times (epoch micros; NULL-free longs, -1 =
    not reached).

    Semantics: within a batch rows are processed in event-time order
    with the SAME strict-< recurrence as the batch funnel (equal
    timestamps never advance), so for per-user in-event-time-order
    arrival — or any prefix split across batches — the result equals
    the batch funnel exactly (pytest proves the cross-batch case). A
    step event arriving EARLIER in event time than an already-consumed
    batch can improve its own step's time but cannot retroactively
    qualify prior-batch events of later steps — the documented
    approximation bound of one-pass stateful funnels; bound late
    arrival with a watermark upstream exactly as for windowed aggs.

    Scale shape: shuffle once on user_id, then O(steps) state per user
    — no event buffering, state size independent of stream length."""
    if len(steps) != 3:
        raise ValueError("stream_funnel is specialized to 3 steps")

    def _update(key, pdfs, state):
        (user_id,) = key
        t = list(state.get) if state.exists else [-1, -1, -1]
        rows = []
        for pdf in pdfs:
            for ts, ty in zip(pdf["ts"], pdf["event_type"]):
                rows.append((ts.value // 1000, ty))  # pandas ns -> micros
        rows.sort()
        for us, ty in rows:
            for i, step in enumerate(steps):
                if ty != step:
                    continue
                prev_ok = i == 0 or (t[i - 1] != -1 and t[i - 1] < us)
                if prev_ok and (t[i] == -1 or us < t[i]):
                    t[i] = us
        # re-run the strict-order constraint after improvements: a step
        # time is only valid if it is strictly after its predecessor
        # (an improved t0 cannot invalidate t1, but a t1 recorded in
        # this pass must still satisfy t0 < t1 — enforced above because
        # rows are processed in event-time order)
        state.update(tuple(t))
        depth = 0
        for v in t:
            if v == -1:
                break
            depth += 1
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "steps_completed": [depth],
                "step_times": [t],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
