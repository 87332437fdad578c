"""UTC date normalization/validation — TdeiDate
(reference src/utility/tdei-date.ts:3-21).

``TdeiDate.UTC`` renders any input as an ISO-8601 UTC instant
(``moment.utc().toISOString()`` → ``YYYY-MM-DDTHH:mm:ss.SSSZ``);
``TdeiDate.isValid`` is a parse check. Both are single codegen'd
expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_UTC_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_ts(ts: str | Column, fmt: str = ISO_UTC_FORMAT) -> Column:
    """Render a timestamp (or parseable string) as an ISO-8601 UTC string.

    Timezone-independent: ``date_format`` renders in the session timezone,
    so the instant is first shifted with ``to_utc_timestamp(c,
    current_timezone())`` — the session-tz rendering of the result IS the
    UTC wall clock, whatever timezone the caller's session runs in
    (tdei-date.ts:3-6 semantics; moment.utc() is likewise tz-independent).
    """
    c = _col(ts).cast("timestamp")
    return F.date_format(F.to_utc_timestamp(c, F.current_timezone()), fmt)


def utc_literal(ts_string: str) -> Column:
    """Instant for a UTC wall-clock literal, independent of session tz.

    ``lit(s).cast("timestamp")`` interprets the string in the *session*
    timezone (wall clock s at offset tz -> instant s - offset);
    ``from_utc_timestamp(c, current_timezone())`` applies the offset once
    more in the opposite direction (instant + offset), cancelling the
    cast's shift exactly — the result is the instant whose UTC wall
    clock is ``s`` under ANY session timezone, matching both ``_read``'s
    NTZ normalization and the DuckDB oracle's naive comparison.

    Direction matters (round-7 regression find): the original
    implementation used ``to_utc_timestamp``, which shifts the SAME way
    as the cast — under America/Los_Angeles the literal landed at
    s + 16h UTC, silently moving date-window boundaries by a day. Every
    prior entry happened to hide it (strict-bound windows with no
    boundary-midnight rows, top-k cutoffs); the round-7 Q4/Q14
    whole-window counts exposed it in the vanilla/LA sweep. Both
    operands are foldable, so the comparison still constant-folds and
    reaches PushedFilters."""
    return F.from_utc_timestamp(F.lit(ts_string).cast("timestamp"), F.current_timezone())


def is_valid_ts(ts: str | Column) -> Column:
    """True when the value parses as a timestamp — tdei-date.ts:8-21."""
    return _col(ts).cast("timestamp").isNotNull()
