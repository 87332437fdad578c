"""Typed database-error normalization (O21, second half).

Ports the reference's PG error-code mapping
(``src/database/data-source.ts:96-107``: 23505 -> UniqueKeyDbException,
23503 -> ForeignKeyDbException; codes declared in
``src/constants/pg-error-constants.ts:211-213``) onto the engine's JDBC
paths. The codes are SQL-standard SQLSTATEs, so the same classification
works for Postgres, Derby, MySQL et al. — which is also what makes the
Derby-based integration tests faithful.

Spark surfaces driver-side JDBC failures as Py4J exceptions whose message
embeds the Java SQLException chain; executor-side write failures arrive
wrapped in a SparkException with the task failure appended. In both shapes
the SQLSTATE travels in the text, so classification inspects the rendered
message (and, when available, walks ``getSQLState()`` on the Java cause).
"""

from __future__ import annotations

UNIQUE_VIOLATION = "23505"
FOREIGN_KEY_VIOLATION = "23503"


class DatabaseError(Exception):
    """Base for normalized relational-sink errors; carries the SQLSTATE."""

    sqlstate: str | None = None

    def __init__(self, message: str, sqlstate: str | None = None):
        super().__init__(message)
        self.sqlstate = sqlstate or self.sqlstate


class DuplicateKeyError(DatabaseError):
    """Unique-constraint violation (SQLSTATE 23505) — the reference raises
    UniqueKeyDbException("Duplicate") here (data-source.ts:100-101)."""

    sqlstate = UNIQUE_VIOLATION


class ForeignKeyError(DatabaseError):
    """Foreign-key violation (SQLSTATE 23503) — the reference raises
    ForeignKeyDbException(constraint) here (data-source.ts:102-103)."""

    sqlstate = FOREIGN_KEY_VIOLATION


def _java_sqlstates(exc: BaseException) -> list[str]:
    """Walk a Py4J error's Java exception chain collecting SQLSTATEs."""
    states: list[str] = []
    java_exc = getattr(exc, "java_exception", None)
    seen = 0
    while java_exc is not None and seen < 16:
        try:
            state = java_exc.getSQLState()
            if state:
                states.append(str(state))
        except Exception:  # noqa: BLE001 — not a SQLException link
            pass
        try:
            java_exc = java_exc.getCause()
        except Exception:  # noqa: BLE001
            break
        seen += 1
    return states


#: SQLSTATE as actually rendered by JDBC drivers / Spark error text —
#: anchored so a data value or row count that happens to contain the digit
#: run (e.g. an id 4235051) can never be misclassified as a violation.
#: Matches "SQLState: 23505", "SQLSTATE=23505", "ERROR 23505", or the
#: Derby/PG style bracketed "[23505]" / quoted "'23505'" renderings.
_STATE_RE_TEMPLATE = (
    r"(?:SQL\s?STATE\s*[:=]?\s*|ERROR\s+|\[|')({code})(?![0-9])"
)


def _state_in_text(code: str, text: str) -> bool:
    import re

    return re.search(_STATE_RE_TEMPLATE.format(code=code), text, re.IGNORECASE) is not None


def classify_db_error(exc: BaseException) -> BaseException:
    """Return the typed exception for a JDBC failure, or ``exc`` unchanged.

    Mirrors the reference switch (data-source.ts:96-107): only the two
    integrity codes are normalized; everything else propagates as-is.
    Primary signal is the Java ``getSQLState()`` chain walk; the text
    fallback (executor-side failures arrive flattened into the message)
    requires an anchored SQLSTATE rendering, not a bare substring.
    """
    states = _java_sqlstates(exc)
    text = str(exc)
    if UNIQUE_VIOLATION in states or _state_in_text(UNIQUE_VIOLATION, text):
        return DuplicateKeyError("Duplicate", UNIQUE_VIOLATION)
    if FOREIGN_KEY_VIOLATION in states or _state_in_text(FOREIGN_KEY_VIOLATION, text):
        # the reference forwards the violated constraint name; the JDBC
        # message carries it — forward the first line as context
        first_line = text.splitlines()[0] if text else "foreign key violation"
        return ForeignKeyError(first_line, FOREIGN_KEY_VIOLATION)
    return exc


class ExpectationFailedError(Exception):
    """A write-audit-publish gate rejected a staged dataset: one or more
    declarative expectations (operators/profiling.dq_check) failed
    against the PHYSICALLY STAGED files, so the manifest pointer was
    never swapped and readers keep the previous version. Carries the
    failed rule rows for the caller's error report (the lake-side
    analogue of O21's typed constraint errors — the database rejects a
    bad row, the WAP gate rejects a bad dataset)."""

    def __init__(self, failed: list):
        self.failed = failed
        names = ", ".join(sorted(r["rule"] for r in failed))
        super().__init__(f"expectations failed: {names}")
