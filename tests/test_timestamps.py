"""Session-timezone independence of the timestamp helpers.

Round-7 regression find: ``utc_literal`` originally shifted with
``to_utc_timestamp`` — the SAME direction as the string->timestamp cast —
so under any non-UTC session the literal landed 2x the offset away from
the intended instant (America/Los_Angeles: +16h), silently moving every
date-window boundary by a day. The whole-window counts of tpch_q4/q14
exposed it in the vanilla/LA oracle sweep; earlier entries had hidden it
behind top-k cutoffs and boundary days with no qualifying rows. These
tests pin the corrected contract under rotated session timezones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.functions import timestamps as TS

#: 1996-04-01 00:00:00 UTC
EPOCH_APR1_1996 = 828_316_800


@pytest.fixture
def rotate_tz(spark):
    """Yield a setter that changes the session timezone; always restore."""
    original = spark.conf.get("spark.sql.session.timeZone")

    def set_tz(tz: str) -> None:
        spark.conf.set("spark.sql.session.timeZone", tz)

    yield set_tz
    spark.conf.set("spark.sql.session.timeZone", original)


def test_utc_literal_pins_the_instant_in_any_session_tz(spark, rotate_tz):
    for tz in ("UTC", "America/Los_Angeles", "Asia/Kolkata", "Australia/Sydney"):
        rotate_tz(tz)
        epoch = spark.range(1).select(
            F.unix_timestamp(TS.utc_literal("1996-04-01 00:00:00")).alias("e")
        ).collect()[0]["e"]
        assert epoch == EPOCH_APR1_1996, f"utc_literal drifted under {tz}"


def test_window_boundary_rows_stable_across_session_tz(spark, rotate_tz):
    """The q4-style strict upper bound must exclude boundary-midnight
    rows under every session timezone — the exact failure mode the
    inverted shift produced (LA included them; UTC did not)."""
    from tdei_extract_load_service_spark.catalog import _read

    counts = {}
    for tz in ("UTC", "America/Los_Angeles"):
        rotate_tz(tz)
        orders = _read(spark, "/root/testdata/sf0.001", "orders")
        counts[tz] = orders.where(
            (F.col("o_orderdate") >= TS.utc_literal("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < TS.utc_literal("1996-04-01 00:00:00"))
        ).count()
    assert counts["UTC"] == counts["America/Los_Angeles"]


def test_normalize_ts_renders_utc_wall_clock_in_any_session_tz(spark, rotate_tz):
    for tz in ("UTC", "America/Los_Angeles"):
        rotate_tz(tz)
        rendered = spark.range(1).select(
            TS.normalize_ts(TS.utc_literal("1996-04-01 00:00:00")).alias("s")
        ).collect()[0]["s"]
        assert rendered == "1996-04-01T00:00:00.000Z", f"drifted under {tz}"
