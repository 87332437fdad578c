"""resample_ohlc (round-11 wave 7): bar semantics, tie ordering and
the timestamp-dtype dispatch."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _events(spark, ntz: bool):
    rows = [
        # day 1, key A: open=1.0 (earliest), close=4.0 (latest),
        # two rows share ts 08:00 — event_id breaks the tie
        ("A", "2024-03-01 01:00:00", 1, 1.0),
        ("A", "2024-03-01 08:00:00", 2, 9.0),
        ("A", "2024-03-01 08:00:00", 3, 0.5),
        ("A", "2024-03-01 23:59:59", 4, 4.0),
        # day 2, key A: single row — open == close
        ("A", "2024-03-02 12:00:00", 5, 7.0),
        # day 1, key B
        ("B", "2024-03-01 10:00:00", 6, 2.0),
        ("B", "2024-03-01 11:00:00", 7, 3.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "event_id", "value"]),
        schema="k string, ts string, event_id long, value double",
    )
    ts_type = "timestamp_ntz" if ntz else "timestamp"
    return df.withColumn("ts", F.col("ts").cast(ts_type))


@pytest.mark.parametrize("ntz", [True, False])
def test_resample_ohlc_bars(spark, ntz):
    from tdei_extract_load_service_spark.functions import timestamps as TS
    from tdei_extract_load_service_spark.operators.events import resample_ohlc

    out = resample_ohlc(
        _events(spark, ntz), "ts", "value", unit="day", keys=("k",),
        tiebreak=("event_id",),
    ).select(
        "k",
        TS.normalize_ts(F.col("bar"), "yyyy-MM-dd").alias("bar"),
        "open", "high", "low", "close", "n_events", "total_value",
    )
    got = {(r["k"], r["bar"]): r.asDict() for r in out.collect()}
    a1 = got[("A", "2024-03-01")]
    # simultaneous 08:00 rows order by event_id: 9.0 (id 2) before 0.5
    # (id 3) — neither is open/close here, but high/low see both
    assert (a1["open"], a1["high"], a1["low"], a1["close"]) == (
        1.0, 9.0, 0.5, 4.0,
    )
    assert (a1["n_events"], a1["total_value"]) == (4, 14.5)
    a2 = got[("A", "2024-03-02")]
    assert (a2["open"], a2["close"], a2["n_events"]) == (7.0, 7.0, 1)
    b1 = got[("B", "2024-03-01")]
    assert (b1["open"], b1["close"]) == (2.0, 3.0)
    assert len(got) == 3


def test_resample_ohlc_tie_at_bar_edge(spark):
    """open/close themselves decided by the tiebreak when ts ties."""
    from tdei_extract_load_service_spark.operators.events import resample_ohlc

    rows = [
        ("2024-03-01 00:00:00", 2, 5.0),
        ("2024-03-01 00:00:00", 1, 3.0),  # lower event_id -> open
        ("2024-03-01 23:00:00", 4, 8.0),  # higher event_id -> close
        ("2024-03-01 23:00:00", 3, 6.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "event_id", "value"]),
        schema="ts string, event_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = resample_ohlc(
        df, "ts", "value", unit="day", tiebreak=("event_id",)
    ).collect()[0]
    assert (r["open"], r["close"]) == (3.0, 8.0)


def test_resample_ohlc_bad_unit_raises(spark):
    from tdei_extract_load_service_spark.operators.events import resample_ohlc

    df = spark.range(1).select(
        F.current_timestamp().alias("ts"), F.lit(1.0).alias("v")
    )
    with pytest.raises(ValueError, match="unit"):
        resample_ohlc(df, "ts", "v", unit="fortnight")


def test_rolling_active_users_gapped_fixture(spark):
    """Gap days report while their trailing window is non-empty; the
    window truncates correctly; counts are DISTINCT users."""
    import pandas as pd

    from tdei_extract_load_service_spark.functions import timestamps as TS
    from tdei_extract_load_service_spark.operators.events import (
        rolling_active_users,
    )

    day = "2024-03-{:02d} 12:00:00"
    rows = [
        (1, day.format(1)),
        (2, day.format(1)),
        (1, day.format(2)),
        # gap: 03-03 .. 03-05 have no events
        (3, day.format(6)),
        (1, day.format(6)),
        (1, day.format(6)),  # duplicate user-day collapses
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"]),
        schema="user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["day"]: r["n_active"]
        for r in rolling_active_users(df, "ts", "user_id", window_days=3)
        .select(
            TS.normalize_ts(F.col("day"), "yyyy-MM-dd").alias("day"),
            "n_active",
        )
        .collect()
    }
    assert got == {
        "2024-03-01": 2,  # {1,2}
        "2024-03-02": 2,  # {1,2} (day1 still in window)
        "2024-03-03": 2,  # gap day, window [1..3] non-empty
        "2024-03-04": 1,  # {1} (day2 only)
        # 03-05: window [3..5] empty -> absent
        "2024-03-06": 2,  # {1,3}
        "2024-03-07": 2,
        "2024-03-08": 2,
    }
