"""Event-time streaming: windowed aggs with watermark and custom stateful
processing, driven through real readStream micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tdei_extract_load_service_spark.streaming.windows import (
    stateful_user_counts,
    windowed_event_aggs,
)

EVENT_SCHEMA = "ts timestamp, event_type string, user_id long, value double"


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    for i, batch in enumerate(rows):
        with open(path / f"batch{i}.json", "w") as fh:
            for r in batch:
                fh.write(json.dumps(r) + "\n")


def test_windowed_aggs_streaming_matches_batch(spark, tmp_path):
    rows = [
        [
            {"ts": "2024-01-01 10:05:00", "event_type": "click", "user_id": 1, "value": 1.0},
            {"ts": "2024-01-01 10:55:00", "event_type": "click", "user_id": 2, "value": 2.0},
            {"ts": "2024-01-01 11:05:00", "event_type": "view", "user_id": 1, "value": 3.0},
        ],
        [
            {"ts": "2024-01-01 11:20:00", "event_type": "view", "user_id": 3, "value": 4.0},
        ],
    ]
    src = tmp_path / "events"
    _write_events(src, rows)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    agg = windowed_event_aggs(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("windowed_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.table("windowed_test").collect()
    }
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "view")] == (2, 7.0)

    # the same operator on a batch frame gives identical results
    from datetime import datetime

    batch = spark.createDataFrame(
        [
            (datetime.fromisoformat(r["ts"]), r["event_type"], r["user_id"], r["value"])
            for b in rows
            for r in b
        ],
        EVENT_SCHEMA,
    )
    batch_got = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_aggs(batch).collect()
    }
    assert batch_got == got


def test_stateful_user_counts_across_batches(spark, tmp_path):
    rows = [
        [
            {"ts": "2024-01-01 10:00:00", "event_type": "click", "user_id": 1, "value": 1.5},
            {"ts": "2024-01-01 10:01:00", "event_type": "click", "user_id": 1, "value": 2.5},
            {"ts": "2024-01-01 10:02:00", "event_type": "view", "user_id": 2, "value": 1.0},
        ],
        [
            {"ts": "2024-01-01 10:10:00", "event_type": "click", "user_id": 1, "value": 6.0},
        ],
    ]
    src = tmp_path / "stateful"
    _write_events(src, rows)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stateful_user_counts(stream)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows_out = spark.table("stateful_test").collect()
    # state carried across micro-batches: user 1's final emission is 3 events
    final_u1 = max((r for r in rows_out if r.user_id == 1), key=lambda r: r.n_events)
    assert final_u1.n_events == 3 and final_u1.total_value == 10.0
    u2 = [r for r in rows_out if r.user_id == 2]
    assert u2 and u2[-1].n_events == 1
