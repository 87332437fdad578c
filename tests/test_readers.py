"""Format breadth + corrupt-record dead-letter path."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_SMOKE
from tdei_extract_load_service_spark.sources.readers import (
    infer_format,
    read_table,
    split_corrupt,
)

EVENT_SCHEMA = "ts timestamp, event_type string, user_id long, value double"


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    path = str(tmp_path / f"supplier_{fmt}")
    src.write.format(fmt).option("header", "true").save(path)
    schema = None if fmt in ("parquet", "orc") else src.schema.simpleString()[7:-1].replace(":", " ")
    back = read_table(spark, path, fmt=fmt, schema=schema)
    assert back.count() == src.count()
    assert {r.s_suppkey for r in back.collect()} == {r.s_suppkey for r in src.collect()}


def test_infer_format():
    assert infer_format("/x/y/data.parquet") == "parquet"
    assert infer_format("/x/y/e.jsonl") == "json"
    with pytest.raises(ValueError):
        infer_format("/x/y/mystery.bin")


def test_avro_gated(spark, tmp_path):
    with pytest.raises(NotImplementedError):
        read_table(spark, str(tmp_path / "x.avro"), fmt="avro")


def test_corrupt_record_dead_letter(spark, tmp_path):
    p = tmp_path / "events.json"
    with open(p, "w") as fh:
        fh.write(json.dumps({"ts": "2024-01-01 10:00:00", "event_type": "click",
                             "user_id": 1, "value": 1.0}) + "\n")
        fh.write('{"ts": "2024-01-01 11:00:00", "event_type": BROKEN\n')  # malformed
        fh.write(json.dumps({"ts": "2024-01-01 12:00:00", "event_type": "view",
                             "user_id": 2, "value": 2.0}) + "\n")
    df = read_table(spark, str(p), fmt="json", schema=EVENT_SCHEMA, corrupt_column=True)
    valid, corrupt = split_corrupt(df)
    assert valid.count() == 2
    bad = corrupt.collect()
    assert len(bad) == 1 and "BROKEN" in bad[0]._corrupt_record
