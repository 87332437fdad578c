"""JDBC sink integration — the reference's actual sink path (O12: batched
multi-row INSERTs into a relational DB) exercised against embedded Derby
(shipped in Spark's classpath), standing in for Postgres."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.sinks.writers import write_batched


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "sinkdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_batched_write_and_readback(spark, derby_url):
    df = spark.createDataFrame(
        [(f"ds-1", f'{{"id": {i}}}', "user") for i in range(2500)],
        "tdei_dataset_id string, feature string, requested_by string",
    ).coalesce(1)  # bounded connections, mirroring the reference's pool cap
    write_batched(
        df,
        jdbc_url=derby_url,
        table="node_sink",
        batch_size=1000,  # BULK_INSERT_BATCH_SIZE parity (environment.ts:26)
        mode="overwrite",
        # Derby maps StringType->CLOB which forbids '=' comparisons; typed
        # DDL mirrors the reference's real column types (Postgres JSONB/text)
        jdbc_options={
            "createTableColumnTypes": (
                "tdei_dataset_id VARCHAR(64), feature VARCHAR(4000), requested_by VARCHAR(64)"
            )
        },
    )
    back = spark.read.format("jdbc").option("url", derby_url).option("dbtable", "node_sink").load()
    assert back.count() == 2500
    assert {r.requested_by for r in back.select("requested_by").distinct().collect()} == {"user"}


def test_jdbc_append_then_filtered_read(spark, derby_url):
    more = spark.createDataFrame(
        [("ds-2", '{"id": -1}', "user2")],
        "tdei_dataset_id string, feature string, requested_by string",
    )
    write_batched(more, jdbc_url=derby_url, table="node_sink", mode="append")
    # predicate pushdown reaches the DB: dbtable + filter -> WHERE clause
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "node_sink")
        .load()
        .where(F.col("tdei_dataset_id") == "ds-2")
    )
    rows = back.collect()
    assert len(rows) == 1 and rows[0].requested_by == "user2"
