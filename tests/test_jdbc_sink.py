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


# ---------------------------------------------------------------------------
# O21 second half: integrity-violation SQLSTATEs -> typed exceptions
# (reference data-source.ts:96-107, pg-error-constants.ts:211-213; the
# SQLSTATEs are SQL-standard, so Derby raises the same 23505/23503)
# ---------------------------------------------------------------------------


def _execute(spark, url: str, *statements: str) -> None:
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        for s in statements:
            stmt.execute(s)
    finally:
        conn.close()


def test_duplicate_key_maps_to_typed_error(spark, derby_url):
    from tdei_extract_load_service_spark.errors import DuplicateKeyError

    _execute(
        spark,
        derby_url,
        "CREATE TABLE dataset_meta (tdei_dataset_id VARCHAR(64) PRIMARY KEY, info VARCHAR(256))",
        "INSERT INTO dataset_meta VALUES ('ds-dup', 'first load')",
    )
    dup = spark.createDataFrame(
        [("ds-dup", "second load")], "tdei_dataset_id string, info string"
    ).coalesce(1)
    with pytest.raises(DuplicateKeyError) as err:
        write_batched(dup, jdbc_url=derby_url, table="dataset_meta", mode="append")
    # the reference surfaces exactly "Duplicate" (data-source.ts:101)
    assert str(err.value) == "Duplicate"
    assert err.value.sqlstate == "23505"


def test_foreign_key_maps_to_typed_error(spark, derby_url):
    from tdei_extract_load_service_spark.errors import ForeignKeyError

    _execute(
        spark,
        derby_url,
        "CREATE TABLE ext_file (id INT PRIMARY KEY, name VARCHAR(64))",
        "CREATE TABLE ext_feature (fid INT, ext_file_id INT REFERENCES ext_file(id))",
    )
    orphan = spark.createDataFrame([(1, 999)], "fid int, ext_file_id int").coalesce(1)
    with pytest.raises(ForeignKeyError) as err:
        write_batched(orphan, jdbc_url=derby_url, table="ext_feature", mode="append")
    assert err.value.sqlstate == "23503"


def test_classify_db_error_no_substring_false_positive():
    """A failure whose message merely CONTAINS the digit run 23505 (a data
    value) must not be rewritten into DuplicateKeyError (ADVICE r2)."""
    from tdei_extract_load_service_spark.errors import (
        DuplicateKeyError,
        ForeignKeyError,
        classify_db_error,
    )

    innocent = RuntimeError("task failed processing row id 4235051 at offset 235037")
    assert classify_db_error(innocent) is innocent

    rendered = RuntimeError("java.sql.SQLException: duplicate key; SQLState: 23505 code 0")
    assert isinstance(classify_db_error(rendered), DuplicateKeyError)
    bracket = RuntimeError("ERROR: insert violates foreign key [23503] on table x")
    assert isinstance(classify_db_error(bracket), ForeignKeyError)
    pg_style = RuntimeError("org.postgresql.util.PSQLException: ERROR 23505: duplicate key")
    assert isinstance(classify_db_error(pg_style), DuplicateKeyError)
