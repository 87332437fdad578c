"""Transactional stage-and-swap over JDBC (O18 parity) against Derby."""

from __future__ import annotations

import pytest

from tdei_extract_load_service_spark.sinks.writers import jdbc_staged_swap

TYPES = {"createTableColumnTypes": "k VARCHAR(32), v VARCHAR(128)"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_swap") / "swapdb"
    return f"jdbc:derby:{db};create=true"


def _read(spark, url, table):
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).load()


def test_swap_creates_then_replaces(spark, derby_url):
    v1 = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    jdbc_staged_swap(spark, derby_url, v1, "swap_target", jdbc_options=TYPES)
    assert {(r.k, r.v) for r in _read(spark, derby_url, "swap_target").collect()} == {("a", "1"), ("b", "2")}

    v2 = spark.createDataFrame([("c", "3")], "k string, v string")
    jdbc_staged_swap(spark, derby_url, v2, "swap_target", jdbc_options=TYPES)
    assert {(r.k, r.v) for r in _read(spark, derby_url, "swap_target").collect()} == {("c", "3")}


def test_failed_staging_leaves_final_intact(spark, derby_url):
    import pyspark.sql.functions as F

    good = spark.createDataFrame([("keep", "me")], "k string, v string")
    jdbc_staged_swap(spark, derby_url, good, "swap_safe", jdbc_options=TYPES)
    # a staging write that fails mid-flight (value too long for VARCHAR)
    bad = spark.createDataFrame([("x", "y" * 1000)], "k string, v string")
    with pytest.raises(Exception):
        jdbc_staged_swap(spark, derby_url, bad, "swap_safe", jdbc_options=TYPES)
    # the final table still serves the previous version
    assert [(r.k, r.v) for r in _read(spark, derby_url, "swap_safe").collect()] == [("keep", "me")]


def test_rename_sql_dialect_parameterization(spark, derby_url):
    """The dialect string is a real parameter: passing Derby's syntax
    explicitly works, and the Postgres dialect constant renders the
    reference's actual sink statement (data-source.ts sink dialect)."""
    from tdei_extract_load_service_spark.sinks.writers import (
        RENAME_SQL_DERBY,
        RENAME_SQL_POSTGRES,
    )

    assert RENAME_SQL_POSTGRES.format(src="t_staging", dst="t") == (
        "ALTER TABLE t_staging RENAME TO t"
    )
    df = spark.createDataFrame([("p", "q")], "k string, v string")
    jdbc_staged_swap(
        spark, derby_url, df, "swap_dialect", jdbc_options=TYPES, rename_sql=RENAME_SQL_DERBY
    )
    assert [(r.k, r.v) for r in _read(spark, derby_url, "swap_dialect").collect()] == [("p", "q")]


def test_wrong_dialect_string_rolls_back(spark, derby_url):
    """Running the POSTGRES rename against Derby exercises the full
    statement-construction + execute path with the reference's dialect
    string; the engine rejects the syntax and the swap must roll back,
    leaving the live table serving the previous version."""
    from tdei_extract_load_service_spark.sinks.writers import RENAME_SQL_POSTGRES

    v1 = spark.createDataFrame([("live", "1")], "k string, v string")
    jdbc_staged_swap(spark, derby_url, v1, "swap_pg", jdbc_options=TYPES)
    v2 = spark.createDataFrame([("next", "2")], "k string, v string")
    with pytest.raises(Exception):
        jdbc_staged_swap(
            spark, derby_url, v2, "swap_pg", jdbc_options=TYPES, rename_sql=RENAME_SQL_POSTGRES
        )
    assert [(r.k, r.v) for r in _read(spark, derby_url, "swap_pg").collect()] == [("live", "1")]


def test_overwrite_by_key_failed_job_leaves_old_data(spark, tmp_path):
    """Atomicity of the file-layout keyed overwrite: a write job that
    FAILS mid-flight (task exception during the new data's computation)
    must leave the previously committed dataset fully readable — the
    commit point is the partition-directory swap, which never runs for an
    aborted job."""
    import pytest
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.sinks.writers import overwrite_by_key

    path = str(tmp_path / "atomic_sink")
    v1 = spark.range(100).select(
        F.lit("ds-a").alias("tdei_dataset_id"),
        F.col("id").alias("n"),
        F.lit("v1").alias("payload"),
    )
    overwrite_by_key(v1, path)
    assert spark.read.parquet(path).where("payload = 'v1'").count() == 100

    poisoned = spark.range(100).select(
        F.lit("ds-a").alias("tdei_dataset_id"),
        F.col("id").alias("n"),
        F.when(F.col("id") < 50, F.lit("v2")).otherwise(
            F.raise_error(F.lit("injected mid-job failure"))
        ).alias("payload"),
    )
    with pytest.raises(Exception, match="injected"):
        overwrite_by_key(poisoned, path)

    # the failed overwrite committed nothing: v1 fully intact, no v2 rows
    after = spark.read.parquet(path)
    assert after.where("payload = 'v1'").count() == 100
    assert after.where("payload = 'v2'").count() == 0
