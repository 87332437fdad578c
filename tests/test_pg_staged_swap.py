"""Live-Postgres staged-swap round trip (VERDICT r4 #7).

The reference's actual sink is Postgres (``src/database/data-source.ts``);
the Derby suite (test_jdbc_staged_swap.py) proves the transaction logic
against an embedded engine, and this suite repeats the same assertions
against a REAL ``postgresql://`` server the moment an environment provides
one. Gated on ``SPARK_GRAFT_PG_URL`` — e.g.::

    export SPARK_GRAFT_PG_URL='jdbc:postgresql://host:5432/db?user=u&password=p'

(The Postgres JDBC driver jar must also be on the Spark classpath:
``--jars postgresql-<ver>.jar`` or spark.jars.packages
``org.postgresql:postgresql:42.7.3``.) Skipped — visibly, not silently —
when the variable is unset, so CI environments without a database still
run green while recording that the live round-trip is pending.
"""

from __future__ import annotations

import os
import uuid

import pytest

from tdei_extract_load_service_spark.sinks.writers import (
    RENAME_SQL_POSTGRES,
    jdbc_staged_swap,
)

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL", "")

pytestmark = pytest.mark.skipif(
    not PG_URL,
    reason="set SPARK_GRAFT_PG_URL to a jdbc:postgresql:// URL to run the "
    "live-Postgres staged-swap round trip",
)


def _read(spark, table):
    return (
        spark.read.format("jdbc").option("url", PG_URL).option("dbtable", table).load()
    )


@pytest.fixture()
def table():
    name = f"swap_rt_{uuid.uuid4().hex[:10]}"
    yield name
    # best-effort cleanup of the final + staging tables
    try:
        import py4j  # noqa: F401
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        conn = spark._jvm.java.sql.DriverManager.getConnection(PG_URL)
        stmt = conn.createStatement()
        for t in (name, f"{name}_staging"):
            stmt.execute(f"DROP TABLE IF EXISTS {t}")
        conn.close()
    except Exception:
        pass


def test_pg_swap_creates_then_replaces(spark, table):
    v1 = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    jdbc_staged_swap(spark, PG_URL, v1, table, rename_sql=RENAME_SQL_POSTGRES)
    assert {(r.k, r.v) for r in _read(spark, table).collect()} == {("a", "1"), ("b", "2")}

    v2 = spark.createDataFrame([("c", "3")], "k string, v string")
    jdbc_staged_swap(spark, PG_URL, v2, table, rename_sql=RENAME_SQL_POSTGRES)
    assert {(r.k, r.v) for r in _read(spark, table).collect()} == {("c", "3")}


def test_pg_failed_staging_leaves_final_intact(spark, table):
    good = spark.createDataFrame([("keep", "me")], "k string, v string")
    jdbc_staged_swap(
        spark, PG_URL, good, table, rename_sql=RENAME_SQL_POSTGRES,
        jdbc_options={"createTableColumnTypes": "k VARCHAR(32), v VARCHAR(8)"},
    )
    bad = spark.createDataFrame([("x", "y" * 1000)], "k string, v string")
    with pytest.raises(Exception):
        jdbc_staged_swap(
            spark, PG_URL, bad, table, rename_sql=RENAME_SQL_POSTGRES,
            jdbc_options={"createTableColumnTypes": "k VARCHAR(32), v VARCHAR(8)"},
        )
    assert [(r.k, r.v) for r in _read(spark, table).collect()] == [("keep", "me")]


def test_pg_sqlstate_maps_to_typed_errors(spark, table):
    """Integrity SQLSTATEs from a real PG server normalize to the typed
    errors (O21, data-source.ts:96-107): unique violation -> 23505."""
    from tdei_extract_load_service_spark.errors import DuplicateKeyError
    from tdei_extract_load_service_spark.sinks.writers import write_batched

    v1 = spark.createDataFrame([("a", "1")], "k string, v string")
    jdbc_staged_swap(
        spark, PG_URL, v1, table, rename_sql=RENAME_SQL_POSTGRES,
        jdbc_options={"createTableColumnTypes": "k VARCHAR(32) PRIMARY KEY, v VARCHAR(32)"},
    )
    dup = spark.createDataFrame([("a", "2")], "k string, v string")
    with pytest.raises(DuplicateKeyError):
        write_batched(dup, jdbc_url=PG_URL, table=table, mode="append")
