"""Sinks: batched writes, key-scoped overwrite, staging-and-swap.

Replaces the reference's seven near-identical 38-line bulk-insert methods
(O12, extract-load-service.ts:357-844) with ONE parameterized writer, and
its delete-then-reload-inside-a-transaction pattern (O17/O18,
:290-295 + data-source.ts:33-65) with two Spark-native atomicity patterns:

- ``overwrite_by_key``: dynamic partition overwrite — rewriting exactly the
  partitions present in the incoming frame (per-dataset replace) and
  leaving all other datasets' partitions untouched; the swap of each
  partition directory is the commit point.
- ``staged_swap_write``: write everything to a staging location, then one
  atomic rename into place — the multi-table transaction analogue when a
  single commit point must cover several sinks.

JDBC writing (the reference's actual sink) is supported but not exercised
in tests (no Postgres in the container); the 1,000-row batch default is
carried from BULK_INSERT_BATCH_SIZE (environment.ts:26).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

#: Reference default: BULK_INSERT_BATCH_SIZE (environment.ts:26).
DEFAULT_BATCH_SIZE = 1000


def write_batched(
    df: DataFrame,
    path: str | None = None,
    jdbc_url: str | None = None,
    table: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    partition_by: tuple[str, ...] = (),
    mode: str = "append",
    jdbc_options: dict[str, str] | None = None,
) -> None:
    """The single parameterized writer behind all seven per-kind sinks.

    Parquet path: columnar files, optionally partitioned (partition pruning
    on read). JDBC path: multi-row batched INSERTs; parallelism = number of
    DataFrame partitions, so callers bound DB connections by coalescing
    (the reference bounds its pool at 20, environment.ts:21 — on Spark,
    ``df.coalesce(n)`` is that knob).
    """
    if jdbc_url is not None:
        if table is None:
            raise ValueError("table is required for the JDBC sink")
        writer = (
            df.write.format("jdbc")
            .option("url", jdbc_url)
            .option("dbtable", table)
            .option("batchsize", str(batch_size))
        )
        for k, v in (jdbc_options or {}).items():
            writer = writer.option(k, v)
        writer.mode(mode).save()
        return
    if path is None:
        raise ValueError("either path or jdbc_url must be given")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_by_key(
    df: DataFrame,
    path: str,
    key_col: str = "tdei_dataset_id",
    extra_partition_cols: tuple[str, ...] = (),
) -> None:
    """Idempotent delete-then-reload keyed on ``key_col`` (O17,
    ``delete_dataset_records_by_id`` extract-load-service.ts:290-295).

    Dynamic partition overwrite rewrites only the partitions present in
    ``df`` — a re-run of the same dataset replaces exactly that dataset's
    directory, other datasets are untouched, and readers see the old data
    until each partition's swap commits.
    """
    spark = df.sparkSession
    previous = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(key_col, *extra_partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", previous)


def jdbc_staged_swap(
    spark,
    jdbc_url: str,
    df: DataFrame,
    final_table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    jdbc_options: dict[str, str] | None = None,
    rename_sql: str = "RENAME TABLE {src} TO {dst}",
) -> None:
    """Transactional table replace over JDBC — the O18 analogue
    (runInTransaction, reference data-source.ts:33-65) for relational
    sinks, where Spark's JDBC writer has no cross-statement transaction.

    Pattern: bulk-load a staging table with the distributed writer, then
    one short driver-side DB transaction (java.sql via the JVM gateway)
    drops the old table and renames staging into place. Readers see the
    old data until the commit; a failure anywhere before it leaves the
    final table untouched (rollback = drop staging).

    ``rename_sql`` is dialect-specific: Derby/MySQL ``RENAME TABLE a TO b``,
    Postgres ``ALTER TABLE a RENAME TO b``.
    """
    staging = f"{final_table}_staging"
    write_batched(
        df,
        jdbc_url=jdbc_url,
        table=staging,
        batch_size=batch_size,
        mode="overwrite",
        jdbc_options=jdbc_options,
    )
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(jdbc_url)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        meta = conn.getMetaData().getTables(None, None, final_table.upper(), None)
        final_exists = meta.next()
        if final_exists:
            stmt.execute(f"DROP TABLE {final_table}")
        stmt.execute(rename_sql.format(src=staging, dst=final_table))
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def delete_by_key(path: str, key_value: str, key_col: str = "tdei_dataset_id") -> None:
    """Remove one key's partition directory from a sink — the engine's form
    of the pre-load ``delete_dataset_records_by_id`` stored procedure (O17,
    extract-load-service.ts:290-295), which wipes ALL prior rows of the
    dataset. Dynamic overwrite alone can't do this: it only replaces
    partitions present in the *new* data, so a kind that disappeared on
    reload would otherwise leave stale rows.

    Local/HDFS-path implementation (directory remove); on object stores or
    catalog tables use ``DELETE WHERE`` / Delta ``replaceWhere`` — same
    contract.
    """
    part_dir = os.path.join(path, f"{key_col}={key_value}")
    if os.path.exists(part_dir):
        shutil.rmtree(part_dir)


def staged_swap_write(
    df: DataFrame,
    final_path: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Transaction-boundary analogue (O18, data-source.ts:33-65): write the
    full output to a staging directory, then one atomic rename into place.
    Any failure leaves the previous ``final_path`` untouched (rollback =
    delete staging).

    On HDFS/local FS the rename is atomic; on object stores use a metadata
    catalog (Delta/Iceberg ``replaceWhere``) for the same commit semantics —
    this function is the dependency-free form.
    """
    staging = f"{final_path}.staging-{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.parquet(staging)
        if os.path.exists(final_path):
            old = f"{final_path}.old-{uuid.uuid4().hex}"
            os.rename(final_path, old)
            os.rename(staging, final_path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(staging, final_path)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
