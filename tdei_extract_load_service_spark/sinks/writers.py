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
  atomic rename into place — single-table replace with a two-rename
  visibility window on existing targets.
- For a single commit point covering SEVERAL sinks at once (the
  reference's one-transaction load), use ``sinks.manifest.ManifestTxn``:
  versioned directories + one atomic pointer-file swap, no rename of data
  paths at all.

JDBC writing (the reference's actual sink) is supported but not exercised
in tests (no Postgres in the container); the 1,000-row batch default is
carried from BULK_INSERT_BATCH_SIZE (environment.ts:26).
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame

from tdei_extract_load_service_spark.errors import classify_db_error

#: Reference default: BULK_INSERT_BATCH_SIZE (environment.ts:26).
DEFAULT_BATCH_SIZE = 1000

#: Per-sink-root locks: two concurrent write jobs on ONE root would collide
#: in the Hadoop committer's shared ``_temporary`` dir, so writes to the
#: same path serialize; writes to different sinks (different kinds,
#: different warehouses) overlap freely. The overwrite MODE is passed as a
#: per-write option, not a session conf, so no global serialization is
#: needed. Concurrent loads (queue consumer, maxConcurrentMessages=2)
#: overlap everything except same-table commits.
_PATH_LOCKS: dict[str, threading.Lock] = {}
_PATH_LOCKS_GUARD = threading.Lock()


def _path_lock(path: str) -> threading.Lock:
    with _PATH_LOCKS_GUARD:
        return _PATH_LOCKS.setdefault(os.path.abspath(path), threading.Lock())


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
        try:
            writer.mode(mode).save()
        except Exception as exc:  # noqa: BLE001 — normalize integrity codes (O21)
            raise classify_db_error(exc) from exc
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
    with _path_lock(path):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")  # per-write, not session conf
            .partitionBy(key_col, *extra_partition_cols)
            .parquet(path)
        )


def _replace_where_predicate(key_col: str, keys: list) -> str:
    """Render the ``replaceWhere`` predicate for a keyed overwrite.

    Strings are single-quoted with embedded quotes doubled (the one escape
    SQL string literals need); numerics render bare. Pure function so the
    dialect rendering is testable without the Delta package installed.
    """
    if not keys:
        raise ValueError("replaceWhere requires at least one key")

    def render(k) -> str:
        if isinstance(k, bool):
            raise TypeError("boolean partition keys are not supported")
        if isinstance(k, (int, float)):
            return repr(k)
        return "'" + str(k).replace("'", "''") + "'"

    return f"{key_col} IN ({', '.join(render(k) for k in keys)})"


#: ``overwrite_by_key_delta`` derives its replaceWhere keys from the frame
#: when the caller passes none — that collect is DRIVER state, so it is
#: bounded: above this many distinct keys the predicate would be a
#: multi-megabyte SQL string and the collect a scale hazard; callers
#: replacing that many partitions should pass ``keys`` explicitly (they
#: know the set without a scan) or use a full overwrite.
MAX_REPLACE_KEYS = 10_000


def _collect_replace_keys(df: DataFrame, key_col: str, max_keys: int) -> list:
    """Distinct key values of ``df``, bounded collect (pure helper so the
    bound is testable without the Delta package): reads at most
    ``max_keys + 1`` rows and raises beyond the bound instead of hauling
    an unbounded key set onto the driver."""
    rows = df.select(key_col).distinct().limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        raise ValueError(
            f"overwrite_by_key_delta: more than {max_keys} distinct "
            f"{key_col!r} values — pass keys= explicitly (or raise "
            "max_keys) rather than deriving a predicate this large from "
            "a full distinct scan"
        )
    return [r[0] for r in rows]


def overwrite_by_key_delta(
    df: DataFrame,
    path: str,
    key_col: str = "tdei_dataset_id",
    keys: list | None = None,
    extra_partition_cols: tuple[str, ...] = (),
    max_keys: int = MAX_REPLACE_KEYS,
) -> None:
    """``overwrite_by_key`` with true single-commit-point semantics: Delta's
    ``replaceWhere`` replaces the key's rows and commits one transaction-log
    entry, so concurrent readers see either the old or the new version —
    never the missing-directory window of the two-rename parquet path
    (``staged_swap_write`` docstring).

    Optional dependency: requires the ``delta-spark`` package and a session
    with the Delta catalog extensions; raises ``NotImplementedError`` with
    the enable recipe otherwise. The parquet-based ``overwrite_by_key``
    remains the dependency-free default.

    ``keys``: the key values being replaced. Defaults to the distinct
    values in ``df`` — a collect bounded at ``max_keys``
    (``MAX_REPLACE_KEYS``): one value per dataset in the reference's
    per-message flow, but a caller pointing this at an arbitrary frame
    gets a ValueError instead of an unbounded driver collect and a
    multi-megabyte predicate.
    """
    try:
        import delta  # noqa: F401
    except ImportError as exc:  # pragma: no cover - exercised via test skip
        raise NotImplementedError(
            "overwrite_by_key_delta requires delta-spark: install it and build "
            "the session with delta.configure_spark_with_delta_pip(builder) + "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        ) from exc
    if keys is None:
        keys = _collect_replace_keys(df, key_col, max_keys)
        if not keys:
            return  # nothing to replace, nothing to write
    predicate = _replace_where_predicate(key_col, keys)
    with _path_lock(path):
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", predicate)
            .partitionBy(key_col, *extra_partition_cols)
            .save(path)
        )


#: Dialect rename statements for ``jdbc_staged_swap``. The reference's
#: actual sink is Postgres (data-source.ts), whose rename is the ALTER
#: form; Derby (the embedded test engine) and MySQL use RENAME TABLE.
RENAME_SQL_DERBY = "RENAME TABLE {src} TO {dst}"
RENAME_SQL_POSTGRES = "ALTER TABLE {src} RENAME TO {dst}"


def jdbc_staged_swap(
    spark,
    jdbc_url: str,
    df: DataFrame,
    final_table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    jdbc_options: dict[str, str] | None = None,
    rename_sql: str = RENAME_SQL_DERBY,
    drop_before_rename: bool = True,
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

    Dialect requirement: the swap is only atomic on TRANSACTIONAL-DDL
    engines (Postgres, Derby, SQL Server). On autocommit-DDL dialects
    (MySQL, Oracle) the DROP commits immediately and a failure before the
    rename loses the live table — use the dialect's single-statement
    atomic swap there (MySQL ``RENAME TABLE a TO tmp, b TO a``) via
    ``rename_sql``, with DROP disabled by ``drop_before_rename=False``.

    Integrity failures during the bulk load surface as typed
    DuplicateKeyError / ForeignKeyError (O21, data-source.ts:96-107).
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
        # case-insensitive existence probe: JDBC metadata stores unquoted
        # identifiers in the dialect's folding case (Derby/Oracle upper,
        # Postgres lower) — try the exact name plus both foldings
        final_exists = False
        for candidate in {final_table, final_table.upper(), final_table.lower()}:
            meta = conn.getMetaData().getTables(None, None, candidate, None)
            if meta.next():
                final_exists = True
                break
        if final_exists and drop_before_rename:
            stmt.execute(f"DROP TABLE {final_table}")
        stmt.execute(rename_sql.format(src=staging, dst=final_table))
        conn.commit()
    except Exception as exc:
        conn.rollback()
        raise classify_db_error(exc) from exc
    finally:
        conn.close()


def blob_upload_layout(
    df: DataFrame,
    base_path: str,
    project_col: str = "project_group_id",
    record_col: str = "record_id",
    ts_col: str | None = None,
    hive_style: bool = False,
    mode: str = "append",
) -> None:
    """Blob-upload sink with the reference's date-partitioned folder scheme
    (storage-service.ts:13-19): ``{year}/{month}/{project}/{record}/...``,
    month NOT zero-padded (JS ``getMonth()+1``).

    ``ts_col`` supplies the partition date per row (the reference stamps
    upload time — pass an ingest-timestamp column for the same effect;
    default uses the session clock via ``current_timestamp()``). The write
    is a normal ``partitionBy`` (executors write straight into their
    partition directories — no extra shuffle beyond what the caller
    provides), and with ``hive_style=False`` the driver then renames the
    ``year=2026`` style directory levels to the raw ``2026`` form for
    byte-for-byte layout parity. The rename pass is driver-side metadata
    work proportional to the number of partition DIRECTORIES (not rows or
    files) — the same order of work the Hadoop commit protocol already
    does per job.
    """
    from pyspark.sql import functions as F

    ts = F.col(ts_col) if ts_col else F.current_timestamp()
    out = df.withColumn("year", F.year(ts)).withColumn("month", F.month(ts))
    cols = ("year", "month", project_col, record_col)
    out.write.mode(mode).partitionBy(*cols).parquet(base_path)
    if hive_style:
        return
    # flatten k=v directory names level by level, depth-first so children
    # are renamed before their parents' paths change. A second append into
    # an already-flattened base finds the raw target directory existing
    # (e.g. '2026' from the prior call) — merge-move the children into it
    # instead of renaming the directory itself, which would raise
    # ENOTEMPTY mid-walk and leave a mixed half-renamed layout.
    levels: list[tuple[str, int]] = [(base_path, 0)]
    while levels:
        current, depth = levels.pop()
        if depth >= len(cols):
            continue
        prefix = f"{cols[depth]}="
        for name in sorted(os.listdir(current)):
            full = os.path.join(current, name)
            if not (os.path.isdir(full) and name.startswith(prefix)):
                continue
            raw = os.path.join(current, name[len(prefix):])
            _merge_move(full, raw)
            levels.append((raw, depth + 1))


def _merge_move(src: str, dst: str) -> None:
    """Move ``src`` to ``dst``; when ``dst`` already exists as a directory,
    recursively merge the children (part-file names are task-unique, so
    real collisions only happen for marker files, which last-write-wins)."""
    if not os.path.exists(dst):
        os.rename(src, dst)
        return
    if os.path.isfile(src) or os.path.isfile(dst):
        os.replace(src, dst)
        return
    for child in os.listdir(src):
        _merge_move(os.path.join(src, child), os.path.join(dst, child))
    os.rmdir(src)


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


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Small-files compaction for long-lived sinks. Incremental loads
    write one file per task per job; thousands of loads leave a table in
    KB-sized fragments whose per-file open/footer costs dominate scans.
    Rewrites the table at ~``target_file_bytes`` per file (the
    scan-efficient size; 128 MB default matches HDFS/object-store sweet
    spots) with staged-swap visibility — readers see the old layout until
    the swap. Returns the new file count.

    The read streams straight into the staged write (one pass, no
    collect); partitioned tables re-cluster within ``partition_by`` so
    partition pruning is preserved.
    """
    import math

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    out = (
        df.repartition(n_files, *partition_by) if partition_by else df.repartition(n_files)
    )
    staged_swap_write(out, path, partition_by=partition_by)
    return n_files


def staged_swap_write(
    df: DataFrame,
    final_path: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Transaction-boundary analogue (O18, data-source.ts:33-65): write the
    full output to a staging directory, then rename into place. Any
    failure leaves ``final_path`` with valid data (rollback = delete
    staging; a failure between the two renames of the existing-target path
    restores the displaced previous output).

    Atomicity note: each rename is atomic on HDFS/local FS, but replacing
    an EXISTING target takes two renames (old out, staging in) — readers
    racing that window can observe a missing ``final_path``. When true
    single-commit-point semantics over concurrent readers are required,
    use ``sinks.manifest.ManifestTxn`` (dependency-free pointer-swap
    commit, also multi-table) or a catalog-backed sink (Delta/Iceberg
    ``replaceWhere``); this function is the simplest form whose
    crash-recovery guarantee is "final_path, if present, is always a
    complete dataset".
    """
    staging = f"{final_path}.staging-{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    old: str | None = None
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
        # roll back: if the previous output was displaced but the new one
        # did not land, put the previous output back
        if old is not None and os.path.exists(old) and not os.path.exists(final_path):
            os.rename(old, final_path)
        shutil.rmtree(staging, ignore_errors=True)
        raise
