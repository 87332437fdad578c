"""Exactly-once streaming publication through the manifest warehouse.

Structured Streaming's file/kafka sinks are at-least-once per batch on
their own; the production exactly-once recipe is ``foreachBatch`` + an
idempotent transactional write keyed on ``batch_id`` (after a failure,
Spark REPLAYS the last uncommitted micro-batch with the same id — the
sink must make the replay a no-op). The reference's whole load is one
Postgres transaction (O18, src/database/data-source.ts:33-65); this
module is the streaming form of the same guarantee on plain parquet:
each micro-batch publishes atomically through the manifest pointer
(sinks/manifest.py), and the committed batch id rides INSIDE the same
pointer swap — data and ledger can never disagree.
"""

from __future__ import annotations

from tdei_extract_load_service_spark.sinks.manifest import (
    ManifestTxn,
    read_manifest,
)


def manifest_snapshot_sink(root: str, table: str, dataset_prefix: str = "b"):
    """Return a ``foreachBatch`` handler that publishes each
    COMPLETE-mode snapshot as one manifest transaction.

    The snapshot lands under dataset id ``<prefix><batch_id>`` and every
    older batch's dataset is deleted in the SAME transaction, so a
    reader's manifest snapshot always resolves the table to exactly one
    batch's directory — the batch id ledger IS the dataset key,
    published by the same atomic pointer swap as the data.

    Exactly-once: a replayed ``batch_id`` (<= the highest committed id)
    returns without writing — Spark re-runs the last micro-batch after
    recovery, and this guard is what turns the engine's at-least-once
    delivery into exactly-once publication. A crash BEFORE the pointer
    swap leaves only an orphaned staging directory (reaped by
    ``gc_orphans``); readers stay on the previous complete snapshot.

    Scale shape: the snapshot frame is an aggregate (|groups| rows —
    caller controls file count upstream); the commit itself is one
    small-file atomic replace regardless of data size.
    """

    def handle(batch_df, batch_id: int) -> None:
        manifest = read_manifest(root)
        existing = manifest["tables"].get(table, {})
        committed = [
            int(k[len(dataset_prefix):])
            for k in existing
            if k.startswith(dataset_prefix)
        ]
        if committed and max(committed) >= batch_id:
            return
        txn = ManifestTxn(root)
        try:
            for k in existing:
                txn.delete(table, k)
            txn.write(table, batch_df, f"{dataset_prefix}{batch_id}")
            txn.commit()
        except Exception:
            txn.abort()
            raise

    return handle
