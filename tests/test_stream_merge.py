"""Streaming MERGE sink (12th certification) — exactly-once and
resume pins for streaming/sink.manifest_merge_sink and the
merge_shadow harness."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import functions as F


def _seed(spark, root, rows):
    from tdei_extract_load_service_spark.sinks.manifest import ManifestTxn

    seed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "balance"])
    )
    txn = ManifestTxn(root)
    txn.write("balances", seed.coalesce(1), "seed")
    txn.commit()


def _handler(root):
    from tdei_extract_load_service_spark.streaming.sink import (
        manifest_merge_sink,
    )

    return manifest_merge_sink(
        root, "balances", "user_id", ("ts", "event_id"), "op", "balance",
        delete_op="D",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["user_id", "ts", "event_id", "op", "balance"]
        )
    )


def _state(spark, root):
    from tdei_extract_load_service_spark.sinks.manifest import read_table

    return {
        r["user_id"]: r["balance"]
        for r in read_table(spark, root, "balances").collect()
    }


def test_merge_sink_arms_and_sequencing(spark):
    root = tempfile.mkdtemp(prefix="merge_sink_test_")
    _seed(spark, root, [(1, 10.0), (2, 20.0), (3, 30.0)])
    handle = _handler(root)
    # batch 0: update 1, delete 2, insert 9; within-batch replay rows
    # for user 1 (latest event_id wins); delete of ABSENT key 7 must
    # NOT resurrect as an insert (the conditional-insert arm)
    handle(
        _batch(
            spark,
            [
                (1, 100, 1, "U", 11.0),
                (1, 100, 2, "U", 12.0),
                (2, 100, 3, "D", 0.0),
                (9, 100, 4, "U", 90.0),
                (7, 100, 5, "D", 0.0),
            ],
        ),
        0,
    )
    assert _state(spark, root) == {1: 12.0, 3: 30.0, 9: 90.0}
    # batch 1: re-insert the deleted key, update the inserted one
    handle(
        _batch(spark, [(2, 200, 6, "U", 21.0), (9, 200, 7, "U", 91.0)]), 1
    )
    assert _state(spark, root) == {1: 12.0, 2: 21.0, 3: 30.0, 9: 91.0}


def test_merge_sink_replayed_batch_is_noop(spark):
    from tdei_extract_load_service_spark.sinks.manifest import read_manifest

    root = tempfile.mkdtemp(prefix="merge_sink_test_")
    _seed(spark, root, [(1, 10.0)])
    handle = _handler(root)
    handle(_batch(spark, [(1, 100, 1, "U", 11.0)]), 0)
    txn_after = read_manifest(root)["txn"]
    # Spark re-delivers the last micro-batch after recovery — possibly
    # with DIFFERENT (corrupted/partial) content; the ledger, not the
    # payload, decides
    handle(_batch(spark, [(1, 999, 9, "U", 666.0)]), 0)
    assert _state(spark, root) == {1: 11.0}
    assert read_manifest(root)["txn"] == txn_after  # no new commit
    # ledger: exactly one live dataset, keyed by the committed batch
    live = read_manifest(root)["tables"]["balances"]
    assert list(live) == ["b0"]


def test_merge_sink_tolerates_non_batch_dataset_keys(spark):
    """ADVICE r11: a dataset key that starts with the batch prefix but
    has a non-integer suffix (a seed named 'baseline' under the default
    prefix 'b') is NOT a ledger row — it must be skipped, not
    int()-crash the stream on every batch."""
    from tdei_extract_load_service_spark.sinks.manifest import ManifestTxn

    root = tempfile.mkdtemp(prefix="merge_sink_test_")
    seed = spark.createDataFrame(
        pd.DataFrame([(1, 10.0)], columns=["user_id", "balance"])
    )
    txn = ManifestTxn(root)
    txn.write("balances", seed.coalesce(1), "baseline")
    txn.commit()
    handle = _handler(root)
    handle(_batch(spark, [(1, 100, 1, "U", 11.0)]), 0)
    assert _state(spark, root) == {1: 11.0}
    # replay still a no-op with the odd key present
    handle(_batch(spark, [(1, 999, 9, "U", 666.0)]), 0)
    assert _state(spark, root) == {1: 11.0}


def test_merge_shadow_drain_resume_converges(spark):
    """Kill the stream after two micro-batches, resume on the SAME
    checkpoint with the full stage visible: offsets skip the committed
    prefix and the final table equals the uninterrupted run's."""
    from tdei_extract_load_service_spark.sinks.manifest import (
        ManifestTxn,
        read_manifest,
        read_table,
    )
    from tdei_extract_load_service_spark.streaming.shadow import (
        stage_event_stream,
    )
    from tdei_extract_load_service_spark.streaming.sink import (
        manifest_merge_sink,
    )

    sf_dir = "/root/testdata/sf0.001"
    full_stage = stage_event_stream(spark, sf_dir, n_batches=4)
    files = sorted(
        f for f in os.listdir(full_stage) if f.endswith(".parquet")
    )
    assert len(files) == 4
    part_stage = tempfile.mkdtemp(prefix="merge_resume_stage_")
    for f in files[:2]:
        shutil.copy2(
            os.path.join(full_stage, f), os.path.join(part_stage, f)
        )
    root = tempfile.mkdtemp(prefix="merge_resume_root_")
    seed = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_acctbal").alias("balance"),
    )
    txn = ManifestTxn(root)
    txn.write("balances", seed.coalesce(1), "seed")
    txn.commit()
    ckpt = f"/tmp/spark_graft_stream_ckpt/merge_resume_{uuid.uuid4().hex[:12]}"
    schema = spark.read.parquet(full_stage).schema

    def _leg():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(part_stage)
            .select(
                "user_id", "ts", "event_id",
                F.col("event_type").alias("op"),
                F.col("value").alias("balance"),
            )
        )
        q = (
            src.writeStream.foreachBatch(
                manifest_merge_sink(
                    root, "balances", "user_id", ("ts", "event_id"),
                    "op", "balance", delete_op="error",
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _leg()  # drains the two visible files, then terminates
    assert list(read_manifest(root)["tables"]["balances"]) == ["b1"]
    for f in files[2:]:
        shutil.copy2(
            os.path.join(full_stage, f), os.path.join(part_stage, f)
        )
    _leg()  # resume: same checkpoint, batches 2..3 only
    assert list(read_manifest(root)["tables"]["balances"]) == ["b3"]
    resumed = {
        r["user_id"]: r["balance"]
        for r in read_table(spark, root, "balances").collect()
    }
    # uninterrupted reference run on a fresh root/checkpoint
    from tdei_extract_load_service_spark.streaming.shadow import merge_shadow

    reference = {
        r["user_id"]: r["balance"]
        for r in merge_shadow(spark, sf_dir, n_batches=4).collect()
    }
    assert resumed == reference
