"""Queue-driven mode: Structured Streaming consumer over request messages.

Reshapes the reference's always-on service-bus subscription (O1,
queue-service.ts:38-61, topics src/subscriptions.json:2-8) as a streaming
source + ``foreachBatch``: each micro-batch of extract-load request
messages triggers the batch ``load_dataset`` job, and a response message is
published per request (O20, extract-load-service.ts:854-861).

Sources are pluggable behind ``run_queue_consumer(request_stream=...)``:
``request_stream_from_files`` is the dependency-free stand-in,
``request_stream_from_kafka`` the broker ingress (gated on the
spark-sql-kafka connector); both feed the identical ``process_request`` /
response-publish contract. Bounded intake (``maxFilesPerTrigger`` /
``maxOffsetsPerTrigger``) carries over MAX_CONCURRENT_MESSAGES=2
(environment.ts:12, applied queue-service.ts:29).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.plans.load_dataset import load_dataset

#: Request message schema (README.md:61-71; ExtractLoadRequest
#: extract-load-service.ts:22-29).
REQUEST_SCHEMA = (
    "messageId string, messageType string, "
    "data struct<data_type string, file_upload_path string, "
    "tdei_dataset_id string, user_id string>"
)

#: data_type dispatch (O2, extract-load-service.ts:242-260): flex and
#: pathways are declared but unimplemented in the reference (:269-274).
SUPPORTED_DATA_TYPES = {"osw"}


def process_request(
    spark: SparkSession, message: dict, warehouse: str, commit_mode: str = "partition"
) -> dict:
    """Dispatch one request message (O2) and build the response message.

    ``commit_mode="manifest"`` runs each load with the single-commit-point
    manifest warehouse (``sinks/manifest.py``) — the visibility contract of
    the reference's one DB transaction per message."""
    data = message.get("data") or {}
    data_type = data.get("data_type")
    if data_type not in SUPPORTED_DATA_TYPES:
        # reference behavior: flex/pathways throw "Method not implemented."
        result_success, result_message = False, f"Method not implemented for data_type: {data_type}"
    else:
        result = load_dataset(
            spark,
            archive_path=data["file_upload_path"],
            tdei_dataset_id=data["tdei_dataset_id"],
            user_id=data.get("user_id", ""),
            warehouse=warehouse,
            commit_mode=commit_mode,
        )
        result_success, result_message = result.success, result.message
    # response format: the request mutated with success/message
    # (README.md:75-84, publishMessage extract-load-service.ts:854-861)
    return {
        **message,
        "data": {**data, "success": result_success, "message": result_message},
    }


def request_stream_from_files(
    spark: SparkSession, request_dir: str, max_messages_per_trigger: int = 2
) -> DataFrame:
    """File-directory request source — the dependency-free broker stand-in.
    One JSON file per message; ``maxFilesPerTrigger`` carries the
    reference's maxConcurrentMessages intake bound."""
    return (
        spark.readStream.schema(REQUEST_SCHEMA)
        .option("maxFilesPerTrigger", str(max_messages_per_trigger))
        .json(request_dir)
    )


def decode_broker_requests(raw: DataFrame) -> DataFrame:
    """Broker frame (binary ``value`` payloads — Kafka's shape, also Event
    Hubs/Service Bus adapters) -> REQUEST_SCHEMA columns.

    Split from the source builder so the payload contract is testable
    without a broker on the classpath: the same expression must decode a
    batch DataFrame of encoded messages to exactly what the file source
    reads. Malformed payloads parse (PERMISSIVE) to an all-null record —
    dropped on the required ``messageId`` (the reference nacks
    unparseable messages, queue-service.ts:44-52)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), REQUEST_SCHEMA).alias("m")
    )
    return parsed.where(F.col("m.messageId").isNotNull()).select("m.*")


def request_stream_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int = 2,
) -> DataFrame:
    """Kafka request source mirroring the reference's broker ingress
    (queue-service.ts:38-61): same message payloads, same downstream
    ``process_request`` seam, intake bounded per trigger.

    Requires the spark-sql-kafka connector on the JVM classpath (shipped
    separately from pyspark); raises ``NotImplementedError`` when absent
    so deployments without the jar fail at build time, not mid-stream.
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
            .load()
        )
    except Exception as exc:  # connector jar absent -> DATA_SOURCE_NOT_FOUND
        raise NotImplementedError(
            "Kafka source requires the spark-sql-kafka-0-10 connector on the "
            "Spark classpath (--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        ) from exc
    return decode_broker_requests(raw)


def run_queue_consumer(
    spark: SparkSession,
    request_dir: str | None = None,
    response_dir: str = "",
    warehouse: str = "",
    checkpoint_dir: str = "",
    max_messages_per_trigger: int = 2,
    available_now: bool = True,
    request_stream: DataFrame | None = None,
    commit_mode: str = "partition",
) -> None:
    """Consume request messages, run loads, publish responses.

    ``available_now=True`` drains the backlog and stops (test/batch mode);
    ``False`` runs continuously like the reference service. The source is
    pluggable: pass ``request_stream`` (any streaming DataFrame with
    REQUEST_SCHEMA columns — ``request_stream_from_kafka`` for broker
    deployments) or let ``request_dir`` build the file source.
    ``commit_mode`` is forwarded to every load ("manifest" = one atomic
    pointer swap per message, the reference's per-message transaction).
    """
    # validate args BEFORE any side effect: a missing source or an empty
    # response_dir should be a clear ValueError, not a bare
    # FileNotFoundError from makedirs("")
    if request_stream is None and request_dir is None:
        raise ValueError("pass request_dir or request_stream")
    if not response_dir:
        raise ValueError("response_dir is required (responses are written there)")
    os.makedirs(response_dir, exist_ok=True)
    if request_stream is not None:
        stream = request_stream
    else:
        stream = request_stream_from_files(spark, request_dir, max_messages_per_trigger)

    def handle_batch(batch_df, batch_id: int) -> None:
        # messages are jobs: each drives a full distributed load; the
        # driver-side pool is the queue handler, not a data path. The
        # reference runs its <=2 messages CONCURRENTLY
        # (maxConcurrentMessages, queue-service.ts:29) — mirrored here with
        # a thread per message: the loads are independent Spark actions and
        # the scheduler interleaves their stages (FAIR pool would also
        # round-robin; FIFO still overlaps at stage granularity).
        from concurrent.futures import ThreadPoolExecutor

        def run_one(message: dict) -> None:
            response = process_request(spark, message, warehouse, commit_mode)
            out = os.path.join(response_dir, f"response-{batch_id}-{uuid.uuid4().hex}.json")
            with open(out, "w") as fh:
                json.dump(response, fh)

        messages = [row.asDict(recursive=True) for row in batch_df.collect()]
        if not messages:
            return
        with ThreadPoolExecutor(max_workers=max_messages_per_trigger) as pool:
            list(pool.map(run_one, messages))

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    query = (
        writer.trigger(availableNow=True) if available_now else writer.trigger(processingTime="5 seconds")
    ).start()
    if available_now:
        query.awaitTermination()
