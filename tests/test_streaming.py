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
