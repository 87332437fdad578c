"""Many-archive ETL smoke (VERDICT r3 #6): the 100 TB ETL story is "many
archives parallelize naturally" — measure it through the queue consumer.

Builds N archives (2 entries x 10k features each, same shape as the
bench corpus), enqueues N request messages, and drains them with
``run_queue_consumer`` at maxConcurrentMessages=2. Reports wall-clock,
per-archive rate vs the 3-archive sequential bench rate, and verifies
every response succeeded and every dataset's rows landed.

Usage: python tools/many_archive_smoke.py [n_archives] (default 100)
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FEATURES = 10_000


def build_archives(root: str, n: int) -> None:
    os.makedirs(root, exist_ok=True)
    per_kind = FEATURES // 2
    for a in range(n):
        path = os.path.join(root, f"many{a}.zip")
        if os.path.exists(path):
            continue
        nodes = {
            "type": "FeatureCollection",
            "name": f"nodes-{a}",
            "features": [
                {"type": "Feature",
                 "geometry": {"type": "Point", "coordinates": [i * 1e-4, -i * 1e-4, float(i % 5)]},
                 "properties": {"_id": f"n{a}_{i}", "w": i}}
                for i in range(per_kind)
            ],
        }
        edges = {
            "type": "FeatureCollection",
            "name": f"edges-{a}",
            "features": [
                {"type": "Feature",
                 "geometry": {"type": "LineString",
                              "coordinates": [[i * 1e-4, 0.0, 1.0], [i * 1e-4 + 1e-5, 1e-5]]},
                 "properties": {"_id": f"e{a}_{i}"}}
                for i in range(per_kind)
            ],
        }
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("nodes.geojson", json.dumps(nodes))
            zf.writestr("edges.geojson", json.dumps(edges))
        with open(path, "wb") as fh:
            fh.write(buf.getvalue())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from tdei_extract_load_service_spark.plans.load_dataset import load_dataset
    from tdei_extract_load_service_spark.session import get_spark
    from tdei_extract_load_service_spark.streaming.consumer import run_queue_consumer

    spark = get_spark("many_archive_smoke")
    corpus = "/tmp/spark_graft_many_archives"
    build_archives(corpus, n)

    scratch = f"/tmp/spark_graft_many_run_{int(os.getpid())}"
    shutil.rmtree(scratch, ignore_errors=True)
    request_dir = os.path.join(scratch, "requests")
    response_dir = os.path.join(scratch, "responses")
    warehouse = os.path.join(scratch, "warehouse")
    os.makedirs(request_dir)

    # warm the codegen/plan surface once (same policy as bench.py: the
    # service is a long-lived consumer; measure steady state)
    load_dataset(spark, os.path.join(corpus, "many0.zip"), "warmup", "u", os.path.join(scratch, "warm_wh"))

    for a in range(n):
        msg = {"messageId": f"m{a}", "messageType": "workflow", "data": {
            "data_type": "osw", "file_upload_path": os.path.join(corpus, f"many{a}.zip"),
            "tdei_dataset_id": f"many-ds-{a}", "user_id": "smoke"}}
        with open(os.path.join(request_dir, f"msg{a:04d}.json"), "w") as fh:
            fh.write(json.dumps(msg))

    t0 = time.perf_counter()
    run_queue_consumer(
        spark,
        request_dir=request_dir,
        response_dir=response_dir,
        warehouse=warehouse,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_messages_per_trigger=2,
        available_now=True,
    )
    wall = time.perf_counter() - t0

    responses = []
    for name in os.listdir(response_dir):
        with open(os.path.join(response_dir, name)) as fh:
            responses.append(json.load(fh))
    ok = sum(1 for r in responses if r["data"]["success"])
    n_node_datasets = (
        spark.read.parquet(os.path.join(warehouse, "node"))
        .select("tdei_dataset_id").distinct().count()
    )
    per_archive = wall / n
    print(
        json.dumps(
            {
                "archives": n,
                "features_per_archive": FEATURES,
                "wall_s": round(wall, 1),
                "per_archive_s": round(per_archive, 2),
                "responses_ok": f"{ok}/{len(responses)}",
                "datasets_landed": n_node_datasets,
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
