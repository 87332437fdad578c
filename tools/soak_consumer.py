"""1,000-message consumer soak (VERDICT r4 #8).

The many-archive smoke proved 100 messages; this soak runs 1,000 small
archives through ``run_queue_consumer`` in three segments that share one
checkpoint (two real stop/start cycles — the restart shape a deployed
consumer lives with), then asserts:

- exactly-once: 1,000 distinct responses, 1,000 datasets landed, and a
  fourth consumer run over the drained queue processes NOTHING new;
- flat per-message latency: p50/p95 of response completion gaps in the
  first vs last 100 messages — driver-state growth (accumulating plans,
  leaked persisted frames, checkpoint log scans) would show up as a
  rising tail;
- bounded checkpoint growth across 500 triggers (the file-source commit
  log compacts; size is reported, not hand-waved).

Archives are deliberately SMALL (200 features): per-message latency
flatness probes the driver/stream machinery, not parquet throughput —
the data-volume story is the many-archive smoke and the giant-file smoke.

Usage: python tools/soak_consumer.py [n_messages] [commit_mode]
(defaults 1000, partition). commit_mode=manifest additionally soaks the
pointer-swap warehouse across many datasets: the manifest is rewritten
per commit and grows O(datasets x tables), so a many-dataset run checks
that neither the swap latency nor GC degrades.
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

FEATURES = 200


def build_archive(path: str, a: int) -> None:
    per_kind = FEATURES // 2
    nodes = {
        "type": "FeatureCollection",
        "name": f"nodes-{a}",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [i * 1e-4, -i * 1e-4, float(i % 5)]},
             "properties": {"_id": f"n{a}_{i}"}}
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


def _dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _pctl(values: list[float], p: float) -> float:
    if not values:
        return 0.0
    s = sorted(values)
    return s[min(len(s) - 1, int(p * len(s)))]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    commit_mode = sys.argv[2] if len(sys.argv) > 2 else "partition"
    from tdei_extract_load_service_spark.plans.load_dataset import load_dataset
    from tdei_extract_load_service_spark.session import get_spark
    from tdei_extract_load_service_spark.streaming.consumer import run_queue_consumer

    spark = get_spark("soak_consumer")
    corpus = "/tmp/spark_graft_soak_archives"
    os.makedirs(corpus, exist_ok=True)
    for a in range(n):
        path = os.path.join(corpus, f"soak{a}.zip")
        if not os.path.exists(path):
            build_archive(path, a)

    scratch = f"/tmp/spark_graft_soak_run_{os.getpid()}"
    shutil.rmtree(scratch, ignore_errors=True)
    request_dir = os.path.join(scratch, "requests")
    response_dir = os.path.join(scratch, "responses")
    warehouse = os.path.join(scratch, "warehouse")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(request_dir)

    load_dataset(spark, os.path.join(corpus, "soak0.zip"), "warmup", "u",
                 os.path.join(scratch, "warm_wh"))

    def enqueue(lo: int, hi: int) -> None:
        for a in range(lo, hi):
            msg = {"messageId": f"m{a}", "messageType": "workflow", "data": {
                "data_type": "osw",
                "file_upload_path": os.path.join(corpus, f"soak{a}.zip"),
                "tdei_dataset_id": f"soak-ds-{a}", "user_id": "soak"}}
            with open(os.path.join(request_dir, f"msg{a:05d}.json"), "w") as fh:
                fh.write(json.dumps(msg))

    def drain() -> float:
        t0 = time.perf_counter()
        run_queue_consumer(
            spark, request_dir=request_dir, response_dir=response_dir,
            warehouse=warehouse, checkpoint_dir=ckpt,
            max_messages_per_trigger=2, available_now=True,
            commit_mode=commit_mode,
        )
        return time.perf_counter() - t0

    # three segments sharing one checkpoint = two real restarts
    cuts = [0, n // 3, 2 * n // 3, n]
    walls, ckpt_sizes = [], []
    t_start = time.perf_counter()
    for seg in range(3):
        enqueue(cuts[seg], cuts[seg + 1])
        walls.append(round(drain(), 1))
        ckpt_sizes.append(_dir_size(ckpt))
    wall = time.perf_counter() - t_start

    # exactly-once: a fourth run over the drained queue must do nothing
    before = len(os.listdir(response_dir))
    drain()
    replay_processed = len(os.listdir(response_dir)) - before

    responses = {}
    for name in os.listdir(response_dir):
        with open(os.path.join(response_dir, name)) as fh:
            r = json.load(fh)
        responses[r["messageId"]] = r["data"]["success"]
    ok = sum(1 for v in responses.values() if v)
    from tdei_extract_load_service_spark.plans.load_dataset import read_sink

    landed = (
        read_sink(spark, warehouse, "node")
        .select("tdei_dataset_id").distinct().count()
    )

    # latency flatness: completion-gap percentiles, first vs last 100
    mtimes = sorted(
        os.path.getmtime(os.path.join(response_dir, f))
        for f in os.listdir(response_dir)
    )
    gaps = [b - a for a, b in zip(mtimes, mtimes[1:])]
    head, tail = gaps[:100], gaps[-100:]
    result = {
        "messages": n,
        "commit_mode": commit_mode,
        "features_per_archive": FEATURES,
        "wall_s": round(wall, 1),
        "per_message_s": round(wall / n, 3),
        "segment_walls_s": walls,
        "responses_ok": f"{ok}/{len(responses)}",
        "datasets_landed": landed,
        "replay_processed": replay_processed,
        "gap_p50_first100_s": round(_pctl(head, 0.5), 3),
        "gap_p50_last100_s": round(_pctl(tail, 0.5), 3),
        "gap_p95_first100_s": round(_pctl(head, 0.95), 3),
        "gap_p95_last100_s": round(_pctl(tail, 0.95), 3),
        "ckpt_bytes_per_segment": ckpt_sizes,
    }
    flat = result["gap_p95_last100_s"] <= max(2 * result["gap_p95_first100_s"], 1.0)
    result["latency_flat"] = flat
    print(json.dumps(result))
    assert ok == n and len(responses) == n, "lost or failed messages"
    assert landed == n, "datasets missing from the warehouse"
    assert replay_processed == 0, "checkpoint replayed already-processed messages"
    assert flat, "per-message latency rose across the run"
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
