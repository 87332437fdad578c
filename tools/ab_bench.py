"""Isolated A/B probe for the two round-5 bench trendlines (VERDICT r5 #2).

Runs ONE codebase (repo path = argv[1]) in a fresh process: same session
config and warmup discipline as bench.py, then best-of-N isolated timings
of exactly ``tpch_q5_local_volume`` and the etl_load job. Drive it
alternately against two git worktrees (A/B/A/B) on an idle host so both
codebases see the same host weather; compare the MINs.

Usage: python tools/ab_bench.py <repo_path> [sf_dir] [reps]
Prints one JSON line {"repo": ..., "tpch_q5": [...], "etl_load": [...],
"etl_stages_best": {...}}.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.path.insert(0, repo)

    from tdei_extract_load_service_spark.catalog import REGISTRY
    from tdei_extract_load_service_spark.session import get_spark

    spec = importlib.util.spec_from_file_location("ab_bench_target", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    spark = get_spark("ab-bench")
    spark.range(1).count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    q5 = REGISTRY["tpch_q5_local_volume"].query
    # JIT warmup at tiny sf, same as bench.py
    q5(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    q5_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        q5(spark, sf_dir).write.format("noop").mode("overwrite").save()
        q5_times.append(round(time.perf_counter() - t0, 4))

    etl_times = []
    etl_stages_best = None
    for _ in range(reps):
        dt, stages = bench.bench_etl_load(spark)
        if not etl_times or dt < min(etl_times):
            etl_stages_best = stages
        etl_times.append(dt)

    print(
        json.dumps(
            {
                "repo": repo,
                "sf_dir": sf_dir,
                "tpch_q5": q5_times,
                "tpch_q5_min": min(q5_times),
                "etl_load": etl_times,
                "etl_load_min": min(etl_times),
                "etl_stages_best": etl_stages_best,
            }
        )
    )


if __name__ == "__main__":
    main()
