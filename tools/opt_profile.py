"""Optimization-round profiler: per query, split driver-side plan build
time (query() call — includes any model collects) from execution time
(noop write), count Spark jobs/stages triggered, and optionally dump
explain("formatted") to a file.

Usage:
  python tools/opt_profile.py q1 q2 ...            # profile named queries
  python tools/opt_profile.py --plans DIR q1 ...   # also dump plans
  SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).

Methodology (guide §1): one untimed sf0.001 warmup per query (JIT), then
N timed reps at the target SF; reports min/median build and exec.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tdei_extract_load_service_spark.catalog import REGISTRY
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("opt_profile")
    spark.range(1).count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = args or []
    out: dict[str, dict] = {}
    for name in names:
        entry = REGISTRY[name]
        # untimed warmup at sf0.001 (JIT + codegen)
        sc.setJobDescription(f"warmup:{name}")
        entry.query(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        builds, execs = [], []
        jobs_delta = 0
        for r in range(reps):
            sc.setJobDescription(f"{name}:rep{r}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = entry.query(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            jobs_delta = j1 - j0
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = entry.query(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(txt)
        builds.sort()
        execs.sort()
        out[name] = {
            "build_min": round(builds[0], 4),
            "build_med": round(builds[len(builds) // 2], 4),
            "exec_min": round(execs[0], 4),
            "exec_med": round(execs[len(execs) // 2], 4),
            "total_min": round(builds[0] + execs[0], 4),
            "jobs_per_rep": jobs_delta,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
