"""Benchmark harness — runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), cores
from $SPARK_GRAFT_CPUS. Each query is executed to completion with a
count-style action (no driver-side collect of payload rows — the measured
work is the distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

#: Headline set: one representative per operator family (keep it stable
#: across rounds so BENCH_r{N}.json values are comparable).
HEADLINE = (
    "agg_group",
    "filter",
    "join_inner",
    "join_semi",
    "join_anti",
    "route_case",
    "agg_stats",
    "top_k",
    "explode_unnest",
    "header_project",
    "normalize_ts",
    "strip_z",
    "window_tumbling",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "topk_similarity",
    "similarity_ivf",
    "text_quality",
    "text_fingerprint",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tdei_extract_load_service_spark.catalog import REGISTRY
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not session bootstrap or first-touch footer reads
    spark.range(1).count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events ts
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name].query
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # force full execution of every operator in the plan
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
