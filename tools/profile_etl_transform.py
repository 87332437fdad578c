"""Round-4 ETL transform-stage profiler (VERDICT r3 #3).

Times sub-pipelines of the transform stage on one bench archive
(2 entries x 5k features) to find where the ~1.0s/load goes:

  explode        - entry_text -> exploded feature_raw rows (count)
  explode_repart - + round-robin repartition (current skew fix)
  parse          - + FEATURE_SCHEMA from_json decompose (noop write)
  transform      - + geometry/elevation + assemble (noop write)
  full_current   - transform_features + persist + groupBy counts (as shipped)
  no_repart      - full minus the repartition
  narrow_repart  - repartition sized by feature volume, not defaultParallelism
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
import zipfile

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tdei_extract_load_service_spark.session import get_spark
from tdei_extract_load_service_spark.sources.zip_fanout import (
    read_zip_archives,
    routed_entries,
    zip_fanout,
)
from tdei_extract_load_service_spark.sources.geojson import explode_features
from tdei_extract_load_service_spark.plans.load_dataset import transform_features

CORPUS = "/tmp/spark_graft_bench_etl"


def build_corpus():
    sys.path.insert(0, "/root/repo")
    import bench

    bench._build_etl_corpus(CORPUS)


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    build_corpus()
    spark = get_spark("profile_etl")
    par = spark.sparkContext.defaultParallelism

    archive = os.path.join(CORPUS, "bench0.zip")
    entries = routed_entries(zip_fanout(read_zip_archives(spark, archive))).persist()
    n_entries = entries.count()  # materialize like the gate pass does
    print("entries:", n_entries)

    results = {}

    feats_base = explode_features(entries)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results["explode"] = timed(lambda: feats_base.count())
    results["explode_repart"] = timed(lambda: feats_base.repartition(par).count())
    results["parse"] = timed(
        lambda: noop(
            feats_base.repartition(par).select(
                F.from_json("feature_raw", "type string, geometry struct<type string, coordinates string>, properties string").alias("p")
            ).select("p.*")
        )
    )
    results["transform_noop"] = timed(
        lambda: noop(transform_features(feats_base.repartition(par)))
    )

    def full(repart: int | None):
        f = feats_base
        if repart:
            f = f.repartition(repart)
        f = transform_features(f)
        f = f.persist()
        counts = {r["kind"]: r["n"] for r in f.groupBy("kind").agg(F.count("*").alias("n")).collect()}
        f.unpersist()
        return counts

    results["full_current"] = timed(lambda: full(par))
    results["no_repart"] = timed(lambda: full(None))
    results["narrow_repart_8"] = timed(lambda: full(8))

    print("TIMINGS(s):", {k: round(v, 3) for k, v in results.items()})
    entries.unpersist()


if __name__ == "__main__":
    main()
