"""Skewed-component dedup smoke (VERDICT r3 #2).

Fixture: a pathological corpus with ONE giant near-dup clique — K copies
of a single template document (identical text -> identical MinHash
signature -> ONE band bucket per band, and one giant connected
component) — embedded in a 10x background corpus whose replicas are
text-salted so they are NOT near-dups of each other.

This is the worst case for both band-join skew (every clique pair comes
out of a single (band, bucket) key) and component skew (one K-node
clique). The claims under test:

1. runtime tracks CLIQUE-PAIR volume (~K^2/2), not corpus size — run two
   clique sizes and compare time ratio vs pair ratio;
2. no single-task straggler: with the UI enabled, per-stage task max vs
   median comes from the REST status API; AQE skew-split markers are
   read from the executed plan.

Usage: python tools/skew_smoke.py [clique_sizes_csv] (default 1000,2000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
BACKGROUND_REPLICAS = 10


def build_corpus(spark, out_path: str, clique: int) -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    if os.path.exists(out_path):
        return
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    shift = 10_000_000
    background = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select(
                (F.col("doc_id") + F.lit(r * shift)).alias("doc_id"),
                # salt the text so replicas are NOT near-dups of each other
                F.concat(F.lit(f"replica{r} marker{r} "), F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
            for r in range(BACKGROUND_REPLICAS)
        ],
    )
    template = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    clique_df = spark.range(clique).select(
        (F.col("id") + F.lit(900_000_000)).alias("doc_id"),
        F.lit(template).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("clique").alias("source"),
        F.length(F.lit(template)).alias("n_chars"),
    )
    background.unionByName(clique_df).write.mode("overwrite").parquet(out_path)


def stage_task_skew(ui_port: int) -> list[dict]:
    """Max/median task duration per completed stage via the REST API."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete"))
    out = []
    for s in stages:
        if s.get("numCompleteTasks", 0) < 2:
            continue
        q = json.load(
            urllib.request.urlopen(
                f"{base}/{app_id}/stages/{s['stageId']}/{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        )
        med, mx = q["executorRunTime"]
        out.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "med_ms": med,
                "max_ms": mx,
                "name": s["name"].split("\n")[0][:40],
            }
        )
    return out


def main() -> None:
    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1000,2000").split(",")]
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_clusters,
        lsh_verified_pairs,
    )
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("skew_smoke", extra_conf={"spark.ui.enabled": "true"})
    ui_port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])

    results = []
    for k in sizes:
        path = f"/tmp/spark_graft_skew_clique{k}"
        build_corpus(spark, path, k)
        docs = spark.read.parquet(path)
        n_docs = docs.count()

        caches: list = []
        t0 = time.perf_counter()
        pairs = lsh_verified_pairs(docs, "doc_id", "text", n=3, threshold=0.8, caches=caches)
        pairs_p = pairs.persist()
        n_pairs = pairs_p.count()
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        ids = docs.select("doc_id")
        clusters = dedup_clusters(ids, pairs_p.selectExpr("doc_a", "doc_b"), id_col="doc_id")
        comp_sizes = (
            clusters.groupBy("cluster_id").count().orderBy("count", ascending=False).limit(1).collect()
        )
        t_cluster = time.perf_counter() - t0
        giant = comp_sizes[0]["count"] if comp_sizes else 0

        for c in caches + [pairs_p]:
            c.unpersist()
        results.append(
            {
                "clique": k,
                "docs": n_docs,
                "pairs": n_pairs,
                "t_pairs_s": round(t_pairs, 2),
                "t_cluster_s": round(t_cluster, 2),
                "giant_component": giant,
            }
        )
        print(results[-1])

    if len(results) == 2:
        a, b = results
        pr = b["pairs"] / max(a["pairs"], 1)
        tr = b["t_pairs_s"] / max(a["t_pairs_s"], 1e-9)
        print(
            f"\npair-volume ratio {pr:.1f}x, verified-pairs time ratio {tr:.1f}x "
            f"-> {'PAIR-VOLUME-LINEAR' if tr <= pr * 1.5 + 1 else 'SUPER-LINEAR (investigate)'}"
        )

    print("\nper-stage task skew (top 10 by max_ms):")
    skew = sorted(stage_task_skew(ui_port), key=lambda s: -s["max_ms"])[:10]
    for s in skew:
        ratio = s["max_ms"] / max(s["med_ms"], 1.0)
        print(
            f"  stage {s['stage']:4d} tasks={s['tasks']:4d} med={s['med_ms']:8.0f}ms "
            f"max={s['max_ms']:8.0f}ms max/med={ratio:5.1f} {s['name']}"
        )


if __name__ == "__main__":
    main()
