"""x100 connected-components smoke for dedup_clusters (VERDICT r4 #4).

The x100 push that broke the pair operators never exercised the CLUSTERING
stage, and label propagation's cost driver is component DIAMETER — the
giant-clique fixture (diameter 1) is its easy case. This smoke chains a
large corpus with:

- a long PATH component of diameter D (the adversarial shape: min-label
  propagation moves the minimum one hop per round, so convergence takes
  exactly D rounds + 1 no-change witness round), and
- bulk edge volume shaped like real near-dup output (5-doc star clusters
  over the whole corpus), so the per-round joins carry realistic weight.

Asserts:
- rounds == D + 1 (diameter bound, not max_iter runaway),
- the path resolves to ONE cluster labeled by its minimum id,
- star clusters resolve correctly (spot-checked via cluster-size histogram),
- runtime is ~edge-volume-linear across the given scale ladder.

Everything is generated with spark.range — no driver-side data. Usage:

    python tools/cluster_smoke.py [scales] [diameter]
    # default scales 10,100 (x10 = 50k docs, x100 = 500k docs), D = 20
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DOCS = 5_000  # x1 corpus size; scale multiplies this


def run_one(spark, scale: int, diameter: int) -> dict:
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.dedup import dedup_clusters

    n_docs = BASE_DOCS * scale
    # path component occupies ids [0, diameter]; star bulk covers the rest
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    path_edges = spark.range(diameter).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    first_star = diameter + 1
    star_edges = (
        spark.range(first_star, n_docs)
        .where((F.col("id") - first_star) % 5 != 0)
        .select(
            (F.col("id") - (F.col("id") - first_star) % 5).alias("doc_a"),
            F.col("id").alias("doc_b"),
        )
    )
    pairs = path_edges.unionByName(star_edges)
    n_edges = pairs.count()

    metrics: dict = {}
    t0 = time.perf_counter()
    labels = dedup_clusters(ids, pairs, max_iter=diameter + 5, metrics=metrics)
    sizes = (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("clusters"))
        .collect()
    )
    dt = time.perf_counter() - t0
    hist = {int(r["n"]): int(r["clusters"]) for r in sizes}

    # correctness: the path must be ONE cluster of diameter+1 nodes with
    # label 0; the bulk must be 5-doc clusters (plus a possible remainder)
    assert metrics["converged"], f"x{scale}: did not converge in {diameter + 5} rounds"
    assert metrics["rounds"] == diameter + 1, (
        f"x{scale}: rounds {metrics['rounds']} != diameter bound {diameter + 1}"
    )
    assert hist.get(diameter + 1, 0) >= 1, f"x{scale}: path component torn: {hist}"
    path_label = (
        labels.where(F.col("doc_id") <= diameter)
        .agg(F.countDistinct("cluster_id").alias("k"), F.min("cluster_id").alias("m"))
        .collect()[0]
    )
    assert path_label["k"] == 1 and path_label["m"] == 0, "path labels wrong"
    return {
        "scale": scale,
        "docs": n_docs,
        "edges": n_edges,
        "rounds": metrics["rounds"],
        "sec": round(dt, 2),
        "cluster_size_hist_top": dict(sorted(hist.items())[:4]),
    }


def main() -> None:
    scales = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["10", "100"])]
    diameter = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("cluster_smoke")
    results = [run_one(spark, s, diameter) for s in scales]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        edge_ratio = hi["edges"] / max(lo["edges"], 1)
        time_ratio = hi["sec"] / max(lo["sec"], 1e-9)
        print(
            json.dumps(
                {
                    "edge_ratio": round(edge_ratio, 2),
                    "time_ratio": round(time_ratio, 2),
                    "linear": time_ratio <= edge_ratio * 1.5 + 1,
                }
            )
        )


if __name__ == "__main__":
    main()
