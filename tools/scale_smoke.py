"""Scale smoke: replicate the sf0.1 fixtures ~10x into /tmp (≈sf1:
6M-row lineitem, 20k embeddings, 50k documents) and run representative
linear-path queries at both scales, reporting the runtime ratio.

Purpose: empirical evidence that the headline plans scale ~linearly (a
ratio well under the 10x data growth indicates fixed-overhead dominance;
a ratio far above it indicates a super-linear operator — a bug).
Replication shifts keys so join fan-out stays realistic instead of
creating 10x duplicate key collisions.

Usage: python tools/scale_smoke.py [replication] [query,query,...]
(the optional comma-list restricts the run — e.g. the 30x confirmation run
for the super-linear ops doesn't need the whole linear family again)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
QUERIES = (
    "agg_group",
    "filter",
    "join_semi",
    "top_k",
    "topk_similarity",
    "text_fingerprint",
    "window_tumbling",
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "similarity_ivf",
    "quantiles",
    "join_range",
    # round-4/5 additions: codec fan-outs (embarrassingly parallel),
    # fixed-point ranking, packing window, histogram aggregation
    "text_tfidf_topk",
    "text_pack_sequences",
    "embedding_quantize",
    "histogram",
    "multimodal_decode_jpeg",
    "multimodal_resize",
    "multimodal_video_frames",
    "multimodal_audio",
    # round-6 additions: single-scan profiling family, repetition
    # signals (explode-heavy), wide scan-agg + pushdown flagships
    "column_profile",
    "column_profile_categorical",
    "histogram_auto",
    "text_repetition_stats",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "text_winnow_fingerprint",
    # round-7 additions: the eleven round-7 TPC-H plan families and the
    # decontamination / budget-sampling / event-sequence operators
    "tpch_q4_order_priority",
    "tpch_q14_promo_effect",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q22_global_sales_opportunity",
    "text_contamination",
    "text_normalize",
    "text_chunk",
    "embedding_normalize",
    "corpus_prep_full",
    "text_token_budget_sample",
    "events_funnel",
    "events_retention",
    "events_retention_cohorts",
    "embedding_pq_code",
    "similarity_pq",
    "similarity_pq_recall",
    "similarity_ivf_pq",
    "tpch_q7_volume_shipping",
    "tpch_q12_priority_class",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q10_returned_items",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q20_potential_part_promotion",
    "tpch_q2_minimum_cost_supplier",
    "tpch_q8_national_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    # round-8 wave-2 additions: retrieval/quality/mixing/merge operators
    # and the skew-salting certification (streaming shadows excluded:
    # fixed micro-batch harness overhead dominates, not the plan)
    "text_bm25_topk",
    "text_bm25_topk_stored",
    "text_pii_scrub",
    "text_lm_score",
    "corpus_mix_sample",
    "join_skew_salted",
    "scd2_history",
    "cdc_apply",
    "events_anomaly",
    "incremental_agg",
    "temporal_join",
    "join_bucketed",
    "ts_fill_gaps",
    "referential_audit",
    "join_fuzzy",
    "graph_pagerank",
    "window_percentiles",
    "key_skew_profile",
    "dedup_golden_record",
    "table_compact",
    "sample_split_grouped",
    "events_attribution",
    "similarity_ivf_pq_incremental",
    # dedup_winnow: excluded — replicated word-soup makes every substring
    # shingle corpus-hot (df ~ corpus size), so the smoke would measure
    # the max_hash_df cap dropping everything, not the join plan
)
KEY_SHIFT = 10_000_000


def build(spark, out_dir: str, replication: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    plans = {
        "lineitem": ("l_orderkey", None),
        "orders": ("o_orderkey", "o_custkey"),
        "customer": ("c_custkey", None),
        "embeddings": ("vec_id", None),
        "documents": ("doc_id", None),
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table, (key, fk) in plans.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        parts = []
        for r in range(replication):
            part = src.withColumn(key, F.col(key) + F.lit(r * KEY_SHIFT))
            if fk:
                part = part.withColumn(fk, F.col(fk) + F.lit(r * KEY_SHIFT))
            parts.append(part)
        from functools import reduce

        reduce(lambda a, b: a.unionByName(b), parts).write.mode("overwrite").parquet(dst)
    # events used by window_tumbling: replicate with shifted ids only
    dst = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(dst):
        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        from functools import reduce

        reduce(
            lambda a, b: a.unionByName(b),
            [ev.withColumn("event_id", F.col("event_id") + F.lit(r * KEY_SHIFT)) for r in range(replication)],
        ).write.mode("overwrite").parquet(dst)
    for t in ("region", "nation", "supplier", "part"):
        d = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(d):
            spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).write.mode("overwrite").parquet(d)


def run(spark, sf_dir: str, queries=QUERIES) -> dict[str, tuple[float, int]]:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.catalog import REGISTRY

    out = {}
    for name in queries:
        obs = Observation()
        t0 = time.perf_counter()
        (
            REGISTRY[name]
            .query(spark, sf_dir)
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        out[name] = (round(time.perf_counter() - t0, 2), int(obs.get["rows"]))
        # the dedup entries persist corpus-sized frames and the catalog
        # callable offers no unpersist hook here — clear between queries
        # so query N's time doesn't include query N-1's cache pressure
        # (measured at x30: dedup_lsh_verified 58.5s after minhash's
        # caches vs 23.9s isolated)
        spark.catalog.clearCache()
    return out


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    queries = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else QUERIES
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("scale_smoke")
    scaled_dir = f"/tmp/spark_graft_scale_x{replication}"
    build(spark, scaled_dir, replication)
    base = run(spark, SF_DIR, queries)
    scaled = run(spark, scaled_dir, queries)
    # rows ratio matters for the dedup family: replicated corpora carry
    # identical text under shifted ids, so near-dup PAIR volume grows
    # ~quadratically in the replication factor (e.g. ~1000x pairs at 10x
    # docs) — read the time ratio against the output-rows ratio, not
    # against the input growth alone.
    print(
        f"{'query':28s} {'sf0.1':>8s} {'x' + str(replication):>8s} {'ratio':>6s}"
        f" {'rows0':>10s} {'rowsN':>10s} {'rows_ratio':>10s}"
    )
    for name in queries:
        (t_base, n_base), (t_scaled, n_scaled) = base[name], scaled[name]
        ratio = t_scaled / t_base if t_base else float("inf")
        rows_ratio = (n_scaled / n_base) if n_base else float("inf")
        print(
            f"{name:28s} {t_base:8.2f} {t_scaled:8.2f} {ratio:6.1f}"
            f" {n_base:10d} {n_scaled:10d} {rows_ratio:10.1f}"
        )


if __name__ == "__main__":
    main()
