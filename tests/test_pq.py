"""PQ encode/search semantics: Spark vs an independent pure-Python
reference on random vectors, plus the compression/roundtrip contracts."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from tdei_extract_load_service_spark.operators.similarity import (
    make_codebooks,
    pq_adc_lut,
    pq_encode,
    pq_topk,
)


def _ref_encode(vec, codebooks):
    """Independent reference: plain squared-L2 argmin per subspace (NOT
    the norm expansion — agreeing across formulations shows the
    expansion picks the same centroids away from float knife-edges)."""
    sub_dim = len(codebooks[0][0])
    codes = []
    for s, cb in enumerate(codebooks):
        sub = vec[s * sub_dim : (s + 1) * sub_dim]
        best, best_d = 0, None
        for j, c in enumerate(cb):
            d = sum((float(x) - float(y)) ** 2 for x, y in zip(sub, c))
            if best_d is None or d < best_d:
                best, best_d = j, d
        codes.append(best)
    return codes


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(7)
    rows = []
    for i in range(200):
        # float32-quantized components, like the fixture embeddings
        import struct

        vec = [
            struct.unpack("f", struct.pack("f", rng.uniform(-0.6, 0.6)))[0]
            for _ in range(64)
        ]
        rows.append((i, vec))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    df = spark.createDataFrame(pdf)
    return df, rows


def test_encode_matches_reference(spark, frame):
    df, rows = frame
    cbs = make_codebooks()
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, "vec_id", "embedding", cbs).collect()}
    for vid, vec in rows:
        assert got[vid] == _ref_encode(vec, cbs), f"vec {vid}"


def test_codes_in_range_and_width(spark, frame):
    df, _ = frame
    cbs = make_codebooks(m=8, k=16)
    out = pq_encode(df, "vec_id", "embedding", cbs).collect()
    assert all(len(r["codes"]) == 8 for r in out)
    assert all(0 <= c < 16 for r in out for c in r["codes"])


def test_topk_matches_python_adc(spark, frame):
    df, rows = frame
    cbs = make_codebooks()
    query = rows[0][1]
    lut = pq_adc_lut(query, cbs)
    ref = []
    for vid, vec in rows:
        codes = _ref_encode(vec, cbs)
        d = 0.0
        for s, c in enumerate(codes):
            d += lut[s][c]
        ref.append((round(d, 6), vid))
    ref.sort()
    want = [(vid, d) for d, vid in ref[:10]]
    got = [
        (r["id"], r["approx_dist"])
        for r in pq_topk(df, "vec_id", "embedding", query, cbs, k=10).collect()
    ]
    assert got == want


def test_adc_recall_against_exact(spark, frame):
    """PQ with 16 centroids/subspace on 200 random vectors: the true
    nearest neighbour (the query itself, distance 0) must rank first,
    and ADC distances must correlate with the exact ones (top-10 ADC
    overlaps top-30 exact — a loose but meaningful recall floor for
    random codebooks)."""
    df, rows = frame
    cbs = make_codebooks()
    query = rows[5][1]
    exact = sorted(
        (sum((float(x) - float(y)) ** 2 for x, y in zip(vec, query)), vid)
        for vid, vec in rows
    )
    exact_top30 = {vid for _, vid in exact[:30]}
    got = [r["id"] for r in pq_topk(df, "vec_id", "embedding", query, cbs, k=10).collect()]
    assert got[0] == 5  # the query vector itself quantizes to distance ~min
    assert len(set(got) & exact_top30) >= 5


def test_bad_dims_rejected():
    with pytest.raises(ValueError):
        make_codebooks(m=7, k=8, dim=64)


def test_trained_codebooks_improve_recall(spark):
    """PQ quality check: sample-trained codebooks must beat the seeded
    random ones on recall@10 against exact L2 (the reason train_codebooks
    exists). Fixture embeddings at sf0.001."""
    from tdei_extract_load_service_spark.operators.similarity import (
        pq_recall_at_k,
        train_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    # same m/k for both sides — the uplift must come from training, not
    # from a finer code. m=16 (4-dim subspaces): the fixture embeddings
    # are near-isotropic so L2 distances concentrate (the hard case for
    # PQ); coarser m=8 caps trained recall at 0.3 here, measured.
    random_cbs = make_codebooks(m=16, k=16)
    trained_cbs = train_codebooks(emb, "vec_id", "embedding", m=16, k=16, sample=256, iters=5)
    r_random = pq_recall_at_k(emb, "vec_id", "embedding", query, random_cbs).collect()[0][0]
    r_trained = pq_recall_at_k(emb, "vec_id", "embedding", query, trained_cbs).collect()[0][0]
    assert r_trained > r_random, (r_trained, r_random)
    assert r_trained >= 0.5  # trained PQ finds at least half the true top-10
    assert r_random <= 0.3  # pinned: the gap IS the training value (0.3 vs 0.5)


def test_train_codebooks_deterministic(spark):
    from tdei_extract_load_service_spark.operators.similarity import train_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = train_codebooks(emb, "vec_id", "embedding", sample=128, iters=3)
    b = train_codebooks(emb, "vec_id", "embedding", sample=128, iters=3)
    assert a == b


def test_ivf_pq_candidates_come_from_probed_cells(spark):
    """IVFPQ = PQ ADC restricted to the probe: its results must be a
    prefix of the full ADC ranking filtered to the probed cells, and
    distances must equal the unrestricted ADC distances for those ids."""
    from tdei_extract_load_service_spark.operators.similarity import (
        ivf_pq_topk,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cbs = make_codebooks()
    full = {r["id"]: r["approx_dist"] for r in pq_topk(emb, "vec_id", "embedding", query, cbs, k=500).collect()}
    got = ivf_pq_topk(emb, "vec_id", "embedding", query, cbs, k=10).collect()
    assert len(got) == 10
    dists = [r["approx_dist"] for r in got]
    assert dists == sorted(dists)
    for r in got:
        assert full[r["id"]] == r["approx_dist"]


def test_probe_centroids_zero_query_raises():
    from tdei_extract_load_service_spark.operators.similarity import probe_centroids

    rows = [{"centroid_id": 1, "centroid_vec": [1.0, 0.0]}]
    with pytest.raises(ValueError, match="all-zero query"):
        probe_centroids(rows, [0.0, 0.0], 1)


def test_probe_round_is_half_up():
    """ADVICE r7: the probe score must round HALF_UP like F.round/DuckDB
    ROUND, not banker's — .xxxxxx5 knife edges decide probe-set ties."""
    from tdei_extract_load_service_spark.operators.similarity import (
        _round6_half_up,
    )

    assert _round6_half_up(5e-07) == 1e-06       # round() gives 0.0
    assert _round6_half_up(2.5e-06) == 3e-06     # round() gives 2e-06
    assert _round6_half_up(-2.5e-06) == -3e-06   # HALF_UP = away from zero
    assert _round6_half_up(0.1234565) == 0.123457


def test_stored_index_serving_matches_inline(spark, tmp_path):
    """The stored-index serving path (r8 production shape) must be
    value-identical to the inline encode path on both PQ and IVFPQ."""
    from tdei_extract_load_service_spark.operators.similarity import (
        build_pq_index,
        ivf_pq_topk,
        ivf_pq_topk_stored,
        pq_topk,
        pq_topk_stored,
        probe_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cbs = make_codebooks()
    path, model_rows = build_pq_index(
        emb, "vec_id", "embedding", cbs, num_centroids=8,
        corpus_key=f"test:{tmp_path}",
    )
    inline = pq_topk(emb, "vec_id", "embedding", query, cbs, k=10).collect()
    stored = pq_topk_stored(spark, path, query, cbs, k=10).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in stored]
    inline_ivf = ivf_pq_topk(
        emb, "vec_id", "embedding", query, cbs, k=10, num_centroids=8, n_probe=3
    ).collect()
    stored_ivf = ivf_pq_topk_stored(
        spark, path, model_rows, query, cbs, k=10, n_probe=3
    ).collect()
    assert [tuple(r) for r in inline_ivf] == [tuple(r) for r in stored_ivf]
    # second build with the same key is a pure cache hit (same path)
    path2, _ = build_pq_index(
        emb, "vec_id", "embedding", cbs, num_centroids=8,
        corpus_key=f"test:{tmp_path}",
    )
    assert path2 == path
    assert probe_centroids(model_rows, query, 3)  # model rows round-trip


def test_trained_entry_uplift_pinned_at_sf001(spark):
    """The similarity_pq_trained catalog entry's exact config (m=16,
    sample=1024, iters=5) must keep its measured uplift at the driver's
    correctness scale — deterministic end to end (content-addressed
    sample, seeded numpy Lloyd, no RNG), so an exact bound is safe."""
    from tdei_extract_load_service_spark.catalog import REGISTRY

    row = (
        REGISTRY["similarity_pq_trained"]
        .query(spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    assert row["recall_trained"] >= row["recall_seeded"] + 0.2, dict(row.asDict())
    assert row["uplift"] == pytest.approx(
        row["recall_trained"] - row["recall_seeded"], abs=1e-9
    )


class TestIncrementalIndex:
    def test_grown_index_equals_full_rebuild(self, spark, tmp_path):
        """append_pq_index on a frozen model must produce the exact code
        set a full rebuild over the union produces."""
        import pyspark.sql.functions as F

        from tdei_extract_load_service_spark.operators.similarity import (
            append_pq_index,
            ivf_assign_model,
            ivf_centroids,
            make_codebooks,
            pq_code_expr_sql,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cbs = make_codebooks()
        delta_cond = (F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 100)
        base, delta = emb.where(~delta_cond), emb.where(delta_cond)
        assert delta.count() > 0
        model = ivf_centroids(base, "vec_id", "embedding", 16).collect()
        # frozen model == full model (the 16 lowest ids are all base)
        full_model = ivf_centroids(emb, "vec_id", "embedding", 16).collect()
        assert [r["centroid_id"] for r in model] == [
            r["centroid_id"] for r in full_model
        ]

        def encode(df):
            return (
                ivf_assign_model(df, model, "vec_id", "embedding")
                .select(
                    "id",
                    "centroid_id",
                    F.expr(pq_code_expr_sql("vec", cbs)).alias("codes"),
                )
            )

        grown_dir = str(tmp_path / "grown")
        encode(base).write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(grown_dir)
        append_pq_index(delta, grown_dir, model, cbs)

        grown = {
            (r["id"], r["centroid_id"], tuple(r["codes"]))
            for r in spark.read.parquet(grown_dir).collect()
        }
        rebuilt = {
            (r["id"], r["centroid_id"], tuple(r["codes"]))
            for r in encode(emb).collect()
        }
        assert grown == rebuilt
