"""Dedup + similarity operators: semantics on crafted docs, and
cross-validation of the approximate paths (MinHash-LSH, SimHash, LSH
buckets, IVF) against their exact counterparts on the fixture data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tdei_extract_load_service_spark.operators import dedup as D
from tdei_extract_load_service_spark.operators import similarity as S

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different words entirely unrelated text here now"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_dedup_exact_groups(docs):
    groups = {r.keep_id: r.n_dups for r in D.dedup_exact_groups(docs, "doc_id", ["text"]).collect()}
    assert groups[1] == 2          # docs 1+3 collapse, min id survives
    assert groups[2] == 1 and groups[4] == 1
    assert D.dedup_exact(docs, ["text"]).count() == 3


def test_ngram_jaccard_pairs(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    assert pairs[(1, 3)] == 1.0    # exact dup -> jaccard 1
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_matches_exact_jaccard_on_fixture(spark):
    """LSH candidates at est>=0.5 must recover every exact pair at j>=0.8
    (collision prob ~0.9996 per pair at j=0.8 with 16 bands of 4)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = {(r.doc_a, r.doc_b) for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()}
    approx = {(r.doc_a, r.doc_b) for r in
              D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert exact, "fixture should contain planted near-dups"
    missed = exact - approx
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed too many: {missed}"


def test_simhash_near_dups(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             D.simhash_pairs(docs, "doc_id", "text", max_hamming=10).collect()}
    assert pairs[(1, 3)] == 0      # identical text -> identical fingerprint
    assert (1, 2) in pairs         # near-dup within small hamming budget
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_embedding_cosine_pairs(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.04, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    pairs = {(r.id_a, r.id_b): r.cosine for r in
             D.embedding_cosine_pairs(vecs, "vec_id", "embedding", threshold=0.9).collect()}
    assert list(pairs) == [(1, 2)]
    assert pairs[(1, 2)] > 0.99


def test_topk_and_ivf_and_lsh_agree_on_top1(spark):
    """The query vector itself must rank #1 (cosine 1.0) in all three
    search tiers; brute force is the recall reference."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    brute = S.topk_cosine(emb, "vec_id", "embedding", q, k=10).collect()
    assert brute[0].id == 0 and brute[0].cosine == 1.0
    ivf = S.ivf_topk(emb, "vec_id", "embedding", q, k=10).collect()
    assert ivf[0].id == 0 and ivf[0].cosine == 1.0
    # vec_id=0 is a centroid, so its list is always probed
    lsh = S.lsh_bucket_topk(emb, "vec_id", "embedding", q, k=10, n_planes=4).collect()
    assert lsh[0].id == 0
    # approximate tiers return subsets of the exact ranking order
    brute_ids = [r.id for r in brute]
    assert [r.id for r in ivf if r.id in brute_ids] == [i for i in brute_ids if i in {r.id for r in ivf}]


def test_ivf_probe_fraction(spark):
    """IVF with 4/16 probes must examine far fewer candidates than the
    corpus (the point of the index)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    centroids = S.ivf_centroids(emb, "vec_id", "embedding", 16)
    assigned = S.ivf_assign(emb, centroids, "vec_id", "embedding")
    total = assigned.count()
    per_list = assigned.groupBy("centroid_id").count().collect()
    assert total == emb.count()
    assert len(per_list) > 4  # vectors actually spread across lists


def test_ann_recall_at_10(spark):
    """Measured recall@10 of the approximate tiers vs brute force on the
    fixture embeddings (deterministic: hash-derived planes, fixed
    centroids)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 17).first()["embedding"]]
    brute = {r.id for r in S.topk_cosine(emb, "vec_id", "embedding", q, k=10).collect()}
    ivf = {r.id for r in S.ivf_topk(emb, "vec_id", "embedding", q, k=10).collect()}
    lsh = {r.id for r in S.lsh_bucket_topk(emb, "vec_id", "embedding", q, k=10, n_planes=4).collect()}
    # deterministic invariants: the query's own vector (the true 1-NN) is
    # always recovered — its IVF list is the first probed, its LSH bucket
    # is the probed bucket — and some genuine overlap with brute force
    # exists. Uniform-random 64-dim embeddings are the ANN worst case
    # (neighbours scatter across lists), so high recall@10 is NOT expected
    # here; the clustered-corpus behavior is what IVF is for.
    assert 17 in brute and 17 in ivf and 17 in lsh
    assert len(brute & ivf) >= 1
    assert len(brute & lsh) >= 1


def test_kmeans_centroids_deterministic_and_improve_assignment(spark):
    """kmeans_centroids: deterministic across runs, k rows out, and the
    Lloyd update does not worsen mean assignment similarity vs the
    fixed-subset bootstrap (inertia-style check in cosine space)."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.dedup import cosine_similarity
    from tdei_extract_load_service_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mean_assigned_sim(cents) -> float:
        assigned = ivf_assign(emb, cents, "vec_id", "embedding")
        cv = cents.select(
            F.col("centroid_id"), F.col("centroid_vec").cast("array<double>").alias("centroid_vec")
        )
        joined = assigned.join(cv, "centroid_id")
        return joined.select(
            F.avg(cosine_similarity(F.col("vec"), F.col("centroid_vec"))).alias("m")
        ).collect()[0]["m"]

    seed = ivf_centroids(emb, "vec_id", "embedding", 8)
    km1 = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    km2 = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    rows1 = [(r["centroid_id"], tuple(r["centroid_vec"])) for r in km1.collect()]
    rows2 = [(r["centroid_id"], tuple(r["centroid_vec"])) for r in km2.collect()]
    assert rows1 == rows2 and len(rows1) == 8
    assert mean_assigned_sim(km1) >= mean_assigned_sim(seed) - 1e-9


def test_hash_split_disjoint_deterministic(spark):
    """hash_split: every row lands in exactly one split, assignment is a
    pure function of (key, seed), and fractions are approximately
    honored."""
    from tdei_extract_load_service_spark.operators.sampling import hash_sample, hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = hash_split(docs, "doc_id", {"train": 80, "eval": 10, "test": 10})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "eval", "test"}
    assert sum(counts.values()) == n  # disjoint and exhaustive at 100%
    assert counts["train"] > counts["eval"] and counts["train"] > counts["test"]
    # determinism across invocations
    a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect())
    b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect())
    assert a == b and 0 < len(a) < n
    # different seed -> different membership (with overwhelming probability)
    c = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10, seed="other").select("doc_id").collect())
    assert a != c


def test_dedup_clusters_connected_components(spark):
    """Label propagation resolves pairs into exact connected components:
    chain {1-2, 2-3}, pair {5-6}, singletons map to themselves."""
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.cluster_id for r in D.dedup_clusters(ids, pairs, "doc_id").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8}


def test_dedup_clusters_long_chain_converges(spark):
    """A worst-case chain (diameter = n) still converges within max_iter
    rounds of min-label propagation."""
    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    out = {r.doc_id: r.cluster_id for r in D.dedup_clusters(ids, pairs, "doc_id", max_iter=25).collect()}
    assert out == {i: 0 for i in range(n)}


def test_kmeans_exact_model_is_run_invariant(spark):
    """kmeans_centroids_exact must return the identical model on repeated
    runs regardless of partitioning — the property the SQL oracle twin
    depends on (exact decimal sums are order-independent)."""
    from tdei_extract_load_service_spark.operators.similarity import kmeans_centroids_exact

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m1 = kmeans_centroids_exact(emb, "vec_id", "embedding", k=4, iters=2, dim=64)
    m2 = kmeans_centroids_exact(
        emb.repartition(7), "vec_id", "embedding", k=4, iters=2, dim=64
    )
    assert m1 == m2
    assert len(m1) == 4 and all(len(r["centroid_vec"]) == 64 for r in m1)


def test_ivf_kmeans_recall_not_worse_than_bootstrap(spark):
    """Trained centroids should place the true top-1 in the probed lists at
    least as reliably as the fixed-subset bootstrap on the fixture."""
    from tdei_extract_load_service_spark.operators.similarity import (
        ivf_topk_model,
        kmeans_centroids_exact,
        topk_cosine,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    model = kmeans_centroids_exact(emb, "vec_id", "embedding", k=8, iters=2, dim=64)
    approx = ivf_topk_model(emb, model, "vec_id", "embedding", qv, k=10, n_probe=2)
    exact_top1 = topk_cosine(emb, "vec_id", "embedding", qv, k=1).first()["id"]
    assert exact_top1 in {r["id"] for r in approx.collect()}


def test_embedding_lsh_pairs_subset_of_exact_with_identical_cosines(spark):
    """The scale-path embedding dedup: every LSH-surfaced pair must be a
    TRUE pair (exact-cosine verified), with cosine values identical to the
    all-pairs operator; first-collision-band union must emit no duplicate
    pairs. Recall < 1 is the documented LSH trade, not a bug."""
    from tdei_extract_load_service_spark.operators.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
    )
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).collect()
    }
    approx = embedding_lsh_pairs(
        emb, "vec_id", "embedding", threshold=0.45,
        dim=64, n_bands=4, planes_per_band=4, planes=make_planes(16, 64),
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in approx]
    assert len(pairs) == len(set(pairs)), "first-collision-band dedup leaked duplicates"
    for r in approx:
        key = (r["id_a"], r["id_b"])
        assert key in exact, f"LSH emitted a non-pair {key}"
        assert r["cosine"] == exact[key], f"cosine mismatch at {key}"
    assert exact, "fixture must contain true pairs at this threshold"
    recall = len(pairs) / len(exact)
    assert recall > 0.3, f"LSH recall collapsed: {recall} ({len(pairs)}/{len(exact)})"


def test_planes_per_band_sizing_keeps_buckets_bounded():
    """The x30 lesson as arithmetic: fixed plane counts make candidate
    volume quadratic in corpus size; the sizing helper keeps expected
    bucket population ~target so candidate work stays linear."""
    from tdei_extract_load_service_spark.operators.dedup import planes_per_band_for

    assert planes_per_band_for(100) == 4              # tiny corpus: floor
    assert planes_per_band_for(60_000, 256) == 8      # the x30 fixture
    assert planes_per_band_for(10**9, 256) == 22      # web scale
    assert planes_per_band_for(10**12, 256) == 24     # cap: key space bound
    for n in (10_000, 10**6, 10**8):
        p = planes_per_band_for(n, 256)
        assert n / (2 ** p) <= 256 or p == 24


def test_planes_per_band_matches_sql_derivation():
    """The corpus-aware hard-negatives oracle derives n_planes from
    COUNT(*) in DuckDB SQL; it must agree with planes_per_band_for for
    EVERY corpus size — including exact power-of-two boundaries, which
    is why both sides are integer-exact (smallest k in [4,24] with
    256·2^k >= n) instead of ceil(log2(...)) through libm."""
    import duckdb

    from tdei_extract_load_service_spark.operators.dedup import planes_per_band_for

    sql = """
    SELECT COALESCE(
      (SELECT MIN(t.k) FROM range(4, 25) t(k) WHERE 256 * (1::BIGINT << t.k) >= ?),
      24) AS n
    """
    boundary = [1, 100, 255, 256, 257, 511, 512, 513, 4095, 4096, 4097]
    boundary += [256 * 2**k for k in (4, 5, 10, 20, 24, 25)]
    boundary += [256 * 2**k + d for k in (4, 10, 24) for d in (-1, 1)]
    boundary += [60_000, 10**6, 10**9, 10**12]
    con = duckdb.connect()
    for n in boundary:
        got = con.execute(sql, [n]).fetchone()[0]
        assert got == planes_per_band_for(n), f"SQL/Python sizing split at n={n}"


def test_dedup_clusters_reports_non_convergence(spark):
    """max_iter exhaustion on a path longer than the budget must be
    visible via metrics, not silent: labels are a valid PARTIAL
    propagation and converged=False tells the caller to raise max_iter."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.dedup import dedup_clusters

    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    path = spark.range(11).select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    metrics = {}
    out = dedup_clusters(ids, path, max_iter=3, metrics=metrics)
    assert out.count() == 12
    assert metrics == {"rounds": 3, "converged": False}
    metrics2 = {}
    dedup_clusters(ids, path, max_iter=15, metrics=metrics2).collect()
    assert metrics2["converged"] and metrics2["rounds"] == 12


def test_embedding_lsh_auto_sizing_scales_with_corpus(spark):
    """VERDICT r5 #3: with no explicit planes, the operator derives
    planes_per_band from the CORPUS SIZE — two different corpus sizes must
    pick different bucket counts, and the auto-sized result must stay a
    subset of the exact pairs with identical cosines."""
    from tdei_extract_load_service_spark.operators.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
        planes_per_band_for,
    )

    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    # 10x-replicated corpus with distinct ids: big enough (5000) to clear
    # the 4-plane floor that the 500-row fixture sits under
    big = emb.crossJoin(spark.range(10).withColumnRenamed("id", "_rep")).select(
        (F.col("vec_id") + F.col("_rep") * 1_000_000).alias("vec_id"),
        "embedding",
    )

    m_full, m_big = {}, {}
    approx_full = embedding_lsh_pairs(
        emb, "vec_id", "embedding", threshold=0.45, dim=64, n_bands=4,
        metrics=m_full,
    )
    embedding_lsh_pairs(
        big, "vec_id", "embedding", threshold=1.01, dim=64, n_bands=4,
        metrics=m_big,
    )
    assert m_full["planes_per_band"] == planes_per_band_for(n)
    assert m_big["planes_per_band"] == planes_per_band_for(10 * n)
    assert m_big["planes_per_band"] > m_full["planes_per_band"], (
        f"corpus sizes {n} and {10 * n} must size buckets differently"
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).collect()
    }
    rows = approx_full.collect()
    assert rows, "auto-sized run must surface pairs on the fixture"
    for r in rows:
        key = (r["id_a"], r["id_b"])
        assert key in exact, f"auto-sized LSH emitted a non-pair {key}"
        assert r["cosine"] == exact[key]


def test_embedding_lsh_releases_its_cache(spark):
    """ADVICE r5 #3: repeated calls must not accumulate persisted blocks —
    the banded working frame is unpersisted once the (checkpointed) result
    is materialized."""
    from tdei_extract_load_service_spark.operators.dedup import embedding_lsh_pairs
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.catalog.clearCache()  # session-shared cache: isolate this probe
    jvm_catalog = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(2):
        embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.45, dim=64,
            n_bands=4, planes_per_band=4, planes=make_planes(16, 64),
        ).count()
    assert jvm_catalog.isEmpty(), "banded frames left persisted after return"


def test_winnow_pairs_exact_and_capped(spark):
    """Substring-level dedup: identical docs pair at 1.0; docs sharing a
    long passage pair above docs sharing nothing; the hot-hash cap keeps
    results a SUBSET of the uncapped pairs with never-higher jaccard
    (the documented recall trade)."""
    from tdei_extract_load_service_spark.operators.dedup import winnow_pairs

    passage = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [
            (1, passage),
            (2, passage),                                  # exact dup
            (3, "INTRO " + passage + " OUTRO trailing words here"),
            (4, "completely unrelated content with different words entirely"),
        ],
        "doc_id: long, text: string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in winnow_pairs(df, "doc_id", "text", threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs.get((1, 3), 0.0) > pairs.get((1, 4), 0.0)
    assert pairs.get((1, 3), 0.0) > 0.3  # shared passage dominates

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in winnow_pairs(
                docs, "doc_id", "text", threshold=0.5, max_hash_df=None
            ).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in winnow_pairs(
                  docs, "doc_id", "text", threshold=0.5, max_hash_df=64
              ).collect()}
    assert full, "fixture must contain winnow pairs at 0.5"
    assert set(capped) <= set(full), "cap must never CREATE pairs"
    for key, j in capped.items():
        assert j <= full[key] + 1e-9, f"cap raised jaccard at {key}"


def test_winnow_cluster_composition(spark):
    """Winnow pairs -> connected components -> survivor election (the
    r7 composed entry): every doc gets a label, the label is the min id
    of its component (so labels are <= their doc ids and are themselves
    survivors), transitive chains collapse into ONE cluster even when
    the endpoints never pair directly, and non-duplicates stay
    singletons."""
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_clusters,
        winnow_pairs,
    )

    passage = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, passage),
        (2, passage + " extra tail"),
        (3, "INTRO " + passage),        # chains to 1 via 2 or directly
        (4, "completely unrelated content with different words entirely"),
        (5, "short"),                    # below winnow threshold: NULL set
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = winnow_pairs(df, "doc_id", "text", threshold=0.3)
    labels = {r["doc_id"]: r["cluster_id"] for r in
              dedup_clusters(df.select("doc_id"), pairs, "doc_id").collect()}
    assert set(labels) == {1, 2, 3, 4, 5}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == 4 and labels[5] == 5
    survivors = {d for d, c in labels.items() if d == c}
    assert survivors == {1, 4, 5}


# --- stored banded-LSH index (round 10, VERDICT r9 #4) --------------------


def _emb_lsh_index(spark, tag=""):
    import os

    src = os.path.join(SF_SMOKE, "embeddings.parquet")
    st = os.stat(src)
    emb = spark.read.parquet(src)
    return D.build_embedding_lsh_index(
        emb, "vec_id", "embedding", dim=64, n_bands=4, planes_per_band=4,
        planes=S.make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:pytest{tag}",
    )


def test_embedding_lsh_stored_bit_identical_to_inline(spark):
    """The whole point of the store: serving from the parquet-resident
    banded frame emits EXACTLY the inline operator's pairs (same
    candidates, same round-6 cosines) — doubles round-trip parquet
    unchanged."""
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    inline = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.45, dim=64,
            n_bands=4, planes_per_band=4, planes=S.make_planes(16, 64),
        ).collect()
    }
    path = _emb_lsh_index(spark)
    stored = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_lsh_pairs_stored(
            spark, path, threshold=0.45
        ).collect()
    }
    assert stored == inline and inline


def test_embedding_lsh_index_is_write_once(spark):
    import os

    path = _emb_lsh_index(spark, tag="wo")
    meta = os.path.join(path, "_meta.json")
    before = os.stat(meta).st_mtime_ns
    # second call: cache hit (or at worst the _meta.json existence gate)
    # — the layout must NOT be rewritten
    assert _emb_lsh_index(spark, tag="wo") == path
    assert os.stat(meta).st_mtime_ns == before


def test_embedding_lsh_probe_matches_band0_semantics(spark):
    """Probe = exact cosines over the query's band-0 bucket, served from
    ONE pruned _pre directory. Expectation computed independently: band
    the corpus inline, filter to the query's band-0 bucket, rank."""
    import json
    import os

    path = _emb_lsh_index(spark)
    meta = json.load(open(os.path.join(path, "_meta.json")))
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    qrow = emb.orderBy("vec_id").first()
    qvec = [float(x) for x in qrow.embedding]

    got = D.embedding_lsh_probe_stored(
        spark, path, qvec, threshold=-1.0, k=10
    ).collect()
    assert got, "query's own bucket can never be empty"

    band0 = meta["planes"][: meta["planes_per_band"]]
    qb = D._lsh_bucket_py(qvec, band0)
    banded = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        S.lsh_bucket(F.col("embedding"), 64, meta["planes_per_band"], band0).alias("_b0"),
    ).where(F.col("_b0") == qb)
    from tdei_extract_load_service_spark.operators.similarity import _vec_lit

    expected = {
        (r.id, r.cosine)
        for r in banded.select(
            "id",
            F.round(D.cosine_similarity(F.col("vec"), _vec_lit(qvec)), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(10)
        .collect()
    }
    assert {(r.id, r.cosine) for r in got} == expected
    # the query vector itself lives in its own bucket at cosine 1.0
    assert any(r.id == qrow.vec_id and r.cosine == 1.0 for r in got)


# --- cross-run incremental dedup (round 10, VERDICT r9 #5) -----------------


def test_dedup_incremental_equals_full_recompute(spark, tmp_path):
    """Nightly shape: base indexed yesterday, delta merged tonight. The
    merged survivor state must be BIT-IDENTICAL to a from-scratch
    dedup over base+delta — including the adversarial cases: a delta
    doc with a SMALLER id than the base survivor (survivorship must
    flip), dups entirely within the delta, and dups entirely in base."""
    rows = [
        (10, "alpha"), (11, "beta"), (12, "alpha"),      # base: alpha dup'd
        (13, "gamma"), (14, "gamma"),                    # base-only dup pair
        (1, "alpha"),                                    # delta: NEW survivor for alpha
        (20, "beta"),                                    # delta dup of base beta
        (30, "delta-only"), (31, "delta-only"),          # delta-internal dup
        (40, "fresh"),                                   # delta-only unique
    ]
    base = spark.createDataFrame(rows[:5], "doc_id long, text string")
    delta = spark.createDataFrame(rows[5:], "doc_id long, text string")
    path = D.build_fingerprint_index(
        base, "doc_id", ["text"], corpus_key=f"pytest:{tmp_path}"
    )
    got = {
        r.content_hash: (r.keep_id, r.n_dups)
        for r in D.dedup_incremental(
            spark, path, delta, "doc_id", ["text"]
        ).collect()
    }
    full = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r.content_hash: (r.keep_id, r.n_dups)
        for r in D.dedup_exact_groups(full, "doc_id", ["text"]).collect()
    }
    assert got == want
    # survivorship flipped to the smaller delta id
    alpha_hash = next(
        r.content_hash
        for r in D.dedup_exact_groups(
            spark.createDataFrame([(1, "alpha")], "doc_id long, text string"),
            "doc_id",
            ["text"],
        ).collect()
    )
    assert got[alpha_hash] == (1, 3)


def test_fingerprint_index_write_once(spark, tmp_path):
    import os

    base = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, text string"
    )
    path = D.build_fingerprint_index(
        base, "doc_id", ["text"], corpus_key=f"pytest-wo:{tmp_path}"
    )
    marker = os.path.join(path, "_SUCCESS")
    before = os.stat(marker).st_mtime_ns
    assert (
        D.build_fingerprint_index(
            base, "doc_id", ["text"], corpus_key=f"pytest-wo:{tmp_path}"
        )
        == path
    )
    assert os.stat(marker).st_mtime_ns == before


def test_dedup_embedding_incremental_equals_full_restricted(spark):
    """Incremental near-dup (delta vs stored index) must equal the
    FULL-corpus LSH pair set restricted to pairs touching the delta —
    bit-identically, including the first-collision-band bookkeeping."""
    import os

    sf = SF_SMOKE
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    delta_cond = F.col("vec_id") % 4 == 0
    src = os.path.join(sf, "embeddings.parquet")
    st = os.stat(src)
    path = D.build_embedding_lsh_index(
        emb.where(~delta_cond), "vec_id", "embedding", dim=64,
        n_bands=4, planes_per_band=4, planes=S.make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:incr_base",
    )
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in D.dedup_embedding_incremental(
            spark, path, emb.where(delta_cond), "vec_id", "embedding",
            threshold=0.3,
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.3, dim=64,
            n_bands=4, planes_per_band=4, planes=S.make_planes(16, 64),
        ).collect()
        if r.id_a % 4 == 0 or r.id_b % 4 == 0
    }
    assert got == full and got
    # and no base-base pair leaks in
    assert all(a % 4 == 0 or b % 4 == 0 for a, b in got)


def test_stored_index_cache_keys_include_column_args(spark, tmp_path):
    """ADVICE r10: two builds over the same corpus_key differing only in
    id_col / prefix_bits must be DIFFERENT stored indexes, not a silent
    cache hit on the first build."""
    base = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "x"), (3, 30, "y")],
        "doc_id long, alt_id long, text string",
    )
    ck = f"pytest-key:{tmp_path}"
    p1 = D.build_fingerprint_index(base, "doc_id", ["text"], corpus_key=ck)
    p2 = D.build_fingerprint_index(base, "alt_id", ["text"], corpus_key=ck)
    assert p1 != p2
    keep1 = {r.keep_id for r in spark.read.parquet(p1).collect()}
    keep2 = {r.keep_id for r in spark.read.parquet(p2).collect()}
    assert keep1 == {1, 3} and keep2 == {10, 30}

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").limit(32)
    planes = S.make_planes(8, 64)
    kw = dict(dim=64, n_bands=2, planes_per_band=4, planes=planes,
              corpus_key=f"pytest-key-emb:{tmp_path}")
    e1 = D.build_embedding_lsh_index(emb, "vec_id", "embedding", prefix_bits=2, **kw)
    e2 = D.build_embedding_lsh_index(emb, "vec_id", "embedding", prefix_bits=3, **kw)
    assert e1 != e2
    assert D._emb_lsh_meta(e1)["prefix_shift"] == 2   # 4 planes - 2 bits
    assert D._emb_lsh_meta(e2)["prefix_shift"] == 1


def test_dedup_embedding_incremental_check_disjoint_raises(spark, tmp_path):
    """Re-ingested ids (present in BOTH the stored index and the delta)
    violate the disjoint-ids precondition; the opt-in guard raises
    instead of silently emitting duplicate pairs."""
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").limit(16)
    path = D.build_embedding_lsh_index(
        emb, "vec_id", "embedding", dim=64, n_bands=2, planes_per_band=4,
        planes=S.make_planes(8, 64),
        corpus_key=f"pytest-disjoint:{tmp_path}",
    )
    with pytest.raises(ValueError, match="delta ids overlap"):
        D.dedup_embedding_incremental(
            spark, path, emb.limit(4), "vec_id", "embedding",
            threshold=0.0, check_disjoint=True,
        )
    # disjoint delta passes the guard
    disjoint = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).limit(2)
    D.dedup_embedding_incremental(
        spark, path, disjoint, "vec_id", "embedding",
        threshold=0.99, check_disjoint=True,
    ).count()


def _multiband_index(spark, tag=""):
    import os

    src = os.path.join(SF_SMOKE, "embeddings.parquet")
    st = os.stat(src)
    emb = spark.read.parquet(src)
    return D.build_embedding_lsh_index(
        emb, "vec_id", "embedding", dim=64, n_bands=4, planes_per_band=4,
        planes=S.make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:pytest-mb{tag}",
        replicate_bands=True,
    )


def test_multiband_probe_full_recall(spark):
    """The multi-band probe must return EXACTLY the any-band collision
    set (driver-side reference over the same plane literals), ranked by
    exact cosine — and strictly more than band-0-only probing for a
    query whose collisions span bands."""
    import math

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    rows = {r.vec_id: list(r.embedding) for r in emb.collect()}
    planes = S.make_planes(16, 64)
    path = _multiband_index(spark)

    def buckets(vec):
        out = []
        for b in range(4):
            out.append(D._lsh_bucket_py(vec, planes[b * 4:(b + 1) * 4]))
        return out

    bk = {i: buckets(v) for i, v in rows.items()}

    def cosine(a, b):
        dot = 0.0
        for x, w in zip(a, b):
            dot += float(x) * float(w)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for x in b:
            nb += float(x) * float(x)
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    checked_gain = False
    for qid in sorted(rows)[:8]:
        q = rows[qid]
        want_ids = {i for i, bs in bk.items()
                    if any(bs[b] == bk[qid][b] for b in range(4))}
        ranked = sorted(
            ((cosine(rows[i], q), i) for i in want_ids),
            key=lambda t: (-t[0], t[1]),
        )[:50]
        got = [
            (r.cosine, r.id)
            for r in D.embedding_lsh_probe_multiband(
                spark, path, q, threshold=-1.0, k=50
            ).collect()
        ]
        assert got == ranked, f"qid={qid}"
        band0_ids = {i for i, bs in bk.items() if bs[0] == bk[qid][0]}
        if len(want_ids) > len(band0_ids):
            checked_gain = True
    assert checked_gain, "fixture never exercised a later-band collision"


def test_multiband_probe_rejects_single_copy_layout(spark, tmp_path):
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").limit(8)
    path = D.build_embedding_lsh_index(
        emb, "vec_id", "embedding", dim=64, n_bands=2, planes_per_band=4,
        planes=S.make_planes(8, 64), corpus_key=f"pytest-single:{tmp_path}",
    )
    with pytest.raises(ValueError, match="replicate_bands"):
        D.embedding_lsh_probe_multiband(spark, path, [0.0] * 64)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every key IN the built set must probe True (structural
    guarantee); keys outside flag at ~the configured false-positive
    rate (16 bits/key, 5 hashes -> ~0.05%; assert a loose 2% bound)."""
    base = spark.range(0, 4000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    probe_in = base
    probe_out = spark.range(10_000, 18_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    bloom = D.build_bloom(base, "k", bits_per_key=16, n_hashes=5)
    hits_in = (
        D.bloom_might_contain(probe_in, "k", bloom)
        .where(F.col("might_contain"))
        .count()
    )
    assert hits_in == 4000  # zero false negatives
    fp = (
        D.bloom_might_contain(probe_out, "k", bloom)
        .where(F.col("might_contain"))
        .count()
    )
    assert fp / 8000 < 0.02, f"false-positive rate too high: {fp}/8000"


def test_bloom_jvm_probe_equals_arrow_probe(spark):
    """The JVM broadcast-join probe (build_bloom_words, the scale path
    with no driver collect and no per-Python-worker bitmap copy) must
    flag EXACTLY the same rows as the numpy/Arrow probe over the same
    built filter, and its plan must be Python-free with a single reused
    broadcast exchange."""
    base = spark.range(0, 4000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    probe = spark.range(2000, 10_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    arrow_bloom = D.build_bloom(base, "k", bits_per_key=16, n_hashes=5)
    jvm_bloom = D.build_bloom_words(base, "k", bits_per_key=16, n_hashes=5)
    flagged_jvm = D.bloom_might_contain(probe, "k", jvm_bloom)
    got_arrow = {
        r.k
        for r in D.bloom_might_contain(probe, "k", arrow_bloom)
        .where(F.col("might_contain"))
        .collect()
    }
    rows = flagged_jvm.collect()
    got_jvm = {r.k for r in rows if r.might_contain}
    assert got_jvm == got_arrow
    # reuse is an AQE runtime decision: assert on the EXECUTED plan —
    # the 5 per-hash joins must share ONE materialized bitmap broadcast
    plan = flagged_jvm._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # fully JVM-side
    import re

    stages = set(re.findall(r"BroadcastQueryStage \d+", plan))
    assert len(stages) == 5 and plan.count("ReusedExchange") == 4


def test_bloom_prefilter_members_equals_exact_and_prunes(spark, tmp_path):
    """The bloom-accelerated membership must equal the plain semi join
    EXACTLY, and on a mostly-new delta the bloom must prune most rows
    before the join (the stats hook shows the candidate volume)."""
    base = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("text"),
    )
    # delta: 100 re-ingested texts (new ids) + 2900 genuinely new
    dup = spark.range(0, 100).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("text"),
    )
    new = spark.range(0, 2900).select(
        (F.col("id") + 200_000).alias("doc_id"),
        F.concat(F.lit("new-"), F.col("id").cast("string")).alias("text"),
    )
    delta = dup.unionByName(new)
    path = D.build_fingerprint_index(
        base, "doc_id", ["text"], corpus_key=f"pytest-bloom:{tmp_path}"
    )
    stats: dict = {}
    got = {
        r.id
        for r in D.bloom_prefilter_members(
            spark, path, delta, "doc_id", ["text"], stats=stats
        ).collect()
    }
    assert got == {100_000 + i for i in range(100)}
    assert stats["n_delta"] == 3000 and stats["n_members"] == 100
    # the bloom discarded (nearly) all 2900 new rows before the join
    assert stats["n_candidates"] < 100 + 0.02 * 2900 + 1
