"""Dedup-family entries (north-star; operators/dedup.py).

Split out of the monolithic catalog.py (round-8 catalog diet, VERDICT
r7 #6). Importing this module registers its entries in
``catalog.REGISTRY``; the hub imports every family module at the end of
catalog.py, so ``from ...catalog import REGISTRY`` keeps working
unchanged. See catalog.py's module docstring for the determinism rules
every entry follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdei_extract_load_service_spark import oracles as ORACLES
from tdei_extract_load_service_spark.catalog import (
    _query_vec,
    _read,
    _read_events,
    register,
)
from tdei_extract_load_service_spark.functions import maps as M
from tdei_extract_load_service_spark.functions import timestamps as TS
from tdei_extract_load_service_spark.operators import relational as R
from tdei_extract_load_service_spark.operators.query_builder import (
    DynamicQueryBuilder,
)
from tdei_extract_load_service_spark.session import sort_boundary, spread


# ---------------------------------------------------------------------------
# Dedup family (north-star; operators/dedup.py)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy with surviving-id selection; the
    shuffle carries (hash, id), never the documents."""
    from tdei_extract_load_service_spark.operators.dedup import dedup_exact_groups

    return dedup_exact_groups(_read(spark, sf_dir, "documents"), "doc_id", ["text"])


# Exact 3-gram Jaccard pairs at >= 0.8 — shared by the exact inverted-index
# operator AND the LSH-verified operator: lsh_verified_pairs emits *exact*
# Jaccard on its surviving candidates, and with 16x4 bands the miss
# probability of a 0.8-pair is (1-0.8^4)^16 ~= 2e-4, so on the fixture both
# operators produce the identical pair set and one SQL oracle serves both.
_NGRAM_JACCARD_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.sh, b.sh))
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM d a, d b
    WHERE a.doc_id < b.doc_id
      AND ROUND(len(list_intersect(a.sh, b.sh))
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8
    """


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs at >= 0.8 via inverted-index
    blocking (no cross join; the oracle cross-joins because DuckDB can,
    the Spark plan must not — semantics identical)."""
    from tdei_extract_load_service_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


@register(
    "dedup_ngram_containment",
    """
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
      FROM documents
    )
    SELECT doc_a, doc_b, containment, jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND(len(list_intersect(a.sh, b.sh))
                   / least(len(a.sh), len(b.sh)), 6) AS containment,
             ROUND(len(list_intersect(a.sh, b.sh))
                   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
    ) WHERE containment >= 0.9
    """,
)
def q_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram CONTAINMENT pairs at >= 0.9 (Broder's asymmetric
    coefficient |A∩B|/min(|A|,|B|)) — the sub-document-duplication
    signal Jaccard structurally misses (a boilerplate block inside a
    long page unions away). Same inverted-index blocking as
    dedup_ngram_jaccard; both coefficients emitted so the value hash
    certifies the containment arithmetic even where the fixture's pair
    set coincides with the Jaccard one."""
    from tdei_extract_load_service_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    return ngram_containment_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.9
    )


@register("dedup_minhash_lsh", None)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) candidate pairs with estimated
    Jaccard >= 0.5. xxhash64-seeded — deterministic but not
    SQL-mirrorable in DuckDB (no xxhash64), so rows-only check; exactness
    is cross-validated against dedup_ngram_jaccard in tests.

    No global sort: the rows-only check counts rows, and a final orderBy
    costs a full extra execution of the join pipeline for range-partition
    sampling (measured ~3s of the cold run at sf0.1)."""
    from tdei_extract_load_service_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=64, bands=16, n=3, threshold=0.5,
    )


@register("dedup_simhash", None)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs with Hamming <= 6 via 16-bit chunk
    blocking. xxhash64-based -> rows-only check (validated in tests).
    No global sort — rows-only check, see dedup_minhash_lsh."""
    from tdei_extract_load_service_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=6
    )


@register(
    "dedup_simhash_exact",
    """
    WITH d AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            w -> substr(md5(w), 1, 16)) AS hl,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             list_transform(generate_series(0, 63), j ->
               CASE WHEN 2 * len(list_filter(hl, s ->
                   (((strpos('0123456789abcdef',
                              substr(s, j // 4 + 1, 1)) - 1)
                     >> (3 - (j % 4))) & 1) = 1)) > n
               THEN 1 ELSE 0 END) AS bl
      FROM d
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             CAST(len(list_filter(generate_series(1, 64),
                  k -> a.bl[k] <> b2.bl[k])) AS INT) AS hamming
      FROM b a, b b2 WHERE a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 7
    ORDER BY doc_a ASC, doc_b ASC
    """,
)
def q_dedup_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, FULLY VALUE-ORACLE-CHECKED — the upgrade
    the original ``dedup_simhash`` could not have: its xxhash64 word
    hashes have no DuckDB twin (rows-only forever), while this twin
    derives word-hash bits from the 16 leading md5 nibbles through an
    explicit character CASE both engines state identically
    (operators/dedup.py simhash_md5_bits), packs them ANSI-safely
    (pack_bits64) and joins through hamming_hash_pairs — 8 chunks of 8
    bits with max_hamming=7 < chunks, so the blocking is
    PIGEONHOLE-COMPLETE and the oracle's exact cross join certifies the
    blocked join's completeness, candidates AND distances every round.
    The fixture's word-soup near-dups land 168 pairs at <= 7 at sf0.01
    — non-vacuous and selective."""
    from tdei_extract_load_service_spark.operators.dedup import (
        hamming_hash_pairs,
        simhash64,
    )

    # spread BEFORE the hash projection: a single-row-group fixture scan
    # is one task, and Catalyst keeps the projection below a later
    # repartition — hashing after the exchange is what unlocks the
    # cores (measured 33.5s -> 3.7s for the hash stage at sf0.1)
    docs = spread(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    # fused simhash64 (r13): pack_bits64 over the fold expression
    # duplicated the whole per-word fold tree (see simhash64 docstring);
    # bit-identical output, pytest-pinned against the two-step form
    sh = docs.select(
        F.col("doc_id").alias("id"),
        simhash64("text", "md5").alias("sh64"),
    )
    pairs = hamming_hash_pairs(sh, "id", "sh64", max_hamming=7, chunks=8)
    return pairs.orderBy(F.col("doc_a").asc(), F.col("doc_b").asc())


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs form — the oracle
    twin; scale path is ``dedup_embedding_lsh``)."""
    from tdei_extract_load_service_spark.operators.dedup import embedding_cosine_pairs

    return embedding_cosine_pairs(
        _read(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.45
    )


@register("dedup_embedding_lsh", ORACLES.embedding_lsh_oracle_sql(n_bands=4, planes_per_band=4, threshold=0.45))
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs THE SCALE WAY: banded random-hyperplane
    LSH candidates + exact cosine verify (operators/dedup.py
    embedding_lsh_pairs) — closes the documented gap where
    dedup_embedding_cosine was the only (all-pairs) embedding dedup.
    Seeded plane literals are shared verbatim with the oracle, so the
    approximate operator is fully value-oracle-checked: same candidates,
    same cosines. Every emitted pair is exact-verified TRUE; recall is
    the bands x planes knob."""
    from tdei_extract_load_service_spark.operators.dedup import embedding_lsh_pairs
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    return embedding_lsh_pairs(
        _read(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.45, dim=64, n_bands=4, planes_per_band=4,
        planes=make_planes(16, 64),
    )


@register(
    "dedup_embedding_lsh_stored",
    ORACLES.embedding_lsh_oracle_sql(
        n_bands=4, planes_per_band=4, threshold=0.45
    ),
)
def q_dedup_embedding_lsh_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs served from the WRITE-ONCE stored banded-LSH index
    (VERDICT r9 #4) — the dedup twin of the stored PQ index and BM25
    postings: ``build_embedding_lsh_index`` materializes the banded
    frame (id, vec, norm, band buckets) once per corpus, partitioned by
    the band-0 bucket prefix; steady-state serving is just the
    first-collision-band verify joins over the columnar scan. Output is
    BIT-IDENTICAL to dedup_embedding_lsh (same oracle; stored==inline
    pinned in tests/test_dedup_similarity.py) because the stored doubles
    round-trip parquet exactly. The nightly-100 TB shape: the banding
    folds are paid at index-build time, every downstream pair job
    (thresholds, clusterings) rides the scan."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        build_embedding_lsh_index,
        embedding_lsh_pairs_stored,
    )
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = build_embedding_lsh_index(
        _read(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        dim=64,
        n_bands=4,
        planes_per_band=4,
        planes=make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}",
    )
    return embedding_lsh_pairs_stored(spark, path, threshold=0.45)


@register("embedding_lsh_probe_stored", ORACLES.lsh_bucketed_oracle_sql())
def q_embedding_lsh_probe_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online have-we-seen-this probe against the stored banded-LSH
    index: the query's band-0 bucket is computed DRIVER-side from the
    index meta's plane literals, so the scan carries a literal partition
    filter — ONE pruned directory read, no join (plan-audited). The
    oracle is the same SQL that certifies similarity_lsh_bucketed: the
    first 4 planes of make_planes(16, 64) ARE make_planes(4, 64) (one
    seeded PRNG stream), so the stored probe and the fresh bucketed scan
    are independently certified against one oracle — stored == fresh,
    value-checked every round."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        build_embedding_lsh_index,
        embedding_lsh_probe_stored,
    )
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = build_embedding_lsh_index(
        _read(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        dim=64,
        n_bands=4,
        planes_per_band=4,
        planes=make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}",
    )
    return embedding_lsh_probe_stored(
        spark, path, _query_vec(spark, sf_dir), threshold=-1.0, k=10
    )


@register(
    "embedding_lsh_probe_multiband",
    ORACLES.lsh_multiband_probe_oracle_sql(n_bands=4, planes_per_band=4, k=10),
)
def q_embedding_lsh_probe_multiband(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL-RECALL online probe (VERDICT r10 #5): the stored banded-LSH
    layout replicated per band (build_embedding_lsh_index
    replicate_bands=True), probed with one pruned-directory read PER
    BAND and unioned — any row colliding with the query in ANY band is
    a candidate, closing the single-band probe's recall gap while every
    scan keeps literal (band, _pre) PartitionFilters (plan-audited).
    The oracle is embedding_lsh_oracle_sql's OR-join restricted to the
    query id: candidates AND exact cosines value-certified."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        build_embedding_lsh_index,
        embedding_lsh_probe_multiband,
    )
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = build_embedding_lsh_index(
        _read(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        dim=64,
        n_bands=4,
        planes_per_band=4,
        planes=make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}",
        replicate_bands=True,
    )
    return embedding_lsh_probe_multiband(
        spark, path, _query_vec(spark, sf_dir), threshold=-1.0, k=10
    )


@register(
    "dedup_bloom_prefilter",
    """
    SELECT d.doc_id AS id, md5(substr(d.text, 1, 32)) AS content_hash
    FROM documents d
    WHERE d.doc_id % 4 = 0
      AND EXISTS (
        SELECT 1 FROM documents b
        WHERE NOT (b.doc_id % 4 = 0)
          AND substr(b.text, 1, 32) = substr(d.text, 1, 32)
      )
    ORDER BY d.doc_id ASC
    """,
)
def q_dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated membership of tonight's delta (doc_id % 4 == 0)
    in the stored fingerprint index (operators/dedup.py
    bloom_prefilter_members): the index's content hashes build a
    distributed bitmap (ONE bit_or aggregation — order-independent, a
    1000-executor build is bit-identical), delta rows the bloom rejects
    are definitely-new and never reach the join, and the might-be-dup
    survivors are exact-verified by a semi join. No false negatives by
    construction and false positives die in the verify join, so the
    output equals this straight EXISTS oracle — the probabilistic
    structure is value-certified through its exact closure, the same
    discipline as the LSH entries. The 100 TB shape: a fresh crawl is
    mostly-new, so a broadcast bitmap prunes the bulk of the delta at
    scan speed before any shuffle. Membership runs on a 32-char
    prefix fingerprint (the fixture corpus has no full-text overlap
    between the splits — the prefix key keeps the certified result
    non-vacuous: 6 members at sf0.01, 91 at sf0.1)."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        bloom_prefilter_members,
        build_fingerprint_index,
    )

    docs = _read(spark, sf_dir, "documents").withColumn(
        "text_head", F.substring("text", 1, 32)
    )
    delta_cond = F.col("doc_id") % 4 == 0
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path = build_fingerprint_index(
        docs.where(~delta_cond),
        "doc_id",
        ["text_head"],
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:bloom_base",
    )
    out = bloom_prefilter_members(
        spark, path, docs.where(delta_cond), "doc_id", ["text_head"]
    )
    # sort_boundary: the bloom word-probe joins are the final stage (r13)
    return sort_boundary(out, "id").orderBy(F.col("id").asc())


@register(
    "dedup_incremental",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run incremental exact dedup (VERDICT r9 #5): the corpus
    arrives as yesterday's base (75%) + tonight's delta shard (doc_id %
    4 == 0); the base's survivor state lives in a stored fingerprint
    index (operators/dedup.py build_fingerprint_index) and the delta is
    merged against it WITHOUT re-reading base documents. The oracle is
    the FULL-table dedup SQL, so every driver round value-certifies the
    claim that incremental merge == full recompute, bit-identically —
    same discipline as similarity_ivf_pq_incremental."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        build_fingerprint_index,
        dedup_incremental,
    )

    docs = _read(spark, sf_dir, "documents")
    delta_cond = F.col("doc_id") % 4 == 0
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path = build_fingerprint_index(
        docs.where(~delta_cond),
        "doc_id",
        ["text"],
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:incr_base",
    )
    return dedup_incremental(
        spark, path, docs.where(delta_cond), "doc_id", ["text"]
    )


@register(
    "dedup_embedding_incremental",
    "SELECT * FROM (\n"
    + ORACLES.embedding_lsh_oracle_sql(
        n_bands=4, planes_per_band=4, threshold=0.45
    )
    + "\n) WHERE id_a % 4 = 0 OR id_b % 4 = 0",
)
def q_dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run incremental NEAR-dup detection (the banded-LSH twin of
    dedup_incremental): the base corpus (vec_id % 4 != 0) lives in the
    stored banded-LSH index; tonight's delta shard is banded with the
    index's frozen plane model and only pairs touching the delta are
    emitted — no base bucket recomputed, no base-base pair re-verified.
    The oracle is the FULL-corpus LSH pair SQL restricted to pairs with
    a delta endpoint, so incremental == full is value-certified every
    round (same discipline as dedup_incremental /
    similarity_ivf_pq_incremental)."""
    import os

    from tdei_extract_load_service_spark.operators.dedup import (
        build_embedding_lsh_index,
        dedup_embedding_incremental,
    )
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    emb = _read(spark, sf_dir, "embeddings")
    delta_cond = F.col("vec_id") % 4 == 0
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = build_embedding_lsh_index(
        emb.where(~delta_cond),
        "vec_id",
        "embedding",
        dim=64,
        n_bands=4,
        planes_per_band=4,
        planes=make_planes(16, 64),
        corpus_key=f"{src}:{st.st_size}:{st.st_mtime_ns}:incr_base",
    )
    return dedup_embedding_incremental(
        spark, path, emb.where(delta_cond), "vec_id", "embedding", threshold=0.45
    )


@register(
    "dedup_span_ngram",
    """
    WITH s AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 7, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS span
      FROM documents
    )
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM s GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_occurrences DESC, span ASC
    LIMIT 50
    """,
)
def q_dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate SPAN detection (operators/dedup.py
    duplicate_spans): every 8-token window occurring in >= 2 distinct
    documents, ranked by occurrence count — the span-granular signal of
    Lee et al. 2022 that whole-document dedup cannot see (boilerplate,
    license blocks, quoted passages). Spark builds spans with
    posexplode + lead() over one per-document window (single doc-id
    exchange, linear in tokens — NOT the shingling HOF, whose closed-over
    array Catalyst re-inlines per position); the oracle enumerates the
    same windows with list_transform/generate_series. LIMIT rides the
    unique span tiebreak."""
    from tdei_extract_load_service_spark.operators.dedup import duplicate_spans

    return duplicate_spans(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        n=8, min_docs=2, top_k=50,
    )


@register(
    "dedup_cluster",
    """
    WITH RECURSIVE
    d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND ROUND(len(list_intersect(a.sh, b.sh))
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8
    ),
    edges(a, b) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
      UNION SELECT doc_id, doc_id FROM documents
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs resolved into duplicate clusters (connected
    components; cluster_id = min doc id = the canonical survivor) — the
    step between pair generation and actually dropping duplicates in a
    training pipeline. Pair generation uses the production LSH+verify path
    (sub-quadratic; emits the exact-Jaccard pair set); min-label
    propagation then runs O(diameter) rounds of (id, label)-only shuffles.
    The oracle is the transitive-closure recursive CTE over the same
    exact-Jaccard edges."""
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_clusters,
        lsh_verified_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return dedup_clusters(docs.select("doc_id"), pairs, "doc_id")


@register(
    "dedup_golden_record",
    """
    WITH RECURSIVE
    d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND ROUND(len(list_intersect(a.sh, b.sh))
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8
    ),
    edges(a, b) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
      UNION SELECT doc_id, doc_id FROM documents
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    g AS (
      SELECT l.cluster_id, doc.doc_id, doc.n_chars, doc.source
      FROM labels l JOIN documents doc ON l.doc_id = doc.doc_id
    ),
    m AS (SELECT cluster_id, MAX(n_chars) AS mx FROM g GROUP BY cluster_id),
    surv AS (
      SELECT g.cluster_id, MIN(g.doc_id) AS survivor_id
      FROM g JOIN m ON g.cluster_id = m.cluster_id AND g.n_chars = m.mx
      GROUP BY g.cluster_id
    )
    SELECT g.cluster_id, surv.survivor_id,
           COUNT(*) AS n_members,
           COUNT(DISTINCT g.source) AS n_sources,
           array_to_string(list_sort(list(DISTINCT g.source)), ',') AS sources,
           CAST(SUM(g.n_chars) AS BIGINT) AS total_chars
    FROM g JOIN surv ON g.cluster_id = surv.cluster_id
    GROUP BY g.cluster_id, surv.survivor_id
    ORDER BY g.cluster_id ASC
    """,
)
def q_dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge — the golden-record step that completes the
    entity-resolution pipeline (pairs -> clusters -> ONE merged record
    per entity): per near-dup cluster, the longest-text member wins
    (n_chars desc, doc_id asc tiebreak — the MDM "most complete
    attribute" rule), with merged lineage columns (member count,
    distinct sources as a sorted joined list, total chars). Pair
    generation and components are the production sub-quadratic path
    (lsh_verified_pairs + min-label propagation); the survivor is a
    struct-min argmax (min over (-n_chars, doc_id)) folded into the
    lineage aggregation, while the ORACLE derives it through
    MAX-then-MIN aggregation joins — independent constructions. Sorted
    array_join makes the collected source set order-deterministic on
    both engines."""
    from tdei_extract_load_service_spark.operators.dedup import (
        dedup_clusters,
        lsh_verified_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    labels = dedup_clusters(docs.select("doc_id"), pairs, "doc_id")
    g = labels.join(
        docs.select("doc_id", "n_chars", "source"), "doc_id"
    )
    # survivor argmax folded INTO the lineage aggregation: the (n_chars
    # desc, doc_id asc) winner is min(struct(-n_chars, doc_id)) — exact
    # because n_chars is never NULL (fixture and oracle agree) — so one
    # grouped pass replaces the old window + second evaluation of ``g``
    # + merged-x-surv join (Spark does not dedup common subplans; ``g``
    # ran twice and its cluster_id exchange three times)
    return (
        g.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("_neg_chars"),
                    F.col("doc_id").alias("_doc"),
                )
            )["_doc"].alias("survivor_id"),
            F.count("*").alias("n_members"),
            F.countDistinct("source").alias("n_sources"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
                "sources"
            ),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "cluster_id",
            "survivor_id",
            "n_members",
            "n_sources",
            "sources",
            "total_chars",
        )
        # sort_boundary: the merge aggregation (collect_set +
        # countDistinct over the labels-x-docs join) is the final
        # stage (r13)
        .transform(lambda d: sort_boundary(d, "cluster_id"))
        .orderBy(F.col("cluster_id").asc())
    )


@register(
    "dedup_minhash_exact",
    ORACLES.minhash_md5_oracle_sql(
        n=3, num_hashes=64, bands=16, threshold=0.5, seed=2024
    ),
)
def q_dedup_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) near-dup pairs, FULLY VALUE-ORACLE-
    CHECKED — the upgrade dedup_minhash_lsh's xxhash64 signatures could
    never have: one md5 base hash per shingle (leading 8 hex chars,
    parsed identically by Spark conv() and DuckDB's '0x' cast) fans out
    through 64 SEEDED linear permutations (a*h + b) % (2^61-1) — pure
    ANSI-safe integer arithmetic — so the oracle restates the whole
    construction: signatures, band collisions, first-collision dedup
    AND the integer match count. Candidates are pairs sharing at least
    one full band; a pair survives at estimated Jaccard >= 0.5
    (n_matching >= 32). The xxhash64 original stays on the bench
    trendline as the cheap-hash production form (operators/dedup.py
    minhash_md5_pairs; one md5 per shingle — the 64-way fan-out is
    integer ops over the persisted base array)."""
    from tdei_extract_load_service_spark.operators.dedup import (
        minhash_md5_pairs,
    )

    return minhash_md5_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=64, bands=16, threshold=0.5, seed=2024,
    ).orderBy(F.col("doc_a").asc(), F.col("doc_b").asc())


@register(
    "dedup_semantic",
    ORACLES.semantic_dedup_oracle_sql(k=8, dim=64, iters=2, threshold=0.45),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — SEMANTIC dedup over the embedding
    corpus (operators/dedup.py semantic_dedup): deterministic exact
    k-means (the DECIMAL-mean Lloyd machinery similarity_ivf_kmeans
    certifies), then within-cluster cosine pruning keeping the lowest
    id per similar pair (threshold 0.45 — the embedding fixture's
    near-dup regime, shared with the dedup_embedding_lsh family, so
    the drop arm actually fires: 9 drops at sf0.01). The cluster fence collapses the O(n²)
    cosine work to Σ per-cluster size² and makes every cluster's pass
    an independent task — the published trade (boundary-straddling dups
    unexamined) is documented on the operator; the banded-LSH family is
    the exhaustive-recall alternative. The ORACLE restates the ENTIRE
    pipeline — Lloyd iterations, assignment, pair dominance, survivor
    anti-set — via the shared _kmeans_af_ctes chain, so the semantic
    dedup is value-certified end to end."""
    from tdei_extract_load_service_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _read(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        k_clusters=8, iters=2, threshold=0.45, dim=64,
    ).orderBy(F.col("id").asc())
