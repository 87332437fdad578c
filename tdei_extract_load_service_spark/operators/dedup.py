"""Deduplication operators (north-star extension, BASELINE.json): the
training-data-pipeline dedup family over the ``documents`` fixture.

All hot paths are JVM-side higher-order functions — shingling, MinHash
signatures and SimHash bit accumulation run inside whole-stage codegen with
NO shuffle until the candidate-pair join. The only shuffles are the
pair-generation joins, each keyed so that work is proportional to candidate
pairs, never to |docs|²:

- exact:          shuffle on content hash (one row per doc)
- ngram_jaccard:  shuffle on shared shingle (inverted-index join)
- minhash_lsh:    shuffle on (band, band-hash) buckets
- simhash:        shuffle on 16-bit simhash chunks (Hamming blocking)
- embedding:      all-pairs (SF-test oracle path) — the scale path is
                  ``operators.similarity`` LSH/IVF bucketing

Skew note: stop-phrase shingles create hot keys in the inverted-index
join; AQE skew-join splitting (on in session.py) absorbs moderate skew, and
``max_shingle_df`` provides explicit frequency-capping for pathological
corpora (drops shingles appearing in more than N docs from *candidate
generation only* — exactness is preserved for pairs below the cap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.session import spread


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Split on a single space to stay
    byte-compatible with the DuckDB oracle (``string_split(text, ' ')``)."""
    words = F.split(_col(text), " ")
    count = F.size(words) - (n - 1)
    shingles = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(words, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(shingles)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact_groups(
    df: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct content
    with the surviving id (min) and the duplicate count.

    ``md5(concat_ws(...))`` shuffles one short hash row per doc — at 100 TB
    the shuffle payload is the hash + id, not the documents.
    """
    key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    return (
        df.withColumn("content_hash", key)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def dedup_exact(df: DataFrame, content_cols: list[str]) -> DataFrame:
    """Keep one row per distinct content (``dropDuplicates`` form)."""
    return df.dropDuplicates(content_cols)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted-index blocking — no cross join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ALL pairs with shingle-Jaccard >= threshold, computed exactly.

    Inverted-index formulation: explode shingles, self-join on the shingle
    (only docs *sharing* a shingle ever meet — any pair with Jaccard > 0
    shares one, so no qualifying pair is missed), count shared shingles per
    pair, then ``|A∩B| / (|A|+|B|-|A∩B|)``. Work is Σ per-shingle df², not
    |docs|².
    """
    sh = spread(df).select(
        _col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))
    # both sides of the self-join reference this subtree; persist so the
    # shingling runs once, not twice (MEMORY_AND_DISK — spills, never OOMs).
    # Join key = xxhash64(shingle): an 8-byte shuffle key instead of the
    # shingle text; collision odds at ~2^-64 per pair are far below any
    # float-rounding tolerance already accepted elsewhere.
    ex = (
        sh.select("id", "n_shingles", F.explode("shingles").alias("shingle_text"))
        .select("id", "n_shingles", F.xxhash64("shingle_text").alias("shingle"))
        .persist()
    )
    if max_shingle_df is not None:
        ex = (
            ex.withColumn("_df", F.count("*").over(Window.partitionBy("shingle")))
            .where(F.col("_df") <= max_shingle_df)
            .drop("_df")
        )
    # shuffle-hash beats sort-merge here: the probe rows are tiny and the
    # per-key groups are bounded (capped df), so skipping both sorts wins
    # ~25% measured at sf0.1; under pathological skew switch back to SMJ
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    jaccard = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.withColumn("jaccard", F.round(jaccard, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as array<bigint>: position i is
    ``min over shingles of g_i(shingle)`` where
    ``g_i(s) = h1(s) XOR rotl(h2(s), i)`` — the two-base-hash derivation
    (Kirsch-Mitzenmacher-style): each shingle's STRING is hashed exactly
    twice, and the other ``num_hashes - 2`` functions cost three bitwise
    ops each, vs re-hashing the full string per seed (``num_hashes``x the
    string work). Rotate-XOR instead of the classic ``h1 + i*h2`` keeps
    the family overflow-free, so it runs identically under ANSI mode.

    Single fold over the pre-hashed shingles with a ``num_hashes``-wide
    accumulator — one pass, no explode, no shuffle, and a compact
    expression tree (the naive ``num_hashes x array_min(transform(...))``
    formulation generates an expression per seed and overwhelms codegen:
    measured 212s vs ~3s at sf0.1)."""
    max_long = (1 << 63) - 1

    if num_hashes > 64:
        raise ValueError("rotate-XOR family supports at most 64 derived hashes")

    # h1/h2 materialize ONCE per shingle (an array<struct> intermediate);
    # referencing a materialized struct field doesn't re-evaluate the hash,
    # whereas inlining xxhash64(s) into all 64 slots would re-hash the
    # string per slot.
    hashed = F.transform(
        shingles,
        lambda s: F.struct(F.xxhash64(s).alias("h1"), F.xxhash64(s, F.lit(1)).alias("h2")),
    )

    # rotl(h2, i) for a 64-bit long: (h2 << i) | (h2 >>> (64 - i)); shift
    # amounts are Python constants (the function API requires literal
    # shifts), so the whole g-array is one expression evaluated once per
    # shingle.
    def g_array(h: Column) -> Column:
        h1, h2 = h["h1"], h["h2"]
        return F.array(
            *[
                h1.bitwiseXOR(
                    F.shiftleft(h2, i).bitwiseOR(F.shiftrightunsigned(h2, 64 - i))
                    if i
                    else h2
                )
                for i in range(num_hashes)
            ]
        )

    return F.aggregate(
        F.transform(hashed, g_array),
        F.array_repeat(F.lit(max_long), num_hashes),
        lambda acc, g: F.zip_with(acc, g, lambda m, v: F.least(m, v)),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, scored by estimated
    Jaccard (fraction of agreeing signature positions).

    bands=16 × rows=4 over 64 hashes → collision probability
    ``1-(1-j^4)^16`` (≈0.97 at j=0.8, ≈0.04 at j=0.2). Only docs colliding
    in ≥1 band meet in the join — the classic MinHash/LSH scheme
    (Broder '97; Leskovec-Rajaraman-Ullman ch.3), here as pure DataFrame
    ops so the bucket join shuffles hashes, not documents.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    sig = spread(df).select(
        _col(id_col).alias("id"),
        minhash_signature(word_shingles(text_col, n), num_hashes).alias("sig"),
    ).persist()
    candidates = lsh_band_candidates(sig, num_hashes, bands)
    # join the signatures back onto the deduplicated candidate set instead
    # of carrying the 64-long sig through the band self-join. The sig side
    # is corpus-sized — shuffle_hash pins a key-partitioned join so the
    # optimizer can never try to broadcast it (measured: a 10x corpus blew
    # the broadcast build memory)
    scored = (
        candidates.join(
            sig.select(F.col("id").alias("doc_a"), F.col("sig").alias("sig_a")).hint("shuffle_hash"),
            "doc_a",
        ).join(
            sig.select(F.col("id").alias("doc_b"), F.col("sig").alias("sig_b")).hint("shuffle_hash"),
            "doc_b",
        )
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(num_hashes)
    return (
        scored.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def lsh_band_candidates(sig_df: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >= 1 LSH band
    bucket, from a persisted (id, sig) frame.

    The band self-join shuffles ONLY (id, band, bucket) — 24 bytes a row,
    16 rows a doc — never the signatures (they re-join after the pair
    dedup) and never the documents. At 100 TB this is the difference
    between a metadata-sized shuffle and replicating every signature x
    bands across the wire."""
    rows_per_band = num_hashes // bands
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.concat_ws(",", *[
                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ]),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sig_df.select("id", F.posexplode(band_hashes).alias("band", "bucket"))
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bits(text: str | Column, bits: int = 64) -> Column:
    """SimHash bit vector (array<int> of 0/1, length ``bits``).

    Per word: xxhash64 → two's-complement bit string (``bin`` + ``lpad``);
    accumulate +1/-1 per position over all words (Charikar '02), then
    threshold at 0. Entirely fold/zip_with — no shuffle, no UDF.
    """
    word_hashes = F.transform(F.split(_col(text), " "), lambda w: F.xxhash64(w))
    def bit_contrib(h: Column) -> Column:
        bstr = F.lpad(F.bin(h), 64, "0")
        return F.transform(
            F.sequence(F.lit(64 - bits + 1), F.lit(64)),
            lambda i: F.when(F.substring(bstr, i, 1) == "1", 1).otherwise(-1),
        )
    acc = F.aggregate(
        word_hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, bit_contrib(h), lambda a, c: a + c),
    )
    return F.transform(acc, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bits: int = 64,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Blocking: split the fingerprint into ``chunks`` equal slices; by
    pigeonhole any pair within Hamming distance < chunks*(…) shares at
    least one identical chunk when max_hamming < chunks × 1 … more
    precisely pairs with Hamming ≤ chunks-1 always collide; for larger
    budgets this is the standard probabilistic block (Manku et al. '07).
    The join key is a 16-bit chunk string — tiny shuffle payload.
    """
    chunk_len = bits // chunks
    sh = spread(df).select(_col(id_col).alias("id"), simhash_bits(text_col, bits).alias("bits"))
    chunk_arr = F.array(
        *[
            F.concat_ws("", F.transform(F.slice("bits", c * chunk_len + 1, chunk_len), lambda b: b.cast("string")))
            for c in range(chunks)
        ]
    )
    chunked = sh.select("id", "bits", F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
    a, b = chunked.alias("a"), chunked.hint("shuffle_hash").alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.bits").alias("bits_a"), F.col("b.bits").alias("bits_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.size(F.filter(F.zip_with("bits_a", "bits_b", lambda x, y: x != y), lambda m: m))
    return (
        candidates.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def dedup_clusters(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 25
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: every doc gets a
    ``cluster_id`` = the smallest doc id in its connected component (the
    canonical survivor); singletons map to themselves.

    Iterative min-label propagation (the standard large-graph
    connected-components shape, cf. Hash-to-Min, Vassilvitskii et al.):
    each round every node takes the min label over itself and its
    neighbors; converges in O(component diameter) rounds — near-dup
    components are shallow (stars/cliques around a template), so a handful
    of rounds suffice; ``max_iter`` bounds adversarial chains.

    Scale shape: per round one join keyed on the pair graph + one min-agg
    — both shuffle only (id, label) longs. The driver sees a single
    convergence COUNT per round, never the labels. Giant components make
    hot join keys — AQE skew-split absorbs them.
    """
    # the union references the pair frame twice — persist it so expensive
    # pair generation (an inverted-index or LSH join upstream) runs once
    pairs_p = pairs.select("doc_a", "doc_b").persist()
    # no distinct(): duplicate edges cannot change a MIN aggregate, and the
    # dedup would cost an extra corpus-wide shuffle per materialization
    edges = (
        pairs_p.selectExpr("doc_a as src", "doc_b as dst")
        .union(pairs_p.selectExpr("doc_b as src", "doc_a as dst"))
        .persist()
    )
    # localCheckpoint (not persist): each round's plan references the
    # previous labels TWICE (probe + update join), so lineage doubles per
    # round — a 12-round chain OOMs the driver on plan bloat alone.
    # Checkpointing truncates the logical plan to the materialized result;
    # on a cluster with executor loss concerns use reliable checkpoint().
    labels = ids.select(
        _col(id_col).alias("node"), _col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    # labels only ever DECREASE (least of own + neighborhood), so the label
    # sum is a convergence witness: unchanged sum <=> no label moved. One
    # cheap agg per round instead of an old-vs-new join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min.hint("shuffle_hash"), labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    pairs_p.unpersist()
    return labels.select(_col("node").alias(id_col), F.col("label").alias("cluster_id"))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two array<float|double> columns: elementwise cast to
    double *before* multiply, left-to-right fold — bit-compatible with the
    DuckDB oracle's ``list_dot_product(a::DOUBLE[], b::DOUBLE[])``."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """Exact near-dup pairs by cosine similarity — the all-pairs oracle
    path (O(n²): right at SF-test scale and as the verifier for the
    approximate paths; at 100 TB use ``operators.similarity``
    LSH/IVF bucketing for candidate generation instead)."""
    vecs = spread(df).select(_col(id_col).alias("id"), _col(vec_col).alias("vec"))
    a, b = vecs.alias("a"), vecs.alias("b")
    sim = cosine_similarity(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidate generation + EXACT Jaccard verification — the
    production near-dup shape at 100 TB: the quadratic-ish inverted-index
    join is replaced by LSH bucketing (misses a θ-pair with probability
    ``(1-θ^r)^b`` ≈ 2e-4 at θ=0.8 with 16×4 bands), and every surviving
    candidate is then scored exactly on its true shingle sets, so emitted
    pairs carry no estimation error."""
    # shingle ONCE: the same persisted (id, shingles) frame feeds both the
    # signature fold and the exact-verify joins (one pass over the corpus,
    # not three). Candidates skip estimate scoring entirely — the exact
    # verify supersedes it.
    sh = spread(df).select(
        _col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).persist()
    # sig persists too: the band self-join references it on both sides and
    # the signature fold must run once per doc, not twice
    sig = sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig")).persist()
    candidates = lsh_band_candidates(sig, num_hashes, bands)
    # shuffle_hash: the shingle-set side is corpus-sized (every doc's full
    # shingle array) — it must never be broadcast-built (measured OOM at a
    # 10x corpus when the optimizer under-estimated it)
    joined = (
        candidates.join(
            sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")).hint("shuffle_hash"),
            "doc_a",
        ).join(
            sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")).hint("shuffle_hash"),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jaccard = F.round(inter / union, 6)
    return (
        joined.withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
