"""Programmatically BUILT DuckDB oracle twins (the catalog keeps literal
oracle SQL inline next to each entry; these three are generated from the
same seeded parameters as their Spark operators, so they live as code):

- embedding_lsh_oracle_sql: banded seeded-hyperplane LSH + exact-cosine
  verify, plane literals derived from similarity.make_planes;
- lsh_bucketed_oracle_sql: plane-literal sign buckets;
- ivf_kmeans_oracle_sql: DECIMAL-exact Lloyd iterations unrolled.

Each returns the SQL string the catalog registers as the entry's oracle.
"""

from __future__ import annotations

def embedding_lsh_oracle_sql(
    n_bands: int = 3, planes_per_band: int = 6, threshold: float = 0.9
) -> str:
    """DuckDB twin of embedding_lsh_pairs with the SAME plane literals
    (similarity.make_planes). The Spark side unions first-collision-band
    joins; the DISTINCT OR-join here defines the identical pair set, and
    the exact-cosine verify makes the values — not just the candidates —
    comparable."""
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    planes = make_planes(n_bands * planes_per_band, 64)
    band_exprs = []
    for band in range(n_bands):
        terms = []
        for p in range(planes_per_band):
            lit = "[" + ",".join(repr(v) for v in planes[band * planes_per_band + p]) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) >= 0"
                f" THEN {2 ** p} ELSE 0 END)"
            )
        band_exprs.append(" + ".join(terms) + f" AS b{band}")
    on = " OR ".join(f"a.b{j} = b.b{j}" for j in range(n_bands))
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec, {', '.join(band_exprs)}
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, b.vec)
                 / (sqrt(list_dot_product(a.vec, a.vec))
                    * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id AND ({on})
    WHERE ROUND(list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(b.vec, b.vec))), 6) >= {threshold}
    """


def lsh_bucketed_oracle_sql() -> str:
    """Build the DuckDB twin of lsh_bucket_topk with the SAME plane
    literals the Spark query uses (make_planes is a driver-side seeded
    PRNG): dot products over identical doubles fold left-to-right in both
    engines, so the sign tests — and hence the buckets — are bit-identical."""
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    terms = []
    for p, plane in enumerate(make_planes(4, 64)):
        lit = "[" + ",".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) >= 0"
            f" THEN {2 ** p} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
    SELECT b.vec_id AS id,
           ROUND(list_dot_product(b.v, q.qv)
                 / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
    FROM b, q WHERE b.bucket = q.qbucket
    ORDER BY cosine DESC, id ASC LIMIT 10
    """


def lsh_multiband_probe_oracle_sql(
    n_bands: int = 4, planes_per_band: int = 4, k: int = 10
) -> str:
    """DuckDB twin of embedding_lsh_probe_multiband: the query row's
    (vec_id = 0) candidates are every row colliding in ANY band —
    exactly the ``embedding_lsh_oracle_sql`` OR-join restricted to the
    query id (VERDICT r10 #5) — ranked by exact cosine. Same seeded
    plane literals, same left-to-right dot-product folds, so buckets
    and cosines are bit-identical across engines."""
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    planes = make_planes(n_bands * planes_per_band, 64)
    band_exprs = []
    for band in range(n_bands):
        terms = []
        for p in range(planes_per_band):
            lit = (
                "["
                + ",".join(repr(v) for v in planes[band * planes_per_band + p])
                + "]::DOUBLE[]"
            )
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) >= 0"
                f" THEN {2 ** p} ELSE 0 END)"
            )
        band_exprs.append(" + ".join(terms) + f" AS b{band}")
    on = " OR ".join(f"b.b{j} = q.b{j}" for j in range(n_bands))
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec, {', '.join(band_exprs)}
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id = 0)
    SELECT b.vec_id AS id,
           ROUND(list_dot_product(b.vec, q.vec)
                 / (sqrt(list_dot_product(b.vec, b.vec))
                    * sqrt(list_dot_product(q.vec, q.vec))), 6) AS cosine
    FROM v b, q WHERE {on}
    ORDER BY cosine DESC, id ASC LIMIT {k}
    """


def _cos_sql(a: str, b: str) -> str:
    return (
        f"ROUND(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


def _kmeans_af_ctes(k: int, dim: int, iters: int) -> tuple[list, str]:
    """The unrolled deterministic Lloyd chain (assign -> decimal-sum
    mean -> rebuilt centroids, per iteration) ending in the final
    assignment CTE ``af`` (id, vec, centroid_id) — shared by every
    oracle that consumes exact k-means clusters. Because the centroid
    update uses exact DECIMAL sums (order-independent) and both engines
    round the same double quotient to 9 places, the centroid vectors —
    and every downstream cosine — are bit-identical across engines
    (operators/similarity.py kmeans_centroids_exact)."""
    cos = _cos_sql
    ctes = [
        f"c0 AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv "
        f"FROM embeddings ORDER BY vec_id LIMIT {k})"
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
      SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS vec, c.centroid_id
      FROM embeddings e, {prev} c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {cos("e.embedding::DOUBLE[]", "c.cv")} DESC, c.centroid_id ASC) = 1)"""
        )
        ctes.append(
            f"""m{it} AS (
      SELECT a.centroid_id, t.i AS pos,
             ROUND(CAST(SUM(CAST(a.vec[t.i] AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 9) AS comp
      FROM a{it} a, range(1, {dim + 1}) t(i)
      GROUP BY a.centroid_id, t.i)"""
        )
        ctes.append(
            f"""c{it} AS (
      SELECT c.centroid_id, COALESCE(m.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN (
        SELECT centroid_id, list(comp ORDER BY pos) AS cv FROM m{it} GROUP BY centroid_id
      ) m USING (centroid_id))"""
        )
        prev = f"c{it}"
    ctes.append(
        f"""af AS (
      SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS vec, c.centroid_id
      FROM embeddings e, {prev} c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {cos("e.embedding::DOUBLE[]", "c.cv")} DESC, c.centroid_id ASC) = 1)"""
    )
    return ctes, prev


def ivf_kmeans_oracle_sql(k: int = 8, dim: int = 64, iters: int = 2, n_probe: int = 2, topk: int = 10) -> str:
    """DuckDB twin of the deterministic k-means IVF query (Lloyd chain
    from ``_kmeans_af_ctes``)."""
    cos = _cos_sql
    ctes, prev = _kmeans_af_ctes(k, dim, iters)
    ctes.append("q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)")
    ctes.append(
        f"""probe AS (
      SELECT c.centroid_id FROM {prev} c, q
      ORDER BY {cos("c.cv", "q.qv")} DESC, c.centroid_id ASC LIMIT {n_probe})"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT a.id, {cos("a.vec", "q.qv")} AS cosine
    FROM af a, q WHERE a.centroid_id IN (SELECT centroid_id FROM probe)
    ORDER BY cosine DESC, a.id ASC LIMIT {topk}"""
    )


def _pq_dist_sql(sub_expr: str, centroid: list[float]) -> str:
    """Norm-expansion squared-L2 between a DuckDB DOUBLE[] expression and
    a centroid literal — textually parallel to pq_encode's fold:
    (||sub||^2 - 2.0*dot) + ||c||^2 with list_dot_product's left fold."""
    from tdei_extract_load_service_spark.operators.similarity import _norm2_py

    lit = "[" + ",".join(repr(float(v)) for v in centroid) + "]::DOUBLE[]"
    return (
        f"((list_dot_product({sub_expr}, {sub_expr})"
        f" - 2.0 * list_dot_product({sub_expr}, {lit}))"
        f" + {_norm2_py(centroid)!r})"
    )


def pq_code_oracle_sql() -> str:
    """DuckDB twin of the embedding_pq_code entry: identical codebook
    literals, identical norm-expansion distances, identical
    first-index-of-min argmin (list_position finds the FIRST equal
    element, matching Spark's array_position)."""
    from tdei_extract_load_service_spark.operators.similarity import make_codebooks

    cbs = make_codebooks()
    sub_dim = len(cbs[0][0])
    sub_cols, code_cols = [], []
    for s, cb in enumerate(cbs):
        lo = s * sub_dim + 1
        sub_cols.append(
            f"(embedding::DOUBLE[])[{lo}:{lo + sub_dim - 1}] AS s{s}"
        )
        dists = ", ".join(_pq_dist_sql(f"s{s}", c) for c in cb)
        code_cols.append(
            f"(list_position([{dists}], list_aggregate([{dists}], 'min')) - 1) AS c{s}"
        )
    codes = ", ".join(f"c{s}" for s in range(len(cbs)))
    return f"""
    WITH subs AS (
      SELECT vec_id, {', '.join(sub_cols)} FROM embeddings
    ),
    coded AS (
      SELECT vec_id, {', '.join(code_cols)} FROM subs
    )
    SELECT vec_id,
           array_to_string(list_transform([{codes}], x -> x::VARCHAR), ',')
             AS codes
    FROM coded
    """


def pq_topk_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of similarity_pq — fully static: the query vector is
    vec_id=0 read INSIDE the SQL (the lsh_bucketed recipe), the ADC
    lookup lists are computed in-SQL with the same norm expansion and
    fold order as the Spark side's Python-computed LUT literals (float
    -> double widening is exact; dot products fold left in both), then
    each row's distance is the same left-associated sum of per-subspace
    lookups."""
    from tdei_extract_load_service_spark.operators.similarity import make_codebooks

    cbs = make_codebooks()
    sub_dim = len(cbs[0][0])
    sub_cols, code_cols, lut_cols = [], [], []
    for s_i, cb in enumerate(cbs):
        lo = s_i * sub_dim + 1
        sub_cols.append(f"(embedding::DOUBLE[])[{lo}:{lo + sub_dim - 1}] AS s{s_i}")
        dists = ", ".join(_pq_dist_sql(f"s{s_i}", c) for c in cb)
        code_cols.append(
            f"(list_position([{dists}], list_aggregate([{dists}], 'min')) - 1) AS c{s_i}"
        )
        qdists = ", ".join(_pq_dist_sql(f"qs{s_i}", c) for c in cb)
        lut_cols.append(f"[{qdists}] AS l{s_i}")
    qsub_cols = ", ".join(
        f"(embedding::DOUBLE[])[{s_i * sub_dim + 1}:{(s_i + 1) * sub_dim}] AS qs{s_i}"
        for s_i in range(len(cbs))
    )
    dist = " + ".join(f"l{s_i}[c{s_i} + 1]" for s_i in range(len(cbs)))
    return f"""
    WITH subs AS (
      SELECT vec_id, {', '.join(sub_cols)} FROM embeddings
    ),
    coded AS (
      SELECT vec_id, {', '.join(code_cols)} FROM subs
    ),
    q AS (SELECT {qsub_cols} FROM embeddings WHERE vec_id = 0),
    luts AS (SELECT {', '.join(lut_cols)} FROM q)
    SELECT vec_id AS id, ROUND({dist}, 6) AS approx_dist
    FROM coded, luts
    ORDER BY approx_dist ASC, id ASC
    LIMIT {k}
    """


def pq_recall_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of similarity_pq_recall: exact squared-L2 top-k (same
    norm expansion, q read in-SQL from vec_id=0) joined against the ADC
    top-k (pq_topk_oracle_sql's internals), one recall ratio."""
    from tdei_extract_load_service_spark.operators.similarity import make_codebooks

    cbs = make_codebooks()
    sub_dim = len(cbs[0][0])
    sub_cols, code_cols, lut_cols = [], [], []
    for s_i, cb in enumerate(cbs):
        lo = s_i * sub_dim + 1
        sub_cols.append(f"(embedding::DOUBLE[])[{lo}:{lo + sub_dim - 1}] AS s{s_i}")
        dists = ", ".join(_pq_dist_sql(f"s{s_i}", c) for c in cb)
        code_cols.append(
            f"(list_position([{dists}], list_aggregate([{dists}], 'min')) - 1) AS c{s_i}"
        )
        qdists = ", ".join(_pq_dist_sql(f"qs{s_i}", c) for c in cb)
        lut_cols.append(f"[{qdists}] AS l{s_i}")
    qsub_cols = ", ".join(
        f"(embedding::DOUBLE[])[{s_i * sub_dim + 1}:{(s_i + 1) * sub_dim}] AS qs{s_i}"
        for s_i in range(len(cbs))
    )
    adc = " + ".join(f"l{s_i}[c{s_i} + 1]" for s_i in range(len(cbs)))
    return f"""
    WITH qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    exact AS (
      SELECT vec_id AS id,
             ROUND((list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
                    - 2.0 * list_dot_product(embedding::DOUBLE[], q))
                   + list_dot_product(q, q), 6) AS dist
      FROM embeddings, qv
      ORDER BY dist ASC, id ASC LIMIT {k}
    ),
    subs AS (SELECT vec_id, {', '.join(sub_cols)} FROM embeddings),
    coded AS (SELECT vec_id, {', '.join(code_cols)} FROM subs),
    q AS (SELECT {qsub_cols} FROM embeddings WHERE vec_id = 0),
    luts AS (SELECT {', '.join(lut_cols)} FROM q),
    approx AS (
      SELECT vec_id AS id, ROUND({adc}, 6) AS approx_dist
      FROM coded, luts
      ORDER BY approx_dist ASC, id ASC LIMIT {k}
    )
    SELECT ROUND(COUNT(*) / {float(k)!r}, 6) AS recall_at_{k}
    FROM exact JOIN approx USING (id)
    """


def _ivf_pq_cte_sql(num_centroids: int, n_probe: int) -> tuple[str, str]:
    """Shared WITH-clause body of the IVFPQ oracles (assignment, probe,
    PQ code and LUT CTEs) and the ADC sum expression — the single
    construction ``ivf_pq_oracle_sql`` and ``ann_rerank_oracle_sql``
    both select from, so the retrieve stage of the rerank oracle is
    literally the certified IVFPQ oracle."""
    from tdei_extract_load_service_spark.operators.similarity import make_codebooks

    cbs = make_codebooks()
    sub_dim = len(cbs[0][0])
    sub_cols, code_cols, lut_cols = [], [], []
    for s_i, cb in enumerate(cbs):
        lo = s_i * sub_dim + 1
        sub_cols.append(f"(vec)[{lo}:{lo + sub_dim - 1}] AS s{s_i}")
        dists = ", ".join(_pq_dist_sql(f"s{s_i}", c) for c in cb)
        code_cols.append(
            f"(list_position([{dists}], list_aggregate([{dists}], 'min')) - 1) AS c{s_i}"
        )
        qdists = ", ".join(_pq_dist_sql(f"qs{s_i}", c) for c in cb)
        lut_cols.append(f"[{qdists}] AS l{s_i}")
    qsub_cols = ", ".join(
        f"(embedding::DOUBLE[])[{s_i * sub_dim + 1}:{(s_i + 1) * sub_dim}] AS qs{s_i}"
        for s_i in range(len(cbs))
    )
    adc = " + ".join(f"l{s_i}[c{s_i} + 1]" for s_i in range(len(cbs)))
    ctes = f"""c AS (
      SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id LIMIT {num_centroids}
    ),
    assigned AS (
      SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS vec, c.centroid_id
      FROM embeddings e, c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.centroid_id ASC) = 1
    ),
    qfull AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT c.centroid_id FROM c, qfull
      ORDER BY ROUND(list_dot_product(c.cv, qv)
               / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
               c.centroid_id ASC
      LIMIT {n_probe}
    ),
    cands AS (
      SELECT id, vec FROM assigned
      WHERE centroid_id IN (SELECT centroid_id FROM probe)
    ),
    subs AS (SELECT id, {', '.join(sub_cols)} FROM cands),
    coded AS (SELECT id, {', '.join(code_cols)} FROM subs),
    q AS (SELECT {qsub_cols} FROM embeddings WHERE vec_id = 0),
    luts AS (SELECT {', '.join(lut_cols)} FROM q)"""
    return ctes, adc


def ivf_pq_oracle_sql(
    num_centroids: int = 16, n_probe: int = 4, k: int = 10
) -> str:
    """DuckDB twin of similarity_ivf_pq: the IVF assignment/probe CTEs
    from the similarity_ivf oracle composed with the PQ code/LUT CTEs
    from pq_topk_oracle_sql, restricted to the probed cells."""
    ctes, adc = _ivf_pq_cte_sql(num_centroids, n_probe)
    return f"""
    WITH {ctes}
    SELECT id, ROUND({adc}, 6) AS approx_dist
    FROM coded, luts
    ORDER BY approx_dist ASC, id ASC
    LIMIT {k}
    """


def ann_rerank_oracle_sql(
    num_centroids: int = 16,
    n_probe: int = 4,
    n_candidates: int = 50,
    k: int = 10,
) -> str:
    """DuckDB twin of the two-stage retrieve+rerank
    (similarity.ann_rerank_topk): the certified IVFPQ oracle CTEs
    retrieve ``n_candidates`` ids by ADC distance, then ONLY those ids'
    full vectors are re-scored with exact cosine (the topk_cosine
    formula) and ranked — same rounding, same id tiebreaks."""
    ctes, adc = _ivf_pq_cte_sql(num_centroids, n_probe)
    return f"""
    WITH {ctes},
    retrieved AS (
      SELECT id, ROUND({adc}, 6) AS approx_dist
      FROM coded, luts
      ORDER BY approx_dist ASC, id ASC
      LIMIT {n_candidates}
    ),
    rescored AS (
      SELECT r.id, r.approx_dist,
             ROUND(list_dot_product(e.embedding::DOUBLE[], qv)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qv, qv))), 6) AS cosine
      FROM retrieved r JOIN embeddings e ON e.vec_id = r.id, qfull
    )
    SELECT id, approx_dist, cosine,
           CAST(row_number() OVER (ORDER BY cosine DESC, id ASC) AS INT) AS rnk
    FROM rescored
    QUALIFY rnk <= {k}
    ORDER BY rnk
    """


def embedding_drift_oracle_sql(num_centroids: int = 16, dim: int = 64) -> str:
    """DuckDB twin of similarity.embedding_drift_report over the
    even/odd snapshot split: snapshot-A-seeded cells (lowest even ids),
    the certified rounded-cosine argmax assignment, DECIMAL-exact
    per-cell means rounded to 9 (bit-identical to the Spark side), and
    the drift cosine between the two mean lists."""
    cos = _cos_sql

    def assign(side: str) -> str:
        return f"""a{side} AS (
      SELECT s.vec_id, s.vec, c.centroid_id
      FROM s{side} s, c
      QUALIFY row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {cos("s.vec", "c.cv")} DESC, c.centroid_id ASC) = 1
    )"""

    def means(side: str) -> str:
        return f"""m{side} AS (
      SELECT a.centroid_id, t.i AS pos,
             ROUND(CAST(SUM(CAST(a.vec[t.i] AS DECIMAL(25,12))) AS DOUBLE)
                   / COUNT(*), 9) AS comp
      FROM a{side} a, range(1, {dim + 1}) t(i)
      GROUP BY a.centroid_id, t.i
    ),
    ml{side} AS (
      SELECT centroid_id, list(comp ORDER BY pos) AS mean_{side}
      FROM m{side} GROUP BY centroid_id
    ),
    n{side} AS (
      SELECT centroid_id, COUNT(*) AS n_{side} FROM a{side}
      GROUP BY centroid_id
    )"""

    return f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT {num_centroids}
    ),
    sa AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 2 = 0),
    sb AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 2 = 1),
    {assign('a')},
    {assign('b')},
    {means('a')},
    {means('b')},
    j AS (
      SELECT COALESCE(na.centroid_id, nb.centroid_id) AS centroid_id,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      FROM na FULL OUTER JOIN nb USING (centroid_id)
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM j)
    SELECT j.centroid_id, j.n_a, j.n_b,
           ROUND(j.n_a / tot.ta, 6) AS share_a,
           ROUND(j.n_b / tot.tb, 6) AS share_b,
           CASE WHEN mla.mean_a IS NULL OR mlb.mean_b IS NULL THEN NULL
                ELSE {cos("mla.mean_a", "mlb.mean_b")} END AS mean_cosine
    FROM j
    LEFT JOIN mla ON mla.centroid_id = j.centroid_id
    LEFT JOIN mlb ON mlb.centroid_id = j.centroid_id
    CROSS JOIN tot
    ORDER BY j.centroid_id
    """


def minhash_md5_oracle_sql(
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 2024,
) -> str:
    """Exact restatement of ``dedup.minhash_md5_pairs`` — shingles, md5
    base hashes ('0x' hex cast), the seeded linear permutations (same
    driver-side PRNG literals), banded candidates AND the integer match
    count — so the approximate operator's whole construction is
    value-certified, not just a verify closure."""
    from tdei_extract_load_service_spark.operators.dedup import (
        _MINHASH_P,
        minhash_md5_coeffs,
    )

    coeffs = minhash_md5_coeffs(num_hashes, seed)
    rpb = num_hashes // bands
    sig_items = ",\n               ".join(
        f"list_aggregate(list_transform(hb, h -> ({a} * h + {b}) % {_MINHASH_P}), 'min')"
        for a, b in coeffs
    )
    band_items = ",\n               ".join(
        "concat_ws(','"
        + "".join(
            f", sig[{b * rpb + j + 1}]::VARCHAR" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    min_match = int(threshold * num_hashes)
    return f"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - {n - 1}, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS sh
      FROM documents
    ),
    hbase AS (
      SELECT doc_id,
             list_transform(sh,
               s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)) AS hb
      FROM d
    ),
    s AS (
      SELECT doc_id,
             [{sig_items}] AS sig
      FROM hbase
    ),
    bnd AS (
      SELECT doc_id, sig,
             [{band_items}] AS bd
      FROM s
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_filter(generate_series(1, {num_hashes}),
                  k -> a.sig[k] = b.sig[k])) AS INT) AS n_matching
      FROM bnd a, bnd b
      WHERE a.doc_id < b.doc_id
        AND len(list_filter(generate_series(1, {bands}),
                bb -> a.bd[bb] = b.bd[bb])) > 0
    )
    SELECT doc_a, doc_b, n_matching FROM p
    WHERE n_matching >= {min_match}
    ORDER BY doc_a ASC, doc_b ASC
    """


def lsh_batch_topk_oracle_sql(
    k: int = 5, stride: int = 100, n_planes: int = 4,
    exclude_self: bool = False,
) -> str:
    """DuckDB twin of ``lsh_bucket_topk_batch`` over the sampled query
    batch (``vec_id % stride = 0``): same seeded plane literals as the
    Spark side, so buckets are bit-identical; candidates are the
    bucket-equi join; per-query ranking is row_number over (cosine DESC,
    id ASC) — the identical total order. ``exclude_self`` mirrors the
    operator flag: the self-pair is dropped BEFORE ranking, keeping
    ranks dense (the hard-negative-mining contract)."""
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    terms = []
    for p, plane in enumerate(make_planes(n_planes, 64)):
        lit = "[" + ",".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lit}) >= 0"
            f" THEN {2 ** p} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bb AS (SELECT vec_id, v, {bucket} AS bucket FROM b),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bb WHERE vec_id % {stride} = 0),
    cand AS (
      SELECT q.query_id, bb.vec_id AS id,
             ROUND(list_dot_product(bb.v, q.qv)
                   / (sqrt(list_dot_product(bb.v, bb.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
      FROM bb JOIN q ON bb.bucket = q.bucket{" AND bb.vec_id <> q.query_id" if exclude_self else ""}
    ),
    r AS (
      SELECT query_id, id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id ASC) AS rnk
      FROM cand
    )
    SELECT query_id, id, cosine, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= {k}
    ORDER BY query_id ASC, rnk ASC
    """


def embedding_drift_alert_oracle_sql(
    num_centroids: int = 16,
    dim: int = 64,
    modulus: int = 4,
    share_swing_fp: int = 20_000,
    min_mean_cosine_fp: int = 950_000,
) -> str:
    """DuckDB twin of ``similarity.embedding_drift_alerts`` over the
    ``vec_id % modulus`` snapshot slicing: frozen whole-corpus lowest-id
    centroid model, certified rounded-cosine argmax assignment, ONE
    grouped pass per (snapshot, cell) with DECIMAL-exact means, a dense
    snapshot×cell skeleton, integer micro-unit shares, and the four
    consecutive-pair alert rules (share_swing / mean_rotation /
    cell_vanished / sustained_swing) — every metric integer-exact so the
    fired verdicts cannot split on a float boundary."""
    cos = _cos_sql
    return f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id LIMIT {num_centroids}
    ),
    s AS (
      SELECT vec_id, vec_id % {modulus} AS snap,
             embedding::DOUBLE[] AS vec
      FROM embeddings
    ),
    a AS (
      SELECT s.snap, s.vec_id, s.vec, c.centroid_id
      FROM s, c
      QUALIFY row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {cos("s.vec", "c.cv")} DESC, c.centroid_id ASC) = 1
    ),
    nn AS (
      SELECT snap, centroid_id, COUNT(*) AS n FROM a GROUP BY snap, centroid_id
    ),
    m AS (
      SELECT a.snap, a.centroid_id, t.i AS pos,
             ROUND(CAST(SUM(CAST(a.vec[t.i] AS DECIMAL(25,12))) AS DOUBLE)
                   / COUNT(*), 9) AS comp
      FROM a, range(1, {dim + 1}) t(i)
      GROUP BY a.snap, a.centroid_id, t.i
    ),
    ml AS (
      SELECT snap, centroid_id, list(comp ORDER BY pos) AS mean
      FROM m GROUP BY snap, centroid_id
    ),
    skel AS (
      SELECT sn.s AS snap, c.centroid_id FROM range(0, {modulus}) sn(s), c
    ),
    d AS (
      SELECT skel.snap, skel.centroid_id,
             COALESCE(nn.n, 0) AS n, ml.mean
      FROM skel
      LEFT JOIN nn ON nn.snap = skel.snap AND nn.centroid_id = skel.centroid_id
      LEFT JOIN ml ON ml.snap = skel.snap AND ml.centroid_id = skel.centroid_id
    ),
    sh AS (
      SELECT snap, centroid_id, n, mean,
             CASE WHEN SUM(n) OVER (PARTITION BY snap) = 0 THEN 0
                  ELSE (1000000 * n) // SUM(n) OVER (PARTITION BY snap)
             END AS share_fp
      FROM d
    ),
    lagged AS (
      SELECT snap, centroid_id, n, share_fp, mean,
             LAG(n) OVER w AS prev_n,
             LAG(share_fp) OVER w AS prev_share_fp,
             LAG(mean) OVER w AS prev_mean
      FROM sh
      WINDOW w AS (PARTITION BY centroid_id ORDER BY snap)
    ),
    paired AS (
      SELECT snap, centroid_id, n, prev_n,
             ABS(share_fp - prev_share_fp) AS swing_fp,
             CASE WHEN mean IS NOT NULL AND prev_mean IS NOT NULL THEN
               CAST(ROUND(1000000.0 * {cos("prev_mean", "mean")}, 0) AS BIGINT)
             END AS rot_fp
      FROM lagged WHERE prev_share_fp IS NOT NULL
    ),
    fired AS (
      SELECT *,
             swing_fp >= {share_swing_fp} AS swing_fired,
             LAG(swing_fp >= {share_swing_fp}) OVER (
               PARTITION BY centroid_id ORDER BY snap) AS prev_swing_fired
      FROM paired
    ),
    streaked AS (
      SELECT *,
             CASE WHEN NOT swing_fired THEN 0
                  ELSE 1 + (CASE WHEN COALESCE(prev_swing_fired, FALSE)
                                 THEN 1 ELSE 0 END)
             END AS streak
      FROM fired
    )
    SELECT snap AS snapshot_id, centroid_id, rule, metric_fp, threshold_fp, fired
    FROM (
      SELECT snap, centroid_id, 'cell_vanished' AS rule,
             CAST(n AS BIGINT) AS metric_fp, CAST(1 AS BIGINT) AS threshold_fp,
             (prev_n > 0 AND n = 0) AS fired
      FROM streaked
      UNION ALL
      SELECT snap, centroid_id, 'mean_rotation',
             rot_fp, CAST({min_mean_cosine_fp} AS BIGINT),
             COALESCE(rot_fp IS NOT NULL AND rot_fp < {min_mean_cosine_fp}, FALSE)
      FROM streaked
      UNION ALL
      SELECT snap, centroid_id, 'share_swing',
             CAST(swing_fp AS BIGINT), CAST({share_swing_fp} AS BIGINT),
             swing_fired
      FROM streaked
      UNION ALL
      SELECT snap, centroid_id, 'sustained_swing',
             CAST(streak AS BIGINT), CAST(2 AS BIGINT), streak >= 2
      FROM streaked
    )
    ORDER BY snapshot_id ASC, centroid_id ASC, rule ASC
    """


def lsh_batch_topk_corpus_aware_oracle_sql(
    k: int = 5, stride: int = 100, exclude_self: bool = False,
    target_bucket: int = 256, max_planes: int = 24,
) -> str:
    """Corpus-aware twin of ``lsh_batch_topk_oracle_sql`` (VERDICT r12
    #1 fix): instead of pinning ``n_planes``, the SQL derives it from
    ``COUNT(*)`` with the SAME integer-exact rule as
    ``dedup.planes_per_band_for`` — the smallest ``k`` in [4, 24] with
    ``target_bucket * 2^k >= count`` — so the oracle tracks the entry at
    EVERY scale factor without a restated literal. All ``max_planes``
    seeded plane literals are embedded (``make_planes`` is a single
    sequential PRNG, so the first-n planes of the 24-plane batch are
    bit-identical to ``make_planes(n)``); each bucket term is gated on
    ``p < n`` so terms beyond the derived count contribute 0, exactly
    like the Spark side building the bucket from only n terms."""
    from tdei_extract_load_service_spark.operators.similarity import make_planes

    terms = []
    for p, plane in enumerate(make_planes(max_planes, 64)):
        lit = "[" + ",".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN {p} < np.n AND list_dot_product(v, {lit}) >= 0"
            f" THEN {2 ** p} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH sz AS (SELECT COUNT(*) AS cnt FROM embeddings),
    np AS (
      SELECT COALESCE(
        (SELECT MIN(t.k) FROM range(4, {max_planes + 1}) t(k), sz
          WHERE {target_bucket} * (1::BIGINT << t.k) >= sz.cnt),
        {max_planes}) AS n
    ),
    b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bb AS (SELECT vec_id, v, {bucket} AS bucket FROM b CROSS JOIN np),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bb WHERE vec_id % {stride} = 0),
    cand AS (
      SELECT q.query_id, bb.vec_id AS id,
             ROUND(list_dot_product(bb.v, q.qv)
                   / (sqrt(list_dot_product(bb.v, bb.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
      FROM bb JOIN q ON bb.bucket = q.bucket{" AND bb.vec_id <> q.query_id" if exclude_self else ""}
    ),
    r AS (
      SELECT query_id, id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id ASC) AS rnk
      FROM cand
    )
    SELECT query_id, id, cosine, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= {k}
    ORDER BY query_id ASC, rnk ASC
    """


def semantic_dedup_oracle_sql(
    k: int = 8, dim: int = 64, iters: int = 2, threshold: float = 0.9
) -> str:
    """DuckDB twin of semantic_dedup (SemDeDup): the shared Lloyd chain
    assigns clusters bit-identically, then a within-cluster pair join
    derives the pairwise-dominance drops and the survivors are the
    anti-set — every stage of the published recipe restated in SQL."""
    cos = _cos_sql
    ctes, _ = _kmeans_af_ctes(k, dim, iters)
    ctes.append(
        f"""drops AS (
      SELECT DISTINCT b.id
      FROM af a JOIN af b
        ON a.centroid_id = b.centroid_id AND a.id < b.id
      WHERE {cos("a.vec", "b.vec")} >= {threshold})"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT a.id, a.centroid_id
    FROM af a WHERE a.id NOT IN (SELECT id FROM drops)
    ORDER BY a.id ASC"""
    )


def mmr_oracle_sql(n_candidates: int = 24, k: int = 8) -> str:
    """DuckDB twin of ``similarity.mmr_topk`` with lam = 1/2: the greedy
    selection is UNROLLED into k chained one-row CTEs (s1..sk, with
    running union u1..uk) — a recursive CTE cannot carry the argmax-
    with-LIMIT step portably, and k is a small query constant, so the
    unrolled form keeps the oracle pure ANSI-ish SQL that restates
    every pick: candidate set, every pairwise rounded cosine, every
    marginal score, every tiebreak. The marginal score
    ``0.5*rel - 0.5*ms`` is deliberately NOT re-rounded (half-point
    hazard on the 1e-6 grid); it is bit-identical to Spark's because
    both engines fold the same doubles in the same order."""
    cos = _cos_sql("a.v", "b.v")
    steps = []
    for t in range(2, k + 1):
        prev = f"u{t - 1}"
        steps.append(f"""
    s{t} AS MATERIALIZED (
      SELECT c.id, c.rel, 0.5 * c.rel - 0.5 * m.ms AS mmr_score,
             {t} AS mmr_rank
      FROM cand c JOIN (
        SELECT ia, MAX(sim) AS ms FROM sims
        WHERE ib IN (SELECT id FROM {prev})
          AND ia NOT IN (SELECT id FROM {prev})
        GROUP BY ia
      ) m ON m.ia = c.id
      ORDER BY mmr_score DESC, c.id ASC LIMIT 1
    ),
    u{t} AS MATERIALIZED (SELECT * FROM u{t - 1} UNION ALL SELECT * FROM s{t}),""")
    return f"""
    WITH base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id <> 0
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT id, v,
             ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS rel
      FROM base, q
      ORDER BY rel DESC, id ASC LIMIT {n_candidates}
    ),
    sims AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib, {cos} AS sim
      FROM cand a, cand b
    ),
    s1 AS MATERIALIZED (
      SELECT id, rel, 0.5 * rel - 0.5 * 0.0 AS mmr_score, 1 AS mmr_rank
      FROM cand ORDER BY rel DESC, id ASC LIMIT 1
    ),
    u1 AS MATERIALIZED (SELECT * FROM s1),{"".join(steps)}
    fin AS (SELECT * FROM u{k})
    SELECT id, rel, mmr_score, CAST(mmr_rank AS INT) AS mmr_rank
    FROM fin ORDER BY mmr_rank ASC
    """


def _bpe_rounds_with(k: int) -> str:
    """Shared WITH-body behind the BPE oracle family: the k greedy
    merge rounds UNROLLED into MATERIALIZED CTE triplets (pair counts
    -> one-row argmax -> replace projection), the mmr_oracle_sql
    discipline — default CTE inlining would re-expand each round's
    whole history. The sentinel-bounded symbol string and left-to-right
    replace are stated verbatim, so every round's pair table, argmax
    tiebreak and merge application are value-certified. A round whose
    pair table is EMPTY (vocabulary fully merged before round k) must
    not empty the chain: v{t} LEFT-JOINs its merge row and COALESCEs
    the replace back to the previous encoding, mirroring _bpe_learn's
    loop break (found by review — the cross-join form zeroed
    bpe_apply/bpe_fertility on fully-merged corpora while bpe_train,
    which only unions the m CTEs, hid it). Ends with a trailing comma:
    callers append their own final CTE / select."""
    steps = []
    for t in range(1, k + 1):
        steps.append(f"""
    p{t} AS MATERIALIZED (
      SELECT s[i] AS left_sym, s[i + 1] AS right_sym, SUM(cnt) AS pair_count
      FROM (
        SELECT cnt, s, unnest(generate_series(1, len(s) - 1)) AS i
        FROM (SELECT cnt, string_split(trim(b, chr(31)), chr(31) || chr(31)) AS s
              FROM v{t - 1})
      ) GROUP BY 1, 2
    ),
    m{t} AS MATERIALIZED (
      SELECT {t} AS step, left_sym, right_sym, pair_count FROM p{t}
      ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT 1
    ),
    v{t} AS MATERIALIZED (
      SELECT word, cnt, COALESCE(replace(b,
        chr(31) || left_sym || chr(31) || chr(31) || right_sym || chr(31),
        chr(31) || left_sym || right_sym || chr(31)), b) AS b
      FROM v{t - 1} LEFT JOIN m{t} ON TRUE
    ),""")
    return f"""
    WITH v0 AS MATERIALIZED (
      SELECT word, COUNT(*) AS cnt,
             chr(31) || array_to_string(
               list_transform(generate_series(1, len(word)),
                              i -> substr(word, i, 1)),
               chr(31) || chr(31)) || chr(31) AS b
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE len(word) > 0
      GROUP BY word
    ),{"".join(steps)}"""


def bpe_train_oracle_sql(k: int = 6) -> str:
    """DuckDB twin of ``text.bpe_train`` over the shared unrolled
    rounds (``_bpe_rounds_with``): the trained merge table is the union
    of the per-round argmax rows."""
    unions = " UNION ALL ".join(f"SELECT * FROM m{t}" for t in range(1, k + 1))
    return f"""{_bpe_rounds_with(k)}
    fin AS ({unions})
    SELECT CAST(step AS INT) AS step, left_sym, right_sym,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM fin ORDER BY step ASC
    """


def bpe_apply_oracle_sql(k: int = 6) -> str:
    """DuckDB twin of ``text.bpe_apply``: after the k unrolled rounds,
    v{k}'s encoding column IS the greedy BPE encoding of every word —
    the token-usage table is one unnest + aggregate over it."""
    return f"""{_bpe_rounds_with(k)}
    fin AS (
      SELECT cnt, unnest(string_split(trim(b, chr(31)), chr(31) || chr(31))) AS token
      FROM v{k}
    )
    SELECT token, CAST(len(token) AS INT) AS token_len,
           CAST(SUM(cnt) AS BIGINT) AS occurrences,
           CAST(COUNT(*) AS BIGINT) AS vocab_slots
    FROM fin GROUP BY token
    ORDER BY occurrences DESC, token ASC
    """


def bpe_fertility_oracle_sql(k: int = 6) -> str:
    """DuckDB twin of ``text.bpe_fertility``: one-row corpus summary
    over v{k} with the two ratios in integer micro-units (``//`` floor
    division == Spark ``DIV`` on the all-positive operands)."""
    return f"""{_bpe_rounds_with(k)}
    fin AS (
      SELECT cnt, len(word) AS nchar,
             len(string_split(trim(b, chr(31)), chr(31) || chr(31))) AS ntok
      FROM v{k}
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS total_words,
           CAST(COUNT(*) AS BIGINT) AS distinct_words,
           CAST(SUM(cnt * ntok) AS BIGINT) AS total_tokens,
           CAST(SUM(cnt * nchar) AS BIGINT) AS total_chars,
           CAST((SUM(cnt * ntok) * 1000) // SUM(cnt) AS BIGINT) AS tokens_per_kword,
           CAST((SUM(cnt * nchar) * 1000000) // SUM(cnt * ntok) AS BIGINT) AS chars_per_token_micro
    FROM fin
    """


def embedding_outliers_oracle_sql(
    dim: int = 64, k_semantic: int = 20, k_norm: int = 10
) -> str:
    """DuckDB twin of ``similarity.embedding_outliers``: per-dimension
    DECIMAL(25,12) sums give the exact centroid direction (cosine is
    scale-invariant, so the SUM vector stands in for the mean — no
    decimal division whose scale rules could diverge); per-row cosine /
    norm2 via list_dot_product over DOUBLE[] with the ROUND-6-then-rank
    pin; three LIMIT cuts with id tiebreaks, unioned."""
    sum_cols = ", ".join(
        f"CAST(SUM(CAST(CAST(embedding[{i + 1}] AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) AS s{i}"
        for i in range(dim)
    )
    arr = ", ".join(f"s{i}" for i in range(dim))
    return f"""
    WITH s AS MATERIALIZED (SELECT {sum_cols} FROM embeddings),
    c AS (SELECT [{arr}]::DOUBLE[] AS cv FROM s),
    scored AS MATERIALIZED (
      SELECT vec_id AS id,
             ROUND(list_dot_product(v, cv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS cos_centroid,
             ROUND(list_dot_product(v, v), 6) AS norm2
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), c
    ),
    sem AS (SELECT id, cos_centroid, norm2, 'low_centroid_cosine' AS reason
            FROM scored ORDER BY cos_centroid ASC, id ASC LIMIT {k_semantic}),
    hi AS (SELECT id, cos_centroid, norm2, 'extreme_high_norm' AS reason
           FROM scored ORDER BY norm2 DESC, id ASC LIMIT {k_norm}),
    lo AS (SELECT id, cos_centroid, norm2, 'extreme_low_norm' AS reason
           FROM scored ORDER BY norm2 ASC, id ASC LIMIT {k_norm})
    SELECT * FROM (SELECT * FROM sem UNION ALL SELECT * FROM hi
                   UNION ALL SELECT * FROM lo)
    ORDER BY reason, id
    """


def embedding_pca_power_oracle_sql(dim: int = 64, iters: int = 3) -> str:
    """DuckDB twin of ``similarity.embedding_pca_power``: the full
    64x64 second-moment matrix from DECIMAL(28,12)-cast double products
    (bit-equal to the Spark side's mirrored upper triangle — double
    multiply is commutative, decimal addition associative), then the
    power-iteration rounds UNROLLED into matvec / norm / renormalize
    CTE triplets, each renormalization ROUND(w / sqrt(ss), 9)."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(f"""
    w{t} AS MATERIALIZED (
      SELECT m0.i AS pos,
             CAST(SUM(CAST(m0.m * {prev}.comp AS DECIMAL(28,12))) AS DOUBLE) AS w
      FROM m0 JOIN {prev} ON m0.j = {prev}.pos
      GROUP BY 1
    ),
    s{t} AS MATERIALIZED (
      SELECT CAST(SUM(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE) AS ss FROM w{t}
    ),
    v{t} AS MATERIALIZED (
      SELECT pos, ROUND(w / sqrt(ss), 9) AS comp FROM w{t}, s{t}
    ),""")
        prev = f"v{t}"
    return f"""
    WITH m0 AS MATERIALIZED (
      SELECT t1.i - 1 AS i, t2.j - 1 AS j,
             CAST(SUM(CAST(v[t1.i] * v[t2.j] AS DECIMAL(18,12))) AS DOUBLE) AS m
      FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
           range(1, {dim + 1}) t1(i), range(1, {dim + 1}) t2(j)
      GROUP BY 1, 2
    ),
    v0 AS (SELECT i - 1 AS pos, 0.125 AS comp FROM range(1, {dim + 1}) t(i)),{"".join(steps)}
    fin AS (SELECT * FROM v{iters})
    SELECT CAST(pos AS INT) AS pos, comp AS pc1 FROM fin ORDER BY pos ASC
    """


def abtt_topk_oracle_sql(dim: int = 64, iters: int = 3, k: int = 10) -> str:
    """DuckDB twin of ``similarity.abtt_topk``: the unrolled power
    rounds (shared with the pca oracle), the direction assembled with
    an ordered list() aggregate, the correction as an indexed
    list_transform (identical IEEE tree to Spark's zip_with), cosine
    ROUND-6 + id tiebreak."""
    pca = embedding_pca_power_oracle_sql(dim=dim, iters=iters)
    # reuse the WITH body up to v{iters}; strip the pca oracle's final
    # select (everything from the 'fin AS' clause on)
    body = pca[: pca.index("fin AS")]
    return f"""{body}uv AS (SELECT list(comp ORDER BY pos) AS u FROM v{iters}),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    pj AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v, uv.u AS u, q.qv AS qv,
             list_dot_product(embedding::DOUBLE[], uv.u) AS pv,
             list_dot_product(q.qv, uv.u) AS pq
      FROM embeddings, uv, q
    ),
    corr AS (
      SELECT id, v, qv,
             list_transform(generate_series(1, {dim}), i -> v[i] - pv * u[i]) AS cv,
             list_transform(generate_series(1, {dim}), i -> qv[i] - pq * u[i]) AS cq
      FROM pj
    )
    SELECT id,
           ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_raw,
           ROUND(list_dot_product(cv, cq)
                 / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(cq, cq))), 6) AS cos_abtt
    FROM corr
    ORDER BY cos_abtt DESC, id ASC LIMIT {k}
    """


def bm25_topk_oracle_sql() -> str:
    """The canonical BM25 top-10 oracle (fixed 4-term query, folded
    k1/b literals, DECIMAL-summed term scores) — ONE definition shared
    by text_bm25_topk AND stream_bm25_index_shadow so the streamed
    cert can never drift from the inline cert (hoisted by review: the
    two registrations carried byte-identical 28-line copies)."""
    return r'''
    WITH dl AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\v]+')) END AS dl
      FROM documents),
    scal AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM documents, unnest(regexp_split_to_array(trim(text), '[ \t\n\r\f\v]+')) AS t(term)
      WHERE t.term IN ('spark', 'join', 'window', 'scan')
      GROUP BY doc_id, t.term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           ROUND(CAST(SUM(CAST(
              ln(1.0 + (scal.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / scal.avgdl))
           AS DECIMAL(28,12))) AS DOUBLE), 6) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN scal
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id ASC
    LIMIT 10
    '''
