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


def ivf_kmeans_oracle_sql(k: int = 8, dim: int = 64, iters: int = 2, n_probe: int = 2, topk: int = 10) -> str:
    """DuckDB twin of the deterministic k-means IVF query.

    The whole Lloyd loop is unrolled as a CTE chain (assign -> decimal-sum
    mean -> rebuilt centroids, per iteration). Because the centroid update
    uses exact DECIMAL sums (order-independent) and both engines round the
    same double quotient to 9 places, the centroid vectors — and therefore
    every downstream cosine — are bit-identical across engines (see
    operators/similarity.py kmeans_centroids_exact)."""

    def cos(a: str, b: str) -> str:
        return (
            f"ROUND(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
        )

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
