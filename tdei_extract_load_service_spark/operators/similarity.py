"""Similarity search over embedding columns (north-star extension).

Three tiers, same cosine formula (shared with ``operators.dedup``):

- ``topk_cosine``       exact brute force — one narrow pass + per-partition
                        top-k heaps (TakeOrderedAndProject); the baseline
                        every approximate variant is measured against.
- ``ivf_topk``          IVF: assign vectors to nearest of C centroids once
                        (broadcast join — centroids are tiny), probe the
                        query's P nearest lists; scans ~P/C of the data.
- ``lsh_bucket_topk``   random-hyperplane LSH: 2^n_planes sign buckets;
                        candidates share the query's bucket. Hash-derived
                        deterministic planes — reproducible across runs
                        with no stored model.

Scale notes: brute force reads every vector but shuffles only k rows per
partition. IVF's assignment is a broadcast nested loop over C centroids —
no shuffle of the big side; the probe is a partition-pruned scan when the
assignment is written ``partitionBy(centroid_id)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators.dedup import cosine_similarity
from tdei_extract_load_service_spark.session import spread


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Deterministic: similarity rounded to 6 before ranking, id tiebreak —
    so rank order is stable across engines and partitionings.
    """
    sim = F.round(cosine_similarity(_col(vec_col), _vec_lit(query_vec)), 6)
    return (
        spread(df).select(_col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_centroids(df: DataFrame, id_col: str, vec_col: str, num_centroids: int) -> DataFrame:
    """Deterministic centroid pick: the ``num_centroids`` lowest ids.

    A k-means fit is the production upgrade; a fixed subset keeps the
    operator model-free and oracle-reproducible, and is the standard
    "random seed centroids" IVF bootstrap.
    """
    return (
        df.orderBy(_col(id_col).asc())
        .limit(num_centroids)
        .select(_col(id_col).alias("centroid_id"), _col(vec_col).alias("centroid_vec"))
    )


def ivf_assign(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; centroid_id
    tiebreak) via a broadcast nested-loop + max_by — the big side never
    shuffles."""
    joined = spread(df).select(_col(id_col).alias("id"), _col(vec_col).alias("vec")).crossJoin(
        F.broadcast(centroids)
    )
    sim = F.round(cosine_similarity(F.col("vec"), F.col("centroid_vec")), 6)
    return (
        joined.withColumn("sim", sim)
        .groupBy("id")
        .agg(
            F.expr("max_by(centroid_id, struct(sim, -centroid_id))").alias("centroid_id"),
            F.first("vec").alias("vec"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: probe the query's ``n_probe`` nearest
    centroid lists, exact top-k among their members."""
    centroids = ivf_centroids(df, id_col, vec_col, num_centroids)
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    probe = (
        centroids.select(
            "centroid_id",
            F.round(cosine_similarity(F.col("centroid_vec"), _vec_lit(query_vec)), 6).alias("qsim"),
        )
        .orderBy(F.col("qsim").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .select("centroid_id")
    )
    candidates = assigned.join(F.broadcast(probe), "centroid_id", "left_semi")
    sim = F.round(cosine_similarity(F.col("vec"), _vec_lit(query_vec)), 6)
    return (
        candidates.select(F.col("id"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def lsh_plane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d is
    ``xxhash64(plane_idx, d) / 2^63`` ∈ (-1, 1) — reproducible anywhere
    Spark runs, no stored model."""
    return F.array(
        *[
            (F.xxhash64(F.lit(plane_idx), F.lit(d)) / F.lit(float(2**63)))
            for d in range(dim)
        ]
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Sign-pattern bucket id (0..2^n_planes-1) from random hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(vec, lsh_plane(dim, p), lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
) -> DataFrame:
    """Bucketed approximate top-k: exact search restricted to the query's
    hyperplane-sign bucket (~|data|/2^n_planes candidates). Write the
    bucketed frame ``partitionBy('bucket')`` and the probe becomes a
    partition-pruned scan."""
    dim = dim or len(query_vec)
    bucketed = df.select(
        _col(id_col).alias("id"),
        _col(vec_col).alias("vec"),
        lsh_bucket(_col(vec_col), dim, n_planes).alias("bucket"),
    )
    qbucket = (
        bucketed.sparkSession.range(1)
        .select(lsh_bucket(_vec_lit(query_vec), dim, n_planes).alias("bucket"))
    )
    candidates = bucketed.join(F.broadcast(qbucket), "bucket", "left_semi")
    sim = F.round(cosine_similarity(F.col("vec"), _vec_lit(query_vec)), 6)
    return (
        candidates.select("id", sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )
