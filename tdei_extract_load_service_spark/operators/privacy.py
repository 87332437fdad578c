"""Privacy-preserving release primitives (k-anonymity / l-diversity).

The reference carries identity only as lineage (``requested_by``,
SURVEY.md O25); a training-data pipeline that RELEASES derived tables
needs the complementary guarantee — that quasi-identifier combinations
cannot single out an individual (Sweeney's k-anonymity; Machanavajjhala
et al.'s l-diversity for the sensitive-attribute refinement).
``text.pii_scrub`` removes direct identifiers from free text; this
module handles the STRUCTURED side: generalize quasi-identifiers, then
suppress rows whose equivalence class is still too small.

Everything here is exact, deterministic relational algebra — no noise
(differential privacy's calibrated randomness is deliberately out of
scope: it cannot be value-oracle-checked and its epsilon accounting is
a policy, not an operator).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    generalize: dict[str, Column] | None = None,
) -> DataFrame:
    """Generalize-then-suppress k-anonymity: apply the ``generalize``
    expressions (e.g. exact balance -> 1000-unit band, birth date ->
    year), then SUPPRESS every row whose quasi-identifier combination
    occurs fewer than ``k`` times — the released table's every row is
    indistinguishable from at least k-1 others on the quasi columns.

    Returns the surviving rows with generalized quasi columns and an
    ``eq_class_n`` column (the equivalence-class size — callers audit
    the anonymity level directly from the release).

    Scale shape: generalization is a projection; class sizes come from
    ONE window count over the quasi key (a single shuffle — no
    groupBy + join back, which would shuffle twice). At 100 TB the
    release is one exchange of the quasi key regardless of class count.
    NULL quasi values form their own equivalence class (SQL grouping
    semantics — a null band is as identifying as any other value and
    must clear the same bar).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    quasi = list(quasi_cols)
    out = df
    if generalize:
        missing = [c for c in generalize if c not in df.columns]
        if missing:
            raise ValueError(f"generalize keys absent from frame: {missing}")
        out = out.select(
            *[
                generalize[c].alias(c) if c in generalize else F.col(c)
                for c in df.columns
            ]
        )
    w = Window.partitionBy(*[F.col(c) for c in quasi])
    return (
        out.withColumn("eq_class_n", F.count(F.lit(1)).over(w))
        .where(F.col("eq_class_n") >= k)
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Per-equivalence-class l-diversity audit: for each quasi-identifier
    combination, the class size and the number of DISTINCT sensitive
    values; ``diverse`` is true iff the class carries at least ``l``
    distinct sensitive values (a k-anonymous class where everyone shares
    one diagnosis still leaks it — the homogeneity attack l-diversity
    exists to catch).

    One aggregation over the quasi key: ``(quasi..., n_records,
    n_sensitive, diverse)``. Run it on the OUTPUT of ``k_anonymize``
    before release.
    """
    quasi = list(quasi_cols)
    return (
        df.groupBy(*[F.col(c) for c in quasi])
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .withColumn("diverse", F.col("n_sensitive") >= F.lit(int(l)))
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """Per-equivalence-class t-closeness audit for an ORDERED sensitive
    attribute (Li, Li & Venkatasubramanian 2007): the Earth Mover's
    Distance between the class's sensitive-value distribution and the
    released table's global distribution, flagged when it exceeds
    ``t = t_num / t_den``. Completes the release-audit trio — k bounds
    re-identification, l bounds homogeneity, t bounds ATTRIBUTE
    disclosure by distribution skew (a class can hold l distinct
    diagnoses and still be 90% one of them: l-diverse, not t-close).

    For the ordered-attribute metric, EMD reduces to the mean absolute
    cumulative gap: ``t(c) = sum_j |cum_p(j) - cum_q(j)| / (m - 1)``
    over the m global sensitive values. Everything stays INTEGER —
    with class size ``n_c``, release size ``N``, class cumulative
    counts ``cum_c`` and global cumulative counts ``cum_g``, the
    numerator is ``S_c = sum_j |N*cum_c - n_c*cum_g|`` and
    ``t(c) = S_c / ((m-1) * n_c * N)``; the verdict compares
    ``t_den * S_c <= t_num * (m-1) * n_c * N`` so no float ever forms
    (the l_diversity / quality_classifier exactness discipline).
    Returns ``(quasi..., n_records, emd_num, emd_den, t_close)``.

    Scale shape: ONE corpus-keyed aggregation — the (quasi, sensitive)
    cell counts; classes, the m-row global distribution and the one-row
    scalars all derive from the cell frame. The dense class x m grid is
    the cell frame crossed with the BROADCAST m-row distribution; both
    cumulative sums ride ONE window partitioned by the quasi key, and
    the final per-class fold groups by the window's own partition
    attributes (no second exchange — the r6 window/groupBy lesson).
    Overflow: ``n_c * N`` caps BIGINT around N ~ 3e9 for the largest
    classes; beyond that, switch the numerator to the drift-report
    micro-share recipe (integer shares of 1e6 per class and globally)
    before comparing — documented, not silent.
    """
    if t_den < 1 or t_num < 0:
        raise ValueError("threshold must be a non-negative rational")
    quasi = list(quasi_cols)
    cell = (
        df.select(*quasi, F.col(sensitive_col).alias("_s"))
        .groupBy(*quasi, "_s")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    from tdei_extract_load_service_spark.session import persist_scoped

    cell = persist_scoped(cell, "privacy.t_closeness.cell")
    g = cell.groupBy("_s").agg(F.sum("_c").alias("_g"))
    scal = g.agg(
        F.sum("_g").alias("_N"), F.count(F.lit(1)).alias("_m")
    )
    cls = cell.groupBy(*quasi).agg(F.sum("_c").alias("n_records"))
    grid = (
        cls.crossJoin(F.broadcast(g))
        .join(cell, [*quasi, "_s"], "left")
        .select(
            *quasi,
            "n_records",
            "_s",
            "_g",
            F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in quasi])
        .orderBy(F.col("_s").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        *quasi,
        "n_records",
        F.sum("_c").over(w).alias("_cum_c"),
        F.sum("_g").over(w).alias("_cum_g"),
    )
    out = (
        cum.crossJoin(F.broadcast(scal))
        .groupBy(*quasi)
        .agg(
            F.first("n_records").alias("n_records"),
            F.sum(
                F.abs(
                    F.col("_N") * F.col("_cum_c")
                    - F.col("n_records") * F.col("_cum_g")
                )
            ).alias("emd_num"),
            F.first(
                (F.col("_m") - 1) * F.col("n_records") * F.col("_N")
            ).alias("emd_den"),
        )
    )
    return out.withColumn(
        "t_close",
        F.lit(int(t_den)) * F.col("emd_num")
        <= F.lit(int(t_num)) * F.col("emd_den"),
    )
