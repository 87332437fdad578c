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
