"""Grouped-map operators via ``applyInPandas`` (Arrow-batched grouped
transforms) — the engine's pattern for per-group logic that built-in
aggregates can't express (SURVEY.md §2.3 UDF/UDAF surface).

Scale notes: ``groupBy(...).applyInPandas`` shuffles once on the group key,
then each group materializes as one pandas DataFrame in a worker — groups
must fit in executor memory (fine for per-label/per-dataset groups; for
giant groups, pre-aggregate or salt first). Arrow moves columns, not rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def center_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    vec_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-group mean-centering of an embedding column, returning each
    vector's centered L2 norm — the feature-normalization step of an
    embedding pipeline as a grouped-map.

    Output: (id, group, centered_norm). Rounded to ``round_to`` so the
    result is summation-order robust (numpy pairwise summation vs an
    oracle's sequential fold differ at ~1e-15 relative).
    """
    out_schema = f"{id_col} long, {group_col} int, centered_norm double"

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.array(pdf[vec_col].tolist(), dtype="float64")
        centered = mat - mat.mean(axis=0)
        norms = np.sqrt((centered * centered).sum(axis=1))
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                group_col: pdf[group_col].values,
                "centered_norm": norms.round(round_to),
            }
        )

    return df.groupBy(group_col).applyInPandas(center, schema=out_schema)
