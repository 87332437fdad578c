"""Salted two-phase aggregation: identical results to direct groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    # one hot key (90% of rows) + a long tail
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    direct = {
        r.key: (r.n, r.total, r.vmin, r.vmax)
        for r in df.groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    salted = {
        r.key: (r.n, r.total, r.vmin, r.vmax)
        for r in salted_agg(
            df,
            ["key"],
            {
                "n": ("count", F.lit(1)),
                "total": ("sum", F.col("v")),
                "vmin": ("min", F.col("v")),
                "vmax": ("max", F.col("v")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"bad": ("avg", F.col("v"))})
