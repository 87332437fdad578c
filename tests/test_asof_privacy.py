"""Round-11 wave-6: join_asof direction/tolerance surface (pinned
against pandas merge_asof — the public reference implementation) and
the k-anonymity / l-diversity privacy operators."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _asof_fixture():
    """Seeded random left/right frames with globally unique integer
    timestamps (pandas breaks simultaneous-right ties by input position,
    this engine by payload tuple — unique ts sidesteps the one
    deliberately different rule)."""
    rng = random.Random(20260817)
    ts_pool = rng.sample(range(0, 100_000), 600)
    left_rows, right_rows = [], []
    i = 0
    for key in range(8):
        for _ in range(rng.randint(5, 40)):
            left_rows.append((key, ts_pool[i], i))
            i += 1
        for _ in range(rng.randint(0, 30)):
            right_rows.append((key, ts_pool[i], i, rng.uniform(0, 100)))
            i += 1
    left = pd.DataFrame(left_rows, columns=["k", "ts", "lid"])
    right = pd.DataFrame(right_rows, columns=["k", "ts", "rid", "val"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 500, 5000])
def test_join_asof_matches_pandas(spark, direction, tol):
    from tdei_extract_load_service_spark.operators.asof import join_asof

    left, right = _asof_fixture()
    got = (
        join_asof(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "k",
            "ts",
            "ts",
            ["rid", "val"],
            direction=direction,
            tolerance=None if tol is None else F.lit(tol),
        )
        .orderBy("lid")
        .collect()
    )
    ref = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tol,
    ).sort_values("lid")
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in ref.itertuples()
    }
    assert {r["lid"]: r["asof_rid"] for r in got} == want
    assert len(got) == len(left)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_join_asof_null_payload_comes_from_matched_row(spark, direction):
    """ADVICE r11 regression: a NULL payload value in the matched right
    row must surface as NULL (pandas returns the matched row's NaN),
    never as a non-null value carried from an OLDER right row — the
    per-column-carry defect mixed columns across right rows."""
    from tdei_extract_load_service_spark.operators.asof import join_asof

    left, right = _asof_fixture()
    rng = random.Random(7)
    right["val"] = [
        None if rng.random() < 0.4 else v for v in right["val"]
    ]
    got = (
        join_asof(
            spark.createDataFrame(left),
            spark.createDataFrame(
                right, schema="k long, ts long, rid long, val double"
            ),
            "k",
            "ts",
            "ts",
            ["rid", "val"],
            direction=direction,
        )
        .orderBy("lid")
        .collect()
    )
    ref = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
    )
    want = {
        int(r.lid): (
            None if pd.isna(r.rid) else int(r.rid),
            None if pd.isna(r.val) else round(float(r.val), 9),
        )
        for r in ref.itertuples()
    }
    assert {
        r["lid"]: (
            r["asof_rid"],
            None if r["asof_val"] is None else round(r["asof_val"], 9),
        )
        for r in got
    } == want


def test_join_asof_bad_direction_raises(spark):
    from tdei_extract_load_service_spark.operators.asof import join_asof

    df = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("ts"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="direction"):
        join_asof(df, df, "k", "ts", "ts", ["v"], direction="sideways")


def test_k_anonymize_suppression_and_generalization(spark):
    from tdei_extract_load_service_spark.operators.privacy import k_anonymize

    rows = [
        # class (US, A): 3 members -> survives k=3
        (1, "US", "A", 100.0),
        (2, "US", "A", 150.0),
        (3, "US", "A", 820.0),
        # class (US, B): 1 member -> suppressed
        (4, "US", "B", 100.0),
        # class (DE, A): 2 members -> suppressed at k=3
        (5, "DE", "A", 300.0),
        (6, "DE", "A", 310.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "country", "seg", "bal"])
    )
    # generalization folds bal into one band wide enough that (US, A)
    # stays a 3-class despite the 820.0 outlier
    got = k_anonymize(
        df.withColumn("band", F.floor(F.col("bal") / 1000)).drop("bal"),
        ["country", "seg", "band"],
        k=3,
    ).collect()
    assert sorted(r["id"] for r in got) == [1, 2, 3]
    assert all(r["eq_class_n"] == 3 for r in got)


def test_k_anonymize_generalize_mapping_and_null_class(spark):
    from tdei_extract_load_service_spark.operators.privacy import k_anonymize

    rows = [(1, 12.0), (2, 17.0), (3, None), (4, None)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "age"]))
    got = k_anonymize(
        df,
        ["age"],
        k=2,
        generalize={"age": F.floor(F.col("age") / 10) * 10},
    ).collect()
    # 12 and 17 generalize into band 10.0 (n=2); the two NULLs form
    # their own class (n=2) — both classes clear k=2
    assert sorted(r["id"] for r in got) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(df, ["age"], k=0)
    with pytest.raises(ValueError, match="absent"):
        k_anonymize(df, ["age"], k=1, generalize={"nope": F.lit(1)})


def test_l_diversity_audit(spark):
    from tdei_extract_load_service_spark.operators.privacy import (
        l_diversity_audit,
    )

    rows = [
        ("US", "flu"),
        ("US", "flu"),
        ("US", "cold"),
        ("DE", "flu"),
        ("DE", "flu"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["country", "diagnosis"])
    )
    got = {
        r["country"]: (r["n_records"], r["n_sensitive"], r["diverse"])
        for r in l_diversity_audit(df, ["country"], "diagnosis", 2).collect()
    }
    # DE is 2-anonymous yet HOMOGENEOUS — the attack l-diversity catches
    assert got == {"US": (3, 2, True), "DE": (2, 1, False)}
