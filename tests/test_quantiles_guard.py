"""High-cardinality guard for grouped_quantiles_checked: past the
broadcast threshold the verification thresholds must arrive via a
BroadcastHashJoin, not an O(groups) CASE-literal chain (VERDICT r3 #7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators.quantiles import (
    grouped_quantiles_checked,
)


def _groups_df(spark, n_groups: int, rows_per_group: int = 100):
    # deterministic: each group g gets values 0..rows_per_group-1
    return spark.range(n_groups * rows_per_group).select(
        (F.col("id") % n_groups).cast("string").alias("g"),
        (F.col("id") / n_groups).cast("long").cast("double").alias("v"),
    )


def test_small_key_path_stays_joinless(spark):
    df = _groups_df(spark, 5)
    out = grouped_quantiles_checked(df, "g", "v", ps=[0.5, 0.95], accuracy=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "small-key path must inline CASE literals, not join"
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["p50_ok"] and r["p95_ok"] for r in rows)


def test_1k_groups_broadcast_join_path(spark):
    df = _groups_df(spark, 1000)
    out = grouped_quantiles_checked(df, "g", "v", ps=[0.5, 0.95, 0.99], accuracy=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no giant expression tree: the CASE chain would mention one literal
    # comparison per group; the plan must stay O(1) in |groups|
    assert plan.count("CASE WHEN") < 50
    rows = out.collect()
    assert len(rows) == 1000
    bad = [r for r in rows if not (r["p50_ok"] and r["p95_ok"] and r["p99_ok"])]
    assert not bad, f"GK bound violated for {len(bad)} groups, e.g. {bad[:3]}"
    assert all(r["n_rows"] == 100 for r in rows)


def test_catalog_quantiles_matches_previous_shape(spark):
    from tdei_extract_load_service_spark.catalog import REGISTRY

    out = REGISTRY["quantiles"].query(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["l_returnflag", "n_rows", "p50_ok", "p95_ok", "p99_ok"]
    assert all(r["p50_ok"] and r["p95_ok"] and r["p99_ok"] for r in rows)


def test_null_values_and_null_keys_excluded_consistently(spark):
    """ADVICE r4: an all-null-value group used to TypeError (approx_percentile
    returns NULL -> float(None)); null group keys diverged between the CASE
    path (counted, check false) and the join path (silently dropped). Policy
    now: null keys and null values are excluded on BOTH paths."""
    from pyspark.sql import types as T

    rows = (
        [("a", float(v)) for v in range(100)]
        + [("allnull", None)] * 10          # group with no non-null values
        + [(None, 5.0)] * 10                # null group key
        + [("b", float(v)) for v in range(50)]
        + [("b", None)] * 5                 # null values inside a live group
    )
    schema = T.StructType(
        [T.StructField("g", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    df = spark.createDataFrame(rows, schema)
    out = grouped_quantiles_checked(df, "g", "v", ps=[0.5], accuracy=1000)
    got = {r["g"]: r for r in out.collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["n_rows"] == 100 and got["a"]["p50_ok"]
    assert got["b"]["n_rows"] == 50 and got["b"]["p50_ok"]

    # same policy past the broadcast threshold (join path)
    out2 = grouped_quantiles_checked(df, "g", "v", ps=[0.5], broadcast_threshold=1)
    got2 = {r["g"]: r for r in out2.collect()}
    assert set(got2) == {"a", "b"}
    assert got2["a"]["n_rows"] == 100 and got2["b"]["n_rows"] == 50
