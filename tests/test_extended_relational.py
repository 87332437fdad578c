"""Extended relational built-ins: set ops, cube, approx aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_union_except(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(3,), (4,)], "x int")
    assert sorted(r.x for r in a.union(b).distinct().collect()) == [1, 2, 3, 4]
    assert sorted(r.x for r in a.exceptAll(b).collect()) == [1, 2]
    assert sorted(r.x for r in a.intersect(b).collect()) == [3]
    # unionByName aligns schemas by column name, not position
    c = spark.createDataFrame([(10, "a")], "y int, name string")
    d = spark.createDataFrame([("b", 20)], "name string, y int")
    assert {(r.y, r.name) for r in c.unionByName(d).collect()} == {(10, "a"), (20, "b")}


def test_cube_totals(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    total = [r.n for r in cube if r.l_returnflag is None and r.l_linestatus is None]
    assert total == [li.count()]  # grand-total row present exactly once
    # cube = rollup ∪ the (None, status) slices -> strictly more rows
    rollup_n = li.rollup("l_returnflag", "l_linestatus").agg(F.count("*")).count()
    assert len(cube) > rollup_n


def test_approx_count_distinct_error_bound(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.1  # 5 sigma at rsd=0.02


def test_range_join_left_outer_null_extends(spark):
    """how='left' keeps points with no containing interval (exactly once,
    null-extended) — the exact predicate is part of the join condition."""
    from tdei_extract_load_service_spark.operators.range_join import bucketed_range_join

    points = spark.createDataFrame([(1, 5), (2, 55), (3, 205)], "pid int, p int")
    intervals = spark.createDataFrame([(100, 0, 60)], "iid int, lo int, hi int")
    out = bucketed_range_join(points, intervals, "p", "lo", "hi", bucket_width=10, how="left")
    rows = {r["pid"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["iid"] == 100 and rows[2]["iid"] == 100
    assert rows[3]["iid"] is None and rows[3]["lo"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="replica"):
        bucketed_range_join(points, intervals, "p", "lo", "hi", 10, how="right")


def test_column_profile_one_pass_and_null_handling(spark):
    """column_profile: df.summary() shape from ONE aggregation pass —
    exact stats vs hand computation, nulls counted not averaged, and no
    join / no per-column re-scan in the plan."""
    import math

    from pyspark.sql import types as T

    from tdei_extract_load_service_spark.operators.profiling import column_profile

    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, None)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("a", T.DoubleType()),
                            T.StructField("b", T.DoubleType())])
    )
    out = {r["column"]: r for r in column_profile(df, ("a", "b")).collect()}
    assert out["a"]["n"] == 4 and out["a"]["n_null"] == 0
    assert out["a"]["mean"] == 2.5
    assert out["a"]["stddev"] == round(math.sqrt(5.0 / 3.0), 6)
    assert (out["a"]["min"], out["a"]["max"]) == (1.0, 4.0)
    assert out["b"]["n"] == 2 and out["b"]["n_null"] == 2
    assert out["b"]["mean"] == 20.0 and out["b"]["stddev"] == round(math.sqrt(200.0), 6)

    plan = column_profile(df, ("a", "b"))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan
    assert plan.count("HashAggregate") <= 2  # partial + final of ONE agg


def test_column_correlations_matches_hand_computation(spark):
    """Pearson from DECIMAL-exact sums vs numpy on the same data; perfect
    linear relation = 1.0; constant column -> NULL (zero variance)."""
    import numpy as np
    from pyspark.sql import types as T

    from tdei_extract_load_service_spark.operators.profiling import (
        column_correlations,
    )

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 7.5]
    ys = [2.1, 3.9, 6.2, 8.0, 9.9, 15.1]
    rows = [(x, y, 2 * x + 1, 4.0) for x, y in zip(xs, ys)]
    schema = T.StructType([T.StructField(c, T.DoubleType()) for c in ("x", "y", "z", "c")])
    df = spark.createDataFrame(rows, schema)
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in column_correlations(df, ("x", "y", "z", "c")).collect()}
    assert out[("x", "z")] == 1.0           # exact linear relation
    assert out[("x", "c")] is None          # zero-variance column
    expected = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(out[("x", "y")] - round(expected, 6)) <= 1e-6
    # one agg, no join/union (same plan discipline as column_profile)
    plan = column_correlations(df, ("x", "y"))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


def test_column_profile_degenerate_counts_are_null_not_nan(spark):
    from pyspark.sql import types as T

    from tdei_extract_load_service_spark.operators.profiling import column_profile

    schema = T.StructType([T.StructField("a", T.DoubleType()),
                           T.StructField("b", T.DoubleType())])
    df = spark.createDataFrame([(None, 5.0)], schema)
    out = {r["column"]: r for r in column_profile(df, ("a", "b")).collect()}
    # empty column: no mean/stddev, not NaN
    assert out["a"]["n"] == 0 and out["a"]["mean"] is None and out["a"]["stddev"] is None
    # single value: mean yes, sample stddev undefined -> NULL
    assert out["b"]["mean"] == 5.0 and out["b"]["stddev"] is None


def test_profiling_exact_at_small_magnitudes(spark):
    """Code-review r5 #2: decimal(38,6)*decimal(38,6) resolves to scale 6
    in Spark (allowPrecisionLoss), rounding every square to zero for
    small-magnitude data — stddev came back 0.0 and a perfect correlation
    NULL. The DECIMAL(18,6)-operand fix keeps products exact (37,12)."""
    import pytest
    from pyspark.sql import types as T

    from tdei_extract_load_service_spark.operators.profiling import (
        column_correlations,
        column_profile,
    )

    schema = T.StructType([T.StructField("a", T.DoubleType()),
                           T.StructField("b", T.DoubleType())])
    df = spark.createDataFrame(
        [(1e-4, 2e-4), (2e-4, 4e-4), (3e-4, 6e-4), (4e-4, 8e-4)], schema
    )
    prof = {r["column"]: r for r in column_profile(df, ("a", "b")).collect()}
    assert prof["a"]["stddev"] == 0.000129  # round(sqrt(5/3)*1e-4, 6)
    corr = column_correlations(df, ("a", "b")).collect()[0]
    assert corr["corr"] == 1.0

    with pytest.raises(ValueError, match="at least one column"):
        column_profile(df, ())
    with pytest.raises(ValueError, match="at least two"):
        column_correlations(df, ("a",))
    # zero-row null count is 0, not NULL
    empty = {r["column"]: r for r in
             column_profile(df.where("a > 1"), ("a",)).collect()}
    assert empty["a"]["n_null"] == 0 and empty["a"]["mean"] is None


def test_profiling_raises_on_decimal_bound_overflow(spark):
    """ADVICE r5 #2: a value with |v| >= 1e12 NULLs out of the
    DECIMAL(18,6) cast under non-ANSI Spark, silently dropping the row
    from the moment sums while n still counts it. The guard aggregate
    must turn that into a LOUD execution-time failure, not a silently
    shifted mean/stddev/corr."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from tdei_extract_load_service_spark.operators.profiling import (
        column_correlations,
        column_profile,
    )

    ok = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 1.0), (3.0, 5.0)], "a: double, b: double"
    )
    # sanity: in-bound data still profiles
    assert len(column_profile(ok, ("a", "b")).collect()) == 2
    assert len(column_correlations(ok, ("a", "b")).collect()) == 1

    bad = spark.createDataFrame(
        [(1.0, 2.0), (5.0e12, 1.0), (3.0, 5.0)], "a: double, b: double"
    )
    # under ANSI the decimal cast itself throws (NUMERIC_VALUE_OUT_OF_RANGE);
    # under non-ANSI the cast NULLs and OUR guard must raise — loud either way
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    for ansi in ("true", "false"):
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try:
            with pytest.raises(Exception, match="Decimal\\(18,\\s*6\\)|DECIMAL\\(18,6\\)"):
                column_profile(bad, ("a", "b")).collect()
            with pytest.raises(Exception, match="Decimal\\(18,\\s*6\\)|DECIMAL\\(18,6\\)"):
                column_correlations(bad, ("a", "b")).collect()
            # the clean column alone still profiles — the guard is per-column
            assert len(column_profile(bad, ("b",)).collect()) == 1
        finally:
            spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_column_profile_categorical_counts_and_ties(spark):
    """Categorical profile: exact distinct/null counts and deterministic
    top-k (ties break by value ascending), one row per (column, top
    value) with the per-column stats repeated."""
    from tdei_extract_load_service_spark.operators.profiling import (
        column_profile_categorical,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", None), ("b", "y"), ("c", "y"), (None, "x")],
        "seg: string, tag: string",
    )
    rows = column_profile_categorical(df, ("seg", "tag"), top_k=2).collect()
    by = {(r["col_name"], r["rank"]): r for r in rows}
    seg1 = by[("seg", 1)]
    # 'a' and 'b' tie at 2 -> 'a' wins rank 1 by value order
    assert (seg1["value"], seg1["value_n"]) == ("a", 2)
    assert (by[("seg", 2)]["value"], by[("seg", 2)]["value_n"]) == ("b", 2)
    assert seg1["n"] == 5 and seg1["n_null"] == 1 and seg1["n_distinct"] == 3
    tag1 = by[("tag", 1)]
    assert (tag1["value"], tag1["value_n"]) == ("y", 3)
    assert tag1["n"] == 5 and tag1["n_null"] == 1 and tag1["n_distinct"] == 2
    assert len(rows) == 4  # two columns x top-2


def test_column_distinct_sketch_within_rsd_of_exact(spark):
    """HLL++ sketch distinct counts stay within a generous multiple of
    the requested 5% rsd of the exact counts on real fixture columns."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.profiling import (
        column_distinct_counts,
    )

    ords = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    approx = {
        r["col_name"]: r["n_distinct_approx"]
        for r in column_distinct_counts(
            ords, ("o_custkey", "o_orderstatus", "o_orderpriority")
        ).collect()
    }
    for c in ("o_custkey", "o_orderstatus", "o_orderpriority"):
        exact = ords.select(F.countDistinct(c)).first()[0]
        assert abs(approx[c] - exact) <= max(1, 0.15 * exact), (c, approx[c], exact)


def test_quantile_bounds_histogram_covers_every_row(spark):
    """Data-dependent-bounds histogram: the default (sketch-bounds) path
    must clamp outliers into the edge bins so sum(n) == row count, and
    the degenerate constant column must raise instead of dividing by
    zero."""
    import pytest
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.profiling import (
        quantile_bounds_histogram,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    hist = quantile_bounds_histogram(li, "l_extendedprice", n_bins=20).collect()
    assert sum(r["n"] for r in hist) == li.count()
    assert {r["bin"] for r in hist} <= set(range(20))
    assert min(r["bin"] for r in hist) == 0 and max(r["bin"] for r in hist) == 19

    const = spark.createDataFrame([(7.0,)] * 10, "v: double")
    with pytest.raises(ValueError, match="degenerate range"):
        quantile_bounds_histogram(const, "v", n_bins=5)

    # non-identifier column names must survive the percentile expr
    # (ADVICE r6: the raw name used to be interpolated into F.expr)
    odd = spark.createDataFrame(
        [(float(i),) for i in range(100)], ["my odd-column name"]
    )
    hist = quantile_bounds_histogram(odd, "my odd-column name", n_bins=4).collect()
    assert sum(r["n"] for r in hist) == 100


def test_exact_percentiles_distributed_matches_builtin(spark):
    """The distributed exact-percentile rewrite (optimization r13) must
    be BIT-identical to Spark's built-in ``percentile`` — on the real
    fixture column at two SFs and on synthetic edge shapes (duplicates
    straddling an interpolation rank, exact-integer ranks, a two-value
    column, NULLs mixed in)."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.profiling import (
        exact_percentiles_distributed,
    )

    ps = [0.01, 0.25, 0.5, 0.75, 0.99]
    frames = [
        spark.read.parquet(f"/root/testdata/{sf}/lineitem.parquet").select(
            F.col("l_extendedprice").alias("v")
        )
        for sf in ("sf0.001", "sf0.01")
    ]
    frames.append(
        spark.createDataFrame(
            [(1.0,), (1.0,), (1.0,), (2.5,), (None,), (2.5,), (9.0,)],
            "v: double",
        )
    )
    frames.append(spark.createDataFrame([(3.25,), (None,), (7.5,)], "v: double"))
    frames.append(
        spark.createDataFrame([(float(i % 5),) for i in range(101)], ["v"])
    )
    for df in frames:
        want = df.agg(
            F.expr(
                "percentile(v, array("
                + ",".join(f"{p}D" for p in ps)
                + "))"
            ).alias("b")
        ).first()["b"]
        got = exact_percentiles_distributed(df, "v", ps)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert repr(g) == repr(w), (g, w)

    # all-NULL column: the built-in returns NULL; the rewrite returns Nones
    nulls = spark.createDataFrame([(None,), (None,)], "v: double")
    assert exact_percentiles_distributed(nulls, "v", ps) == [None] * len(ps)


class TestSCD2Intervals:
    def _stream(self, spark, rows):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "ts", "rid", "attr"])
        )

    def test_runs_collapse_and_chain(self, spark):
        from tdei_extract_load_service_spark.operators.scd import scd2_intervals

        df = self._stream(
            spark,
            [(1, 10, 0, "A"), (1, 20, 1, "A"), (1, 30, 2, "B"), (1, 40, 3, "A")],
        )
        got = [
            (r["attr"], r["valid_from"], r["valid_to"], r["n_obs"])
            for r in scd2_intervals(df, ["k"], "ts", "attr", ["rid"])
            .orderBy("valid_from")
            .collect()
        ]
        assert got == [("A", 10, 30, 2), ("B", 30, 40, 1), ("A", 40, None, 1)]

    def test_same_ts_flip_uses_tiebreak(self, spark):
        from tdei_extract_load_service_spark.operators.scd import scd2_intervals

        df = self._stream(spark, [(1, 10, 1, "B"), (1, 10, 0, "A")])
        got = [
            (r["attr"], r["valid_to"])
            for r in scd2_intervals(df, ["k"], "ts", "attr", ["rid"])
            .orderBy("attr")
            .collect()
        ]
        # rid orders A before B; A's interval closes at B's (same-ts) start
        assert got == [("A", 10), ("B", None)]

    def test_null_attr_is_a_value(self, spark):
        from tdei_extract_load_service_spark.operators.scd import scd2_intervals

        df = self._stream(
            spark, [(1, 10, 0, None), (1, 20, 1, None), (1, 30, 2, "A")]
        )
        got = [
            (r["attr"], r["n_obs"])
            for r in scd2_intervals(df, ["k"], "ts", "attr", ["rid"])
            .orderBy("valid_from")
            .collect()
        ]
        # eqNullSafe: consecutive NULLs are ONE run, not one run each
        assert got == [(None, 2), ("A", 1)]

    def test_keys_are_independent(self, spark):
        from tdei_extract_load_service_spark.operators.scd import scd2_intervals

        df = self._stream(spark, [(1, 10, 0, "A"), (2, 20, 1, "A")])
        out = scd2_intervals(df, ["k"], "ts", "attr", ["rid"])
        assert out.count() == 2
        assert all(r["valid_to"] is None for r in out.collect())


class TestZScoreOutliers:
    def test_flags_only_cross_threshold_rows(self, spark):
        import pandas as pd

        from tdei_extract_load_service_spark.operators.profiling import (
            zscore_outliers,
        )

        rows = [("a", float(v)) for v in [10, 10, 10, 10, 100]] + [
            ("b", 5.0),
            ("b", 5.0),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "v"]))
        got = zscore_outliers(df, "g", "v", threshold=1.5).collect()
        # only the 100 in group a crosses 1.5 sigma; group b has zero
        # variance and must emit nothing (not NaN)
        assert [(r["g"], r["v"]) for r in got] == [("a", 100.0)]
        assert got[0]["z"] > 1.5

    def test_per_group_not_global(self, spark):
        import pandas as pd

        from tdei_extract_load_service_spark.operators.profiling import (
            zscore_outliers,
        )

        # 1000 is normal for group big but a huge global outlier; the
        # per-group contract must NOT flag it
        rows = [("small", float(v)) for v in [1, 2, 1, 2, 1, 2]] + [
            ("big", 1000.0),
            ("big", 1001.0),
            ("big", 1000.0),
            ("big", 1001.0),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "v"]))
        assert zscore_outliers(df, "g", "v", threshold=3.0).count() == 0

    def test_singleton_group_emits_nothing(self, spark):
        import pandas as pd

        from tdei_extract_load_service_spark.operators.profiling import (
            zscore_outliers,
        )

        df = spark.createDataFrame(
            pd.DataFrame([("a", 7.0)], columns=["g", "v"])
        )
        assert zscore_outliers(df, "g", "v").count() == 0


class TestTemporalJoin:
    @staticmethod
    def _frames(spark):
        import pandas as pd

        dim_rows = [
            # key, status, valid_from, valid_to (None = current)
            (1, "new", 10.0, 20.0),
            (1, "active", 20.0, 50.0),
            (1, "churned", 50.0, None),
            (2, "active", 5.0, None),
        ]
        dim = spark.createDataFrame(
            pd.DataFrame(
                dim_rows, columns=["k", "status", "valid_from", "valid_to"]
            )
        )
        fact_rows = [
            (100, 1, 25.0),  # mid interval -> active (NOT the latest)
            (101, 1, 5.0),   # before first interval
            (102, 1, 99.0),  # open current interval -> churned
            (103, 1, 20.0),  # exactly a boundary -> the NEW version
            (104, 3, 30.0),  # key absent from dim
        ]
        facts = spark.createDataFrame(
            pd.DataFrame(fact_rows, columns=["fid", "k", "ts"])
        )
        return facts, dim

    def test_picks_version_valid_at_fact_time(self, spark):
        from tdei_extract_load_service_spark.operators.scd import temporal_join

        facts, dim = self._frames(spark)
        got = {
            r["fid"]: r["status"]
            for r in temporal_join(facts, dim, ["k"], "ts").collect()
        }
        # 101 (pre-history) and 104 (no dim key) drop under inner
        assert got == {100: "active", 102: "churned", 103: "active"}

    def test_left_keeps_unmatched_facts_with_null_version(self, spark):
        from tdei_extract_load_service_spark.operators.scd import temporal_join

        facts, dim = self._frames(spark)
        got = {
            r["fid"]: r["status"]
            for r in temporal_join(
                facts, dim, ["k"], "ts", how="left"
            ).collect()
        }
        assert got[101] is None and got[104] is None
        assert len(got) == 5

    def test_at_most_one_version_per_fact(self, spark):
        from tdei_extract_load_service_spark.operators.scd import temporal_join

        facts, dim = self._frames(spark)
        out = temporal_join(facts, dim, ["k"], "ts")
        assert out.count() == out.select("fid").distinct().count()


class TestKeySkewProfile:
    def test_metrics_on_known_distribution(self, spark):
        """keys: a->4 rows, b->1, c->1 (n=6, keys=3, avg=2)."""
        import pandas as pd

        from tdei_extract_load_service_spark.catalog import REGISTRY

        import pyspark.sql.functions as F

        rows = [("a",)] * 4 + [("b",), ("c",)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
        counts = df.groupBy("k").agg(F.count("*").alias("cnt")).persist()
        m = counts.agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        ).collect()[0]
        assert (m["n_keys"], m["n_rows"], m["max_cnt"]) == (3, 6, 4)
        # hot threshold: cnt * n_keys > 2 * n_rows -> cnt*3 > 12 -> cnt > 4:
        # 'a' at exactly 2x average is NOT hot (strict inequality)
        hot = counts.where(
            F.col("cnt") * F.lit(3) > F.lit(2) * F.lit(6)
        ).count()
        assert hot == 0

    def test_top_key_tiebreak_is_min(self, spark):
        import pandas as pd
        import pyspark.sql.functions as F

        rows = [("z",)] * 3 + [("a",)] * 3 + [("m",)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
        counts = df.groupBy("k").agg(F.count("*").alias("cnt"))
        mx = counts.agg(F.max("cnt").alias("m")).collect()[0]["m"]
        top = (
            counts.where(F.col("cnt") == mx)
            .agg(F.min("k").alias("t"))
            .collect()[0]["t"]
        )
        assert top == "a"


class TestDistinctRollup:
    """Stored HLL sketch partials + window rollup (round 11):
    merge-losslessness and the estimating-regime error bound."""

    def test_rollup_equals_direct_sketch(self, spark):
        from pyspark.sql import functions as F

        from tdei_extract_load_service_spark.operators import profiling as P

        df = spark.range(0, 50_000).select(
            (F.col("id") % 40).alias("bucket"),
            F.md5(F.col("id").cast("string")).alias("k"),
        )
        path = P.build_distinct_sketch_partials(
            df, F.col("bucket"), "k", corpus_key="pytest-hll-direct"
        )
        for lo, hi in ((None, None), (0, 19), (10, 30)):
            rolled = P.distinct_rollup(spark, path, lo=lo, hi=hi).first()
            sub = df
            if lo is not None:
                sub = sub.where(F.col("bucket") >= lo)
            if hi is not None:
                sub = sub.where(F.col("bucket") <= hi)
            direct = sub.agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("k", F.lit(12))
                ).cast("long")
            ).first()[0]
            # HLL union is register-max: merging stored partials is
            # BIT-identical to sketching the window's raw rows
            assert rolled.distinct_estimate == direct, (lo, hi)

    def test_estimating_regime_error_bound(self, spark):
        """100k uniques is far past the lgK=12 coupon-exact regime —
        the estimate must land within ~3x the theoretical rsd
        (1.04/sqrt(4096) ≈ 1.6%)."""
        from pyspark.sql import functions as F

        from tdei_extract_load_service_spark.operators import profiling as P

        n = 100_000
        df = spark.range(0, n).select(
            (F.col("id") % 10).alias("bucket"),
            F.md5(F.col("id").cast("string")).alias("k"),
        )
        path = P.build_distinct_sketch_partials(
            df, F.col("bucket"), "k", corpus_key="pytest-hll-est"
        )
        est = P.distinct_rollup(spark, path).first().distinct_estimate
        assert abs(est - n) / n < 0.05, est

    def test_fixture_cardinality_is_coupon_exact(self, spark):
        """The oracle contract of distinct_rollup_windows: at every
        fixture SF the user cardinality sits below the lgK=12 coupon
        bound, so the estimate EQUALS exact COUNT(DISTINCT)."""
        from pyspark.sql import functions as F

        from tdei_extract_load_service_spark.catalog import (
            REGISTRY,
            _read_events,
        )

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            got = {
                r.wname: r.distinct_estimate
                for r in REGISTRY["distinct_rollup_windows"]
                .query(spark, sf)
                .collect()
            }
            exact = (
                _read_events(spark, sf).select("user_id").distinct().count()
            )
            assert got["all"] == exact, sf
