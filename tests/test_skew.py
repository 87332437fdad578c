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


class TestSaltedJoin:
    def _frames(self, spark):
        import pandas as pd

        big = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1] * 50 + [2] * 3 + [3] * 2, "rid": range(55), "v": range(55)}
            )
        )
        small = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 4], "name": ["a", "b", "d"]})
        )
        return big, small

    def test_inner_equals_plain_join(self, spark):
        from tdei_extract_load_service_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        got = sorted(
            tuple(r)
            for r in salted_join(big, small, ["k"], ["rid"], n_salts=4)
            .select("k", "rid", "v", "name")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in big.join(small, "k").select("k", "rid", "v", "name").collect()
        )
        assert got == want and len(got) == 53

    def test_left_keeps_unmatched(self, spark):
        from tdei_extract_load_service_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        got = salted_join(big, small, ["k"], ["rid"], n_salts=4, how="left")
        assert got.count() == 55
        assert got.where(F.col("name").isNull()).count() == 2  # k=3 rows

    def test_hot_key_spreads_over_salts(self, spark):
        from tdei_extract_load_service_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        # peek at the pre-drop salt distribution for the hot key
        scattered = big.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("rid")), F.lit(4)).cast("int")
        )
        n = scattered.where(F.col("k") == 1).select("_salt").distinct().count()
        assert n > 1  # the hot key genuinely lands on multiple reducers

    def test_salt_by_join_key_rejected(self, spark):
        import pytest as _pytest

        from tdei_extract_load_service_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        with _pytest.raises(ValueError):
            salted_join(big, small, ["k"], ["k"], n_salts=4)
        with _pytest.raises(ValueError):
            salted_join(big, small, ["k"], ["rid"], how="full")


def test_salted_agg_salt_source_spreads_constant_payload(spark):
    """ADVICE r10: a hot key whose non-key columns are CONSTANT collapses
    the content-derived salt to one value; the opt-in ``salt_source``
    restores the spread without changing results."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"key": ["hot"] * 2000, "rid": range(2000), "status": ["ok"] * 2000}
        )
    ).drop("rid").withColumn("rid", F.monotonically_increasing_id())
    # drop rid from salt inputs to simulate a truly narrow table: key+status
    narrow = df.select("key", "status")
    salted_default = narrow.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("status"), F.lit(7)), F.lit(8)).cast("int"),
    )
    assert salted_default.select("_salt").distinct().count() == 1
    got = {
        r.key: r.n
        for r in salted_agg(
            df,
            ["key"],
            {"n": ("count", F.lit(1))},
            n_salts=8,
            salt_source=F.col("rid"),
        ).collect()
    }
    assert got == {"hot": 2000}
    # and the caller-supplied source actually spreads the hot key
    spread = (
        df.withColumn("_salt", F.pmod(F.col("rid"), F.lit(8)).cast("int"))
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8
