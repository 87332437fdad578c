"""Semantic tests for row-level CDC application (operators/cdc.py)."""

from __future__ import annotations

import pandas as pd
import pytest


def _apply(spark, snap_rows, chg_rows):
    from tdei_extract_load_service_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(
        pd.DataFrame(snap_rows, columns=["k", "name", "bal"])
    )
    chg = spark.createDataFrame(
        pd.DataFrame(chg_rows, columns=["k", "seq", "op", "bal"])
    )
    out = cdc_apply(snap, chg, "k", ("seq",), "op")
    return {r["k"]: (r["name"], r["bal"]) for r in out.collect()}


def test_upsert_delete_insert_passthrough(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        [(1, 1, "U", 11.0), (2, 1, "D", None), (4, 1, "U", 40.0)],
    )
    # 1 updated, 2 deleted, 3 untouched, 4 inserted (no snapshot name)
    assert got == {1: ("a", 11.0), 3: ("c", 30.0), 4: (None, 40.0)}


def test_latest_change_wins_by_sequence(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 3, "U", 33.0), (1, 1, "D", None), (1, 2, "U", 22.0)],
    )
    assert got == {1: ("a", 33.0)}  # seq 3 upsert outlives the seq 1 delete


def test_delete_then_reinsert_order(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 2, "D", None), (1, 1, "U", 11.0)],
    )
    assert got == {}  # latest is the delete


def test_null_payload_is_partial_update(spark):
    got = _apply(
        spark,
        [(1, "a", 10.0)],
        [(1, 1, "U", None)],
    )
    assert got == {1: ("a", 10.0)}  # NULL = no change, not set-to-NULL


def test_unknown_payload_column_rejected(spark):
    from tdei_extract_load_service_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(pd.DataFrame([(1, 1.0)], columns=["k", "bal"]))
    chg = spark.createDataFrame(
        pd.DataFrame([(1, 1, "U", 5.0)], columns=["k", "seq", "op", "extra"])
    )
    with pytest.raises(ValueError):
        cdc_apply(snap, chg, "k", ("seq",), "op")


class TestIncrementalAggMaintain:
    @staticmethod
    def _maintain(spark, base_rows, feed_rows):
        from tdei_extract_load_service_spark.operators.cdc import (
            incremental_agg_maintain,
        )

        base = spark.createDataFrame(
            pd.DataFrame(base_rows, columns=["g", "n", "s"])
        )
        feed = spark.createDataFrame(
            pd.DataFrame(feed_rows, columns=["bg", "bv", "ag", "av"])
        )
        out = incremental_agg_maintain(
            base, feed, "g", "n", "s", "bg", "bv", "ag", "av"
        )
        return {r["g"]: (r["n"], float(r["s"])) for r in out.collect()}

    def test_in_place_update_is_pure_value_delta(self, spark):
        got = self._maintain(
            spark, [("a", 2, 30.0)], [("a", 10.0, "a", 15.0)]
        )
        assert got == {"a": (2, 35.0)}

    def test_group_move_decrements_old_increments_new(self, spark):
        got = self._maintain(
            spark,
            [("a", 2, 30.0), ("b", 1, 5.0)],
            [("a", 10.0, "b", 10.0)],
        )
        assert got == {"a": (1, 20.0), "b": (2, 15.0)}

    def test_delete_drains_group_to_zero_and_drops_it(self, spark):
        got = self._maintain(
            spark, [("a", 1, 10.0), ("b", 1, 5.0)], [("a", 10.0, None, None)]
        )
        assert got == {"b": (1, 5.0)}

    def test_insert_creates_brand_new_group(self, spark):
        got = self._maintain(
            spark, [("a", 1, 10.0)], [(None, None, "z", 7.0)]
        )
        assert got == {"a": (1, 10.0), "z": (1, 7.0)}

    def test_matches_full_recompute(self, spark):
        # base relation -> aggregate; apply a mixed feed both ways:
        # incrementally (operator) and by recomputing over the merged
        # relation — the two must agree exactly
        import pyspark.sql.functions as F

        rows = [(i, "g%d" % (i % 3), float(i)) for i in range(1, 31)]
        rel = spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "g", "v"])
        )
        base = rel.groupBy("g").agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        )
        # feed: delete k=3, move k=4 to g-new with v=100, update k=5
        # in place to 50, insert k=99 into g1
        feed_rows = [
            ("g0", 3.0, None, None),          # delete k=3 (g0)
            ("g1", 4.0, "gnew", 100.0),       # move k=4
            ("g2", 5.0, "g2", 50.0),          # in-place update k=5
            (None, None, "g1", 99.0),         # insert k=99
        ]
        feed = spark.createDataFrame(
            pd.DataFrame(feed_rows, columns=["bg", "bv", "ag", "av"])
        )
        from tdei_extract_load_service_spark.operators.cdc import (
            incremental_agg_maintain,
        )

        inc = {
            r["g"]: (r["n"], float(r["s"]))
            for r in incremental_agg_maintain(
                base, feed, "g", "n", "s", "bg", "bv", "ag", "av"
            ).collect()
        }
        merged_rows = [
            (k, g, v)
            for (k, g, v) in rows
            if k != 3
        ]
        merged_rows = [
            (k, "gnew", 100.0) if k == 4 else (k, g, 50.0) if k == 5 else (k, g, v)
            for (k, g, v) in merged_rows
        ] + [(99, "g1", 99.0)]
        rec = (
            spark.createDataFrame(
                pd.DataFrame(merged_rows, columns=["k", "g", "v"])
            )
            .groupBy("g")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
            )
        )
        full = {r["g"]: (r["n"], float(r["s"])) for r in rec.collect()}
        assert inc == full


class TestTableChanges:
    """table_changes — the snapshot-diff dual of cdc_apply."""

    def _frames(self, spark):
        import pyspark.sql.functions as F  # noqa: F401

        v1 = spark.createDataFrame(
            pd.DataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
                columns=["k", "name", "bal"],
            )
        )
        v2 = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "a", 10.0),     # untouched
                    (2, "b2", 20.0),    # updated (name)
                    (3, "c", 3.0),      # updated (bal NULL -> 3.0: null-safe)
                    (5, "e", 50.0),     # inserted
                ],                       # 4 deleted
                columns=["k", "name", "bal"],
            )
        )
        return v1, v2

    def test_classification_and_images(self, spark):
        from tdei_extract_load_service_spark.operators.cdc import (
            table_changes,
        )

        v1, v2 = self._frames(spark)
        got = {
            r["k"]: (
                r["change_op"],
                r["name_before"], r["name_after"],
                r["bal_before"], r["bal_after"],
            )
            for r in table_changes(v1, v2, ["k"]).collect()
        }
        assert got == {
            2: ("update", "b", "b2", 20.0, 20.0),
            3: ("update", "c", "c", None, 3.0),
            4: ("delete", "d", None, 40.0, None),
            5: ("insert", None, "e", None, 50.0),
        }

    def test_identical_versions_diff_empty(self, spark):
        from tdei_extract_load_service_spark.operators.cdc import (
            table_changes,
        )

        v1, _ = self._frames(spark)
        assert table_changes(v1, v1, ["k"]).count() == 0

    def test_schema_mismatch_rejected(self, spark):
        from tdei_extract_load_service_spark.operators.cdc import (
            table_changes,
        )

        v1, v2 = self._frames(spark)
        with pytest.raises(ValueError, match="share a schema"):
            table_changes(v1, v2.drop("bal"), ["k"])

    def test_feed_folds_back_with_cdc_apply(self, spark):
        """Closure: applying the derived feed to v1 with cdc_apply must
        reproduce v2 exactly — the two operators are true inverses (on
        feeds without sparse-NULL upsert payloads, cdc_apply's partial-
        update convention)."""
        import pyspark.sql.functions as F

        from tdei_extract_load_service_spark.operators.cdc import (
            cdc_apply,
            table_changes,
        )

        v1 = spark.createDataFrame(
            pd.DataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0)],
                columns=["k", "name", "bal"],
            )
        )
        v2 = spark.createDataFrame(
            pd.DataFrame(
                [(1, "a", 10.0), (2, "b2", 21.0), (5, "e", 50.0)],
                columns=["k", "name", "bal"],
            )
        )
        feed = table_changes(v1, v2, ["k"]).select(
            "k",
            F.lit(1).alias("seq"),
            F.when(F.col("change_op") == "delete", "D")
            .otherwise("U")
            .alias("op"),
            F.col("name_after").alias("name"),
            F.col("bal_after").alias("bal"),
        )
        folded = {
            (r["k"], r["name"], r["bal"])
            for r in cdc_apply(v1, feed, "k", ("seq",), "op").collect()
        }
        want = {(r["k"], r["name"], r["bal"]) for r in v2.collect()}
        assert folded == want
