"""Semantic tests for blocked fuzzy joins (operators/fuzzy.py) and
fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

import pandas as pd
import pytest


class TestFuzzyJoinBlocked:
    @staticmethod
    def _join(spark, left_rows, right_rows):
        from tdei_extract_load_service_spark.operators.fuzzy import (
            fuzzy_join_blocked,
        )

        left = spark.createDataFrame(
            pd.DataFrame(left_rows, columns=["lid", "lt"])
        )
        right = spark.createDataFrame(
            pd.DataFrame(right_rows, columns=["rid", "rt"])
        )
        out = fuzzy_join_blocked(left, right, "lid", "rid", "lt", "rt")
        return sorted(
            (r["lid"], r["rid"], r["dist"]) for r in out.collect()
        )

    def test_finds_all_three_edit_kinds_and_rejects_distance_two(self, spark):
        left = [(1, "kitten")]
        right = [
            (10, "kitten"),   # exact -> 0
            (11, "mitten"),   # substitution -> 1
            (12, "kittens"),  # insertion -> 1
            (13, "kiten"),    # deletion -> 1
            (14, "mittens"),  # two edits -> excluded
            (15, "sitting"),  # far -> excluded
        ]
        assert self._join(spark, left, right) == [
            (1, 10, 0),
            (1, 11, 1),
            (1, 12, 1),
            (1, 13, 1),
        ]

    def test_blocking_is_complete_vs_brute_force(self, spark):
        # every within-1 pair the quadratic scan finds, the signature
        # join must find too
        import pyspark.sql.functions as F

        words = [
            "alpha", "alpho", "alphaa", "alph", "beta", "betta", "bete",
            "gamma", "gamm", "gammma", "delta", "delt a", "dleta",
        ]
        left = [(i, w) for i, w in enumerate(words)]
        right = [(100 + i, w) for i, w in enumerate(words)]
        got = {(l, r) for l, r, _ in self._join(spark, left, right)}
        ldf = spark.createDataFrame(pd.DataFrame(left, columns=["lid", "lt"]))
        rdf = spark.createDataFrame(pd.DataFrame(right, columns=["rid", "rt"]))
        brute = {
            (r["lid"], r["rid"])
            for r in ldf.crossJoin(rdf)
            .where(F.levenshtein("lt", "rt") <= 1)
            .collect()
        }
        assert got == brute

    def test_larger_radius_rejected(self, spark):
        from tdei_extract_load_service_spark.operators.fuzzy import (
            fuzzy_join_blocked,
        )

        df = spark.createDataFrame(pd.DataFrame([(1, "x")], columns=["i", "t"]))
        with pytest.raises(ValueError):
            fuzzy_join_blocked(df, df, "i", "i", "t", "t", max_dist=2)


class TestPagerankFixedPoint:
    @staticmethod
    def _rank(spark, edge_pairs, iterations=3):
        from tdei_extract_load_service_spark.operators.graph import pagerank

        both = edge_pairs + [(b, a) for (a, b) in edge_pairs]
        edges = spark.createDataFrame(
            pd.DataFrame(sorted(set(both)), columns=["src", "dst"])
        )
        out = pagerank(edges, iterations=iterations)
        return {r["node"]: r["rank_fp"] for r in out.collect()}

    @staticmethod
    def _reference(edge_pairs, iterations=3):
        """The identical fixed-point recurrence in plain Python."""
        both = sorted(set(edge_pairs + [(b, a) for (a, b) in edge_pairs]))
        nodes = sorted({a for a, _ in both})
        deg = {u: sum(1 for a, _ in both if a == u) for u in nodes}
        n = len(nodes)
        unit = 1_000_000_000_000
        base = (15 * unit // 100) // n
        r = {u: unit // n for u in nodes}
        for _ in range(iterations):
            s = {u: 0 for u in nodes}
            for a, b in both:
                s[b] += r[a] // deg[a]
            r = {u: base + (85 * s[u]) // 100 for u in nodes}
        return r

    def test_matches_python_reference_on_irregular_graph(self, spark):
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (6, 1)]
        assert self._rank(spark, edges) == self._reference(edges)

    def test_hub_outranks_leaf(self, spark):
        edges = [(1, 2), (1, 3), (1, 4), (1, 5)]
        got = self._rank(spark, edges)
        assert got[1] > got[2] == got[3] == got[4] == got[5]

    def test_mass_is_conserved_up_to_floor_leakage(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        got = self._rank(spark, edges)
        unit = 1_000_000_000_000
        # each DIV floors away < 1 unit per edge/node per iteration
        assert abs(sum(got.values()) - unit) < 100 * len(got)

    def test_source_only_node_survives_and_keeps_spreading(self, spark):
        """ADVICE r8: a DIRECTED node with out-edges but NO in-edges must
        stay in the output at base rank and keep contributing mass every
        iteration (the pre-fix rebuild-from-contrib dropped node 3 after
        iteration 1 and starved node 1 of its later contributions)."""
        directed = [(1, 2), (2, 1), (3, 1)]
        edges = spark.createDataFrame(
            pd.DataFrame(directed, columns=["src", "dst"])
        )
        from tdei_extract_load_service_spark.operators.graph import pagerank

        got = {
            r["node"]: r["rank_fp"]
            for r in pagerank(edges, iterations=3).collect()
        }
        # plain-Python twin of the directed recurrence
        nodes = sorted({a for a, _ in directed})
        deg = {u: sum(1 for a, _ in directed if a == u) for u in nodes}
        n = len(nodes)
        unit = 1_000_000_000_000
        base = (15 * unit // 100) // n
        r = {u: unit // n for u in nodes}
        for _ in range(3):
            s = {u: 0 for u in nodes}
            for a, b in directed:
                s[b] += r[a] // deg[a]
            r = {u: base + (85 * s[u]) // 100 for u in nodes}
        assert set(got) == set(nodes)
        assert got == r
        assert got[3] == base  # no in-edges: rank is the damping floor
