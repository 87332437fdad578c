"""Relational operator semantics (SURVEY.md §2.2) on small in-memory frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators import relational as R
from tdei_extract_load_service_spark.operators.query_builder import DynamicQueryBuilder


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, "US"), (2, "b", 20.0, "US"), (3, "c", 30.0, "FR"),
         (4, "d", 40.0, "FR"), (5, "e", 50.0, "DE")],
        "id int, name string, score double, country string",
    )


def test_route_case_first_match_wins(spark):
    # extract-load-service.ts:74-82 ordering: 'nodes' checked before 'zones'
    df = spark.createDataFrame(
        [("dir/nodes_zones.geojson",), ("x/edges.geojson",), ("misc.geojson",)], "path string"
    )
    out = R.route_case(df, "path", R.OSW_ROUTES).select("path", "kind").collect()
    got = {r.path: r.kind for r in out}
    assert got["dir/nodes_zones.geojson"] == "nodes"
    assert got["x/edges.geojson"] == "edges"
    assert got["misc.geojson"] == "extension"


def test_paginate_cap_and_floors(people):
    # dynamic-query-object.ts:45-58: size capped at 50, floors of 1
    assert R.paginate(people, [F.col("id")], page_no=0, page_size=0).count() == 1
    assert R.paginate(people, [F.col("id")], page_no=1, page_size=999).count() == 5
    rows = R.paginate(people, [F.col("id")], page_no=2, page_size=2).collect()
    assert [r.id for r in rows] == [3, 4]


def test_joins(people, spark):
    other = spark.createDataFrame([(1,), (3,), (9,)], "id int")
    assert {r.id for r in R.join_semi(people, other, "id").collect()} == {1, 3}
    assert {r.id for r in R.join_anti(people, other, "id").collect()} == {2, 4, 5}
    inner = R.join_inner(people, other, "id", broadcast_right=True)
    assert inner.count() == 2


def test_dynamic_query_builder_parity(people, spark):
    # builder composes select + join(same-named key) + where + order + page
    dim = spark.createDataFrame([("US", "NA"), ("FR", "EU"), ("DE", "EU")], "country string, region string")
    out = (
        DynamicQueryBuilder(spark)
        .build_select(people, ["id", "name", "region"])
        .build_inner_join(dim, "country", broadcast=True)
        .condition(F.col("score") > 15)
        .build_order("id", "DESC")
        .build_pagination(page_no=1, page_size=2)
        .get_query()
        .collect()
    )
    assert [(r.id, r.region) for r in out] == [(5, "EU"), (4, "EU")]


def test_pagination_requires_order(people, spark):
    with pytest.raises(ValueError):
        DynamicQueryBuilder(spark).build_select(people, ["id"]).build_pagination(1, 10).get_query()


def test_filter_conjunctive_empty(people):
    assert R.filter_conjunctive(people, []).count() == 5


def test_keyset_pagination_chains_like_offset(spark):
    """Walking pages via keyset (threading the last key) visits exactly the
    same rows in the same order as OFFSET pagination over a unique order."""
    from pyspark.sql import functions as F

    from tdei_extract_load_service_spark.operators.relational import (
        paginate,
        paginate_keyset,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    offset_rows = []
    for page in (1, 2, 3):
        offset_rows += [
            r.o_orderkey
            for r in paginate(orders, [F.col("o_orderkey").asc()], page_no=page, page_size=7).collect()
        ]
    keyset_rows, last = [], None
    for _ in range(3):
        batch = [r.o_orderkey for r in paginate_keyset(orders, F.col("o_orderkey"), after=last, page_size=7).collect()]
        keyset_rows += batch
        last = batch[-1]
    assert keyset_rows == offset_rows
