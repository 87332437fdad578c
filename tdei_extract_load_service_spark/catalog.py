"""Query catalog — the driver-contract surface.

Every implemented operator from SURVEY.md §2.4 is registered here as
``name -> (spark_query, oracle_sql | None)``. ``__spark_entry__.py`` exposes
this registry through ``queries()`` / ``oracle_sql()``; the driver runs both
sides at sf0.01 and hash-compares.

Determinism rules applied throughout (SURVEY.md §7 risks):
- every computed/aggregate column is aliased identically on both sides;
- float aggregates are ``ROUND(x, 2)`` (or 6 for unit-scale values) on both
  sides so accumulation-order noise can't flip the value hash;
- any LIMIT/OFFSET is paired with a total order including a unique tiebreak;
- timestamps returned to the driver are rendered as ISO strings on both
  sides (sessions pin ``spark.sql.session.timeZone=UTC``).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.functions import maps as M
from tdei_extract_load_service_spark.functions import timestamps as TS
from tdei_extract_load_service_spark.operators import relational as R
from tdei_extract_load_service_spark.operators.query_builder import DynamicQueryBuilder

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    query: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = CatalogEntry(query=fn, oracle=oracle)
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects
    (PARQUET_TYPE_ILLEGAL). Read nanos as int64 and rebuild a (truncating)
    microsecond timestamp — the same floor DuckDB applies when formatting
    sub-micro precision away."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _read(spark, sf_dir, "events")
    # integer DIV: ns values (~1.7e18) overflow double's exact range, so no
    # float division on the way to microseconds
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


# ---------------------------------------------------------------------------
# Relational surface (SURVEY.md §2.2 — DynamicQueryObject parity)
# ---------------------------------------------------------------------------


@register(
    "scan",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan (O3/O6 analogue): the source operator every plan starts
    from; column pruning reaches ReadSchema."""
    return _read(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@register(
    "project",
    "SELECT p_partkey, p_name, p_retailprice FROM part",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """buildSelect parity (dynamic-query-object.ts:30-32)."""
    return R.project(_read(spark, sf_dir, "part"), ["p_partkey", "p_name", "p_retailprice"])


@register(
    "filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05 AND l_returnflag = 'R'
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive WHERE parity (dynamic-query-object.ts:18-28,38-41); all
    three conjuncts reach PushedFilters on the parquet scan."""
    li = _read(spark, sf_dir, "lineitem")
    return R.project(
        R.filter_conjunctive(
            li,
            [F.col("l_quantity") > 30, F.col("l_discount") < 0.05, F.col("l_returnflag") == "R"],
        ),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    )


@register(
    "route_case",
    """
    SELECT kind, COUNT(*) AS n_parts
    FROM (
      SELECT CASE
        WHEN p_type LIKE '%ECONOMY%' THEN 'economy'
        WHEN p_type LIKE '%STANDARD%' THEN 'standard'
        WHEN p_type LIKE '%LARGE%' THEN 'large'
        WHEN p_type LIKE '%MEDIUM%' THEN 'medium'
        WHEN p_type LIKE '%SMALL%' THEN 'small'
        ELSE 'extension' END AS kind
      FROM part
    ) GROUP BY kind
    """,
)
def q_route_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins substring router (extract-load-service.ts:74-82)
    over p_type, then a per-kind count (the shape of the per-kind fan-out)."""
    routed = R.route_case(
        _read(spark, sf_dir, "part"),
        "p_type",
        routes=[
            ("ECONOMY", "economy"),
            ("STANDARD", "standard"),
            ("LARGE", "large"),
            ("MEDIUM", "medium"),
            ("SMALL", "small"),
        ],
        default="extension",
        output_col="kind",
    )
    return R.agg_group(routed, ["kind"], [F.count("*").alias("n_parts")])


@register(
    "join_inner",
    """
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """buildInnerJoin parity (dynamic-query-object.ts:34-36); both dimension
    sides broadcast so the fact side never shuffles."""
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")
    joined = R.join_inner(
        customer, nation, on=customer.c_nationkey == nation.n_nationkey, broadcast_right=True
    )
    joined = R.join_inner(joined, region, on=joined.n_regionkey == region.r_regionkey, broadcast_right=True)
    return joined.select("c_custkey", "c_name", "n_name", "r_name")


@register(
    "join_semi",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semantics (left_semi) — the reload membership shape of
    delete-by-key (extract-load-service.ts:290-295)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    out = R.join_semi(orders, li, on=orders.o_orderkey == li.l_orderkey)
    return out.select("o_orderkey", "o_totalprice")


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS semantics (left_anti): customers with no high-value order
    (threshold keeps the result set non-trivial at every SF)."""
    customer = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    out = R.join_anti(customer, orders, on=customer.c_custkey == orders.o_custkey)
    return out.select("c_custkey", "c_name")


@register(
    "agg_group",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                          AS avg_qty,
           COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: TPC-H-Q1-shaped grouped aggregation — the engine-internal
    form of the stats stored procedure (extract-load-service.ts:329-336).
    Partial aggregation map-side; the shuffle carries 4 groups x partials."""
    li = _read(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return R.agg_group(
        li.where(F.col("l_shipdate") <= TS.utc_literal("1998-09-02 00:00:00")),
        ["l_returnflag", "l_linestatus"],
        [
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count("*").alias("count_order"),
        ],
    )


@register(
    "agg_stats",
    """
    SELECT event_type,
           COUNT(*)                                   AS n_events,
           ROUND(SUM(value), 2)                       AS total_value,
           COUNT(DISTINCT user_id)                    AS n_users,
           strftime(MIN(ts), '%Y-%m-%dT%H:%M:%S')     AS first_ts,
           strftime(MAX(ts), '%Y-%m-%dT%H:%M:%S')     AS last_ts
    FROM events GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-statistics recompute (O19, the tdei_update_osw_stats
    analogue): per-kind counts/sums/distincts/extents."""
    ev = _read_events(spark, sf_dir)
    return R.agg_group(
        ev,
        ["event_type"],
        [
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
            TS.normalize_ts(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("first_ts"),
            TS.normalize_ts(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("last_ts"),
        ],
    )


@register(
    "sort",
    "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_acctbal DESC, s_suppkey",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """buildOrder parity (dynamic-query-object.ts:42-44); range-partitioned
    distributed sort, unique tiebreak for determinism."""
    sup = _read(spark, sf_dir, "supplier")
    return R.sort(
        sup.select("s_suppkey", "s_name", "s_acctbal"),
        [F.col("s_acctbal").desc(), F.col("s_suppkey").asc()],
    )


@register(
    "paginate",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20
    """,
)
def q_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """buildPagination parity (dynamic-query-object.ts:45-58): page 3,
    size 10, over a unique total order."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return R.paginate(orders, [F.col("o_orderkey").asc()], page_no=3, page_size=10)


@register(
    "top_k",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k -> TakeOrderedAndProject (per-partition heaps)."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return R.top_k(orders, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=10)


@register(
    "dynamic_query",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'
    ORDER BY c_custkey LIMIT 20 OFFSET 20
    """,
)
def q_dynamic_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end DynamicQueryObject program (dynamic-query-object.ts:60-62):
    select ⊕ where ⊕ order ⊕ pagination composed through the builder."""
    customer = _read(spark, sf_dir, "customer")
    return (
        DynamicQueryBuilder(spark)
        .build_select(customer, ["c_custkey", "c_name", "c_acctbal"])
        .condition(F.col("c_acctbal") > 1000)
        .condition(F.col("c_mktsegment") == "BUILDING")
        .build_order("c_custkey", "ASC")
        .build_pagination(page_no=2, page_size=20)
        .get_query()
    )


# ---------------------------------------------------------------------------
# Document / ETL operators (SURVEY.md §2.4, reference O7-O11, O24)
# ---------------------------------------------------------------------------


@register(
    "explode_unnest",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """features-array explode (O8, extract-load-service.ts:219-224) in its
    general form: unnest + count. Narrow transform; only the count shuffles."""
    docs = _read(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).where(F.col("word") != "")
    return R.agg_group(words, ["word"], [F.count("*").alias("n")])


@register(
    "header_project",
    """
    SELECT event_id, COALESCE(json_extract_string(props, '$.k'), '') AS k
    FROM events
    """,
)
def q_header_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-key header capture minus excluded keys with null->'' coercion
    (O7/O15, extract-load-service.ts:139-178,496-502) over the events.props
    JSON column."""
    ev = _read_events(spark, sf_dir)
    header = M.header_map_from_json("props", exclude=("features", "type"))
    return ev.select(
        "event_id", F.coalesce(F.element_at(header, "k"), F.lit("")).alias("k")
    )


@register(
    "agg_prefix_count",
    """
    SELECT event_type,
           CAST(SUM(len(list_filter(json_keys(props), x -> x LIKE 'k%'))) AS BIGINT) AS n_prefixed
    FROM events GROUP BY event_type
    """,
)
def q_agg_prefix_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-key prefix count (countExistingElevationProperties,
    extract-load-service.ts:543-549) summed per group."""
    ev = _read_events(spark, sf_dir)
    n = M.count_keys_with_prefix("props", "k", is_json=True)
    return R.agg_group(
        ev.select("event_type", n.alias("n")),
        ["event_type"],
        [F.sum("n").cast("bigint").alias("n_prefixed")],
    )


@register(
    "strip_z",
    """
    SELECT vec_id,
           list_transform(embedding[1:2], x -> round(CAST(x AS DOUBLE), 6)) AS xy
    FROM embeddings
    """,
)
def q_strip_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaf truncation to [x, y] (O10, stripZCoordinate
    extract-load-service.ts:556-569) — array-semantics twin over the
    embeddings fixture; GeoJSON-shaped coverage lives in tests/ (A4 matrix)."""
    from tdei_extract_load_service_spark.functions.geometry import strip_z

    emb = _read(spark, sf_dir, "embeddings")
    xy = F.transform(strip_z("embedding", depth=1), lambda x: F.round(x.cast("double"), 6))
    return emb.select("vec_id", xy.alias("xy"))


@register(
    "extract_elevation",
    """
    SELECT vec_id,
           CASE WHEN embedding[3] IS NOT NULL AND embedding[3] <> 0
                THEN round(CAST(embedding[3] AS DOUBLE), 6) END AS elevation
    FROM embeddings
    """,
)
def q_extract_elevation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-Z extraction with the zero-means-missing rule (O11,
    extract-load-service.ts:629) — array-semantics twin over embeddings."""
    emb = _read(spark, sf_dir, "embeddings")
    z = F.element_at(F.col("embedding"), 3).cast("double")
    elevation = F.when(z.isNotNull() & (z != 0), F.round(z, 6))
    return emb.select("vec_id", elevation.alias("elevation"))


@register(
    "normalize_ts",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso_utc
    FROM events
    """,
)
def q_normalize_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 UTC normalization (O24, tdei-date.ts:3-6)."""
    ev = _read_events(spark, sf_dir)
    return ev.select("event_id", TS.normalize_ts("ts").alias("iso_utc"))
