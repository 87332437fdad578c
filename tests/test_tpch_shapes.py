"""Semantic unit tests for the TPC-H plan shapes in plans/tpch.py.

The catalog-level oracle parity test already proves each entry equals its
DuckDB twin on the fixtures; these tests pin the SEMANTICS on tiny
hand-built frames where the expected answer is computed by hand — the
cases the fixtures may not exercise (zero-order customers in Q13, the
exact HAVING boundary in Q18, the scalar-average threshold and the
anti-join in Q22).
"""

from __future__ import annotations

from tdei_extract_load_service_spark.plans.tpch import (
    q13_customer_distribution,
    q18_large_volume_customer,
    q22_global_sales_opportunity,
)


def _customers(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double"
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )


def test_q13_counts_zero_order_customers(spark):
    import datetime as dt

    d = dt.datetime(1996, 1, 1)
    cust = _customers(
        spark,
        [(1, "a", 0, 0.0), (2, "b", 0, 0.0), (3, "c", 0, 0.0), (4, "d", 0, 0.0)],
    )
    # cust 1 -> two kept orders; cust 2 -> one kept + one URGENT (filtered);
    # cust 3 -> only an URGENT order (drops to zero); cust 4 -> no orders
    orders = _orders(
        spark,
        [
            (10, 1, 1.0, d, "5-LOW"),
            (11, 1, 1.0, d, "5-LOW"),
            (12, 2, 1.0, d, "5-LOW"),
            (13, 2, 1.0, d, "1-URGENT"),
            (14, 3, 1.0, d, "1-URGENT"),
        ],
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in q13_customer_distribution(cust, orders).collect()
    }
    # counts: cust1=2, cust2=1, cust3=0, cust4=0
    assert got == {2: 1, 1: 1, 0: 2}


def test_q18_having_boundary_is_strict(spark):
    import datetime as dt

    d = dt.datetime(1996, 1, 1)
    cust = _customers(spark, [(1, "a", 0, 0.0), (2, "b", 0, 0.0)])
    orders = _orders(
        spark, [(10, 1, 500.0, d, "5-LOW"), (11, 2, 900.0, d, "5-LOW")]
    )
    li = spark.createDataFrame(
        [(10, 100.0), (10, 200.0), (11, 150.0), (11, 150.0)],
        "l_orderkey long, l_quantity double",
    )
    out = q18_large_volume_customer(cust, orders, li, threshold=300.0).collect()
    # order 10 sums to exactly 300 -> excluded (strict >); order 11 sums 300
    # as well -> also excluded
    assert out == []
    out2 = q18_large_volume_customer(cust, orders, li, threshold=299.0).collect()
    assert {r["o_orderkey"] for r in out2} == {10, 11}
    # ordered by o_totalprice desc
    assert [r["o_orderkey"] for r in out2] == [11, 10]
    assert all(r["sum_qty"] == 300.0 for r in out2)


def test_q22_scalar_threshold_and_anti_join(spark):
    import datetime as dt

    d = dt.datetime(1996, 1, 1)
    cust = _customers(
        spark,
        [
            # nation 1 (selected): balances 100, 300 -> avg of positives = 200
            (1, "a", 1, 100.0),
            (2, "b", 1, 300.0),
            # negative balance joins the rollup pool but not the average
            (3, "c", 1, -50.0),
            # nation 2 (not selected): huge balance must not skew the average
            (4, "d", 2, 10_000.0),
            # nation 3 (selected): above average but has an URGENT order
            (5, "e", 3, 900.0),
            # nation 3: above average, no urgent order -> kept
            (6, "f", 3, 400.0),
        ],
    )
    orders = _orders(spark, [(10, 5, 1.0, d, "1-URGENT"), (11, 2, 1.0, d, "5-LOW")])
    rows = {
        r["c_nationkey"]: (r["numcust"], r["totacctbal"])
        for r in q22_global_sales_opportunity(cust, orders, nations=(1, 3)).collect()
    }
    # avg over positive balances in nations (1,3) = (100+300+900+400)/4 = 425
    # above 425: cust 5 (900, urgent -> dropped) only -> nation 3 empty...
    # wait: 900 > 425 kept-then-anti-dropped; 400 < 425 filtered out.
    # Expected: no rows at all.
    assert rows == {}
    # Lower the pool: restrict to nation 1 -> avg = (100+300)/2 = 200;
    # cust 2 (300) is above and has no URGENT order -> one row.
    rows1 = {
        r["c_nationkey"]: (r["numcust"], r["totacctbal"])
        for r in q22_global_sales_opportunity(cust, orders, nations=(1,)).collect()
    }
    assert rows1 == {1: (1, 300.0)}


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )


def test_q15_preserves_argmax_ties(spark):
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import q15_top_supplier

    d = dt.datetime(1996, 2, 1)
    li = _lineitem(
        spark,
        [
            # suppliers 1 and 2 tie at 200.0 revenue; supplier 3 lower
            (1, 1, 1, 1.0, 200.0, 0.0, d),
            (2, 1, 2, 1.0, 100.0, 0.0, d),
            (3, 1, 2, 1.0, 100.0, 0.0, d),
            (4, 1, 3, 1.0, 50.0, 0.0, d),
            # outside the date window: must not count
            (5, 1, 3, 1.0, 999.0, 0.0, dt.datetime(1995, 1, 1)),
        ],
    )
    sup = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    out = q15_top_supplier(li, sup).collect()
    assert [(r["s_suppkey"], r["total_revenue"]) for r in out] == [
        (1, 200.0),
        (2, 200.0),
    ]


def test_q17_threshold_is_per_part(spark):
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q17_small_quantity_revenue,
    )

    d = dt.datetime(1996, 1, 1)
    # part 1: quantities 10, 10, 100 -> avg 40, threshold 8 -> none below
    # part 2: quantities 1, 99 -> avg 50, threshold 10 -> the qty-1 line counts
    li = _lineitem(
        spark,
        [
            (1, 1, 1, 10.0, 70.0, 0.0, d),
            (2, 1, 1, 10.0, 70.0, 0.0, d),
            (3, 1, 1, 100.0, 70.0, 0.0, d),
            (4, 2, 1, 1.0, 700.0, 0.0, d),
            (5, 2, 1, 99.0, 70.0, 0.0, d),
        ],
    )
    part = spark.createDataFrame(
        [(1, "p1", "Brand#1", "STANDARD", 1, 1.0), (2, "p2", "Brand#1", "STANDARD", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    row = q17_small_quantity_revenue(li, part, brand="Brand#1").collect()[0]
    assert row["avg_yearly"] == round(700.0 / 7.0, 2)


def test_q7_cross_pairs_only_and_year_split(spark):
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import q7_volume_shipping

    li = _lineitem(
        spark,
        [
            # order 1: supplier in NATION_1, customer in NATION_2 (kept),
            # lines in two different years
            (1, 1, 1, 1.0, 100.0, 0.0, dt.datetime(1995, 6, 1)),
            (1, 1, 1, 1.0, 50.0, 0.0, dt.datetime(1996, 6, 1)),
            # order 2: supplier and customer both NATION_1 (dropped)
            (2, 1, 2, 1.0, 999.0, 0.0, dt.datetime(1995, 6, 1)),
        ],
    )
    orders = spark.createDataFrame(
        [(1, 10, 1.0, dt.datetime(1995, 1, 1), "5-LOW"), (2, 11, 1.0, dt.datetime(1995, 1, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(10, "c10", 2, 0.0), (11, "c11", 1, 0.0)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double",
    )
    sup = spark.createDataFrame(
        [(1, "s1", 1, 0.0), (2, "s2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in q7_volume_shipping(li, orders, cust, sup, nation).collect()
    }
    assert got == {
        ("NATION_1", "NATION_2", "1995"): 100.0,
        ("NATION_1", "NATION_2", "1996"): 50.0,
    }


def _lineitem21(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_returnflag string"
    )


def test_q21_only_sole_flagged_supplier_waits(spark):
    """Pin the EXISTS/NOT-EXISTS semantics: a supplier counts only when
    it is flagged, the order has ANOTHER supplier, and NO other supplier
    on that order is flagged."""
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q21_suppliers_kept_waiting,
    )

    d = dt.datetime(1996, 1, 1)
    li = _lineitem21(
        spark,
        [
            # order 1: supp 1 flagged, supp 2 clean -> supp 1 counts
            (1, 1, "R"), (1, 2, "N"),
            # order 2: both flagged -> NOT EXISTS kills both
            (2, 1, "R"), (2, 2, "R"),
            # order 3: single-supplier order -> EXISTS kills it
            (3, 1, "R"),
            # order 4: open status (not 'F') -> excluded downstream
            (4, 1, "R"), (4, 2, "N"),
            # order 5: supp 2 flagged alone among three -> supp 2 counts
            (5, 2, "R"), (5, 1, "N"), (5, 3, "N"),
        ],
    )
    orders = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "O"), (5, "F")],
        "o_orderkey long, o_orderstatus string",
    )
    supplier = spark.createDataFrame(
        [(1, "supp1", 0), (2, "supp2", 0), (3, "supp3", 1)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_1"), (1, "NATION_2")], "n_nationkey int, n_name string"
    )
    got = {
        r["s_name"]: r["numwait"]
        for r in q21_suppliers_kept_waiting(li, orders, supplier, nation).collect()
    }
    assert got == {"supp1": 1, "supp2": 1}


def test_q20_dominant_share_threshold_strict(spark):
    """Pin the nested-aggregate threshold: strictly-greater on the
    share, window totals per part, prefix name filter, nation filter."""
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q20_potential_part_promotion,
    )

    d = dt.datetime(1995, 6, 1)
    li = spark.createDataFrame(
        [
            # part 1: supp1 ships 70, supp2 ships 30 -> supp1 dominant (>30%)
            (1, 1, 1, 70.0, d), (2, 1, 2, 30.0, d),
            # part 2: 50/50 -> both dominant at share=0.3
            (3, 2, 3, 50.0, d), (4, 2, 4, 50.0, d),
            # part 3 (name excluded): supp5 alone -> filtered by prefix
            (5, 3, 5, 100.0, d),
            # part 1 shipment outside the window -> ignored
            (6, 1, 6, 500.0, dt.datetime(1994, 1, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "small ring"), (2, "small bolt"), (3, "red widget")],
        "p_partkey long, p_name string",
    )
    supplier = spark.createDataFrame(
        [(i, f"supp{i}", 0 if i < 5 else 1) for i in range(1, 7)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_1"), (1, "NATION_2")], "n_nationkey int, n_name string"
    )
    got = [
        r["s_name"]
        for r in q20_potential_part_promotion(li, part, supplier, nation).collect()
    ]
    # supp2's 30% is NOT > 30%; supp5 is out-of-prefix, supp6 out-of-window
    assert got == ["supp1", "supp3", "supp4"]


def test_q2_min_cost_ties_preserved_and_region_scoped(spark):
    """Pin the decorrelated scalar-min semantics: per-part minimum over
    REGION-scoped suppliers only, ties keep every argmin supplier."""
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q2_minimum_cost_supplier,
    )

    li = spark.createDataFrame(
        [
            # part 1: supp1 unit 2.0, supp2 unit 2.0 (tie), supp3 unit 1.0
            # but supp3 is OUT of region -> min over {supp1, supp2} = 2.0
            (1, 1, 1, 10.0, 20.0), (2, 1, 2, 5.0, 10.0), (3, 1, 3, 10.0, 10.0),
            # part 2: supp1 cheapest in region
            (4, 2, 1, 10.0, 30.0), (5, 2, 2, 10.0, 40.0),
            # part 3: size-filtered out
            (6, 3, 1, 1.0, 1.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "t1", 10), (2, "t2", 20), (3, "t3", 99)],
        "p_partkey long, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(1, "supp1", 0, 100.0), (2, "supp2", 0, 200.0), (3, "supp3", 1, 300.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_1", 0), (1, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    rows = q2_minimum_cost_supplier(
        li, part, supplier, nation, region, size_max=25
    ).collect()
    got = [(r["p_partkey"], r["s_name"], r["supply_cost"]) for r in rows]
    # ordering: s_acctbal DESC -> supp2 (200) before supp1 (100)
    assert got == [(1, "supp2", 2.0), (1, "supp1", 2.0), (2, "supp1", 3.0)]


def test_q8_share_is_conditional_ratio_per_year(spark):
    """Pin Q8: share = nation's volume / region-market volume per year;
    out-of-region customers and out-of-type parts never count."""
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q8_national_market_share,
    )

    li = spark.createDataFrame(
        [
            # 1995: order 1 (in-region) supp1(N1) 100, supp2(N2) 300
            (1, 1, 1, 100.0, 0.0), (1, 1, 2, 300.0, 0.0),
            # 1996: order 2 (in-region) supp1 50; order 3 OUT-of-region supp1 999
            (2, 1, 1, 50.0, 0.0), (3, 1, 1, 999.0, 0.0),
            # wrong part type on an in-region order -> excluded
            (2, 2, 2, 777.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [
            (1, 10, dt.datetime(1995, 6, 1)),
            (2, 10, dt.datetime(1996, 6, 1)),
            (3, 20, dt.datetime(1996, 6, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(10, 0), (20, 1)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int"
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "OTHER")], "p_partkey long, p_type string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_1", 0), (1, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(0, "AMERICA"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    got = {
        r["o_year"]: r["mkt_share"]
        for r in q8_national_market_share(
            li, orders, customer, supplier, part, nation, region
        ).collect()
    }
    assert got == {"1995": 0.25, "1996": 1.0}


def test_q11_threshold_is_avg_multiple_and_nation_scoped(spark):
    """Pin Q11: the cutoff is avg_multiple x the nation's AVERAGE
    per-part value; other nations' lines never contribute."""
    from tdei_extract_load_service_spark.plans.tpch import q11_important_stock

    li = spark.createDataFrame(
        [
            # nation-1 supplier 1: part 1 -> 900, parts 2..4 -> 100 each
            (1, 1, 1, 900.0, 0.0),
            (2, 2, 1, 100.0, 0.0), (3, 3, 1, 100.0, 0.0), (4, 4, 1, 100.0, 0.0),
            # out-of-nation supplier 2 pumps part 2 -> must be ignored
            (5, 2, 2, 5000.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_1"), (1, "NATION_2")], "n_nationkey int, n_name string"
    )
    rows = q11_important_stock(li, supplier, nation, avg_multiple=2.5).collect()
    # avg = 1200/4 = 300; cutoff 750 -> only part 1 (900)
    assert [(r["p_partkey"], r["part_value"]) for r in rows] == [(1, 900.0)]


def test_q16_anti_join_excludes_flagged_suppliers(spark):
    """Pin Q16: a supplier with an R line in the exclusion window is
    dropped from EVERY bucket; counts are distinct suppliers."""
    import datetime as dt

    from tdei_extract_load_service_spark.plans.tpch import (
        q16_parts_supplier_relationship,
    )

    in_w = dt.datetime(1995, 1, 3)
    out_w = dt.datetime(1995, 3, 1)
    li = spark.createDataFrame(
        [
            # supp 1 flagged in-window -> excluded everywhere
            (1, 1, 1, "R", in_w),
            (2, 1, 1, "N", out_w),
            # supp 2 R but OUT of window -> kept
            (3, 1, 2, "R", out_w),
            (4, 2, 2, "N", out_w),
            # supp 3 clean; ships part 1 twice -> still counted once
            (5, 1, 3, "N", out_w), (6, 1, 3, "N", out_w),
            # part 3 has the excluded brand
            (7, 3, 2, "N", out_w),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "Brand#2", 4), (2, "Brand#3", 7), (3, "Brand#1", 4)],
        "p_partkey long, p_brand string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(1,), (2,), (3,)], "s_suppkey long"
    )
    got = {
        (r["p_brand"], r["p_size"]): r["supplier_cnt"]
        for r in q16_parts_supplier_relationship(li, part, supplier).collect()
    }
    assert got == {("Brand#2", 4): 2, ("Brand#3", 7): 1}
