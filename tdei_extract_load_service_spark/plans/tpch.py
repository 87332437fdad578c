"""TPC-H query shapes as reusable DataFrame plan builders.

Each function takes the raw fixture frames (read through
``catalog._read`` so timestamp vintages are already normalized) and
returns the declarative plan; the catalog entries are thin wrappers
pairing each with its DuckDB oracle. The four shapes cover the classic
warehouse plan families the engine must keep healthy at 100 TB:

- Q1: wide scan-agg — map-side partial aggregation carries the load;
  the shuffle moves <10 group rows per task regardless of fact size.
- Q3: selective dim filter -> fact join -> agg -> top-k — the filtered
  dimension broadcasts, the fact never shuffles for the join.
- Q5: six-way join — region prunes through nation/supplier before the
  facts; every dimension side broadcasts.
- Q6: pure predicate pushdown — all four conjuncts must reach the scan
  (row-group statistics skipping decides everything at scale).

Cross-engine exactness discipline (the oracle-parity recipes): SUMs go
through DECIMAL(18,6) (order-independent, exact), averages are ONE
explicit double division (never the engine's avg()), timestamps go
through ``functions.timestamps`` so session timezone never leaks in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.functions import timestamps as TS
from tdei_extract_load_service_spark.session import spread


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1: eight aggregates per (returnflag, linestatus) in one
    pass over the biggest table. The shipdate predicate reaches
    PushedFilters; the fixture scan is ``spread`` so the DECIMAL partial
    phase uses every core (measured 1.42s -> 0.85s steady at sf0.1)."""
    li = lineitem.where(
        F.col("l_shipdate") <= TS.utc_literal("1998-09-02 00:00:00")
    )
    li = spread(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )

    def dsum(c: Column) -> Column:
        return F.sum(c.cast("decimal(18,6)"))

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).cast("double").alias("sum_qty"),
        dsum(F.col("l_extendedprice")).cast("double").alias("sum_base_price"),
        dsum(disc).cast("double").alias("sum_disc_price"),
        dsum(charge).cast("double").alias("sum_charge"),
        F.round(dsum(F.col("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
        F.round(dsum(F.col("l_extendedprice")).cast("double") / F.count("*"), 6).alias("avg_price"),
        F.round(dsum(F.col("l_discount")).cast("double") / F.count("*"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q3: customer (filtered) broadcasts; lineitem never shuffles
    for the join; both date predicates push into the fact scans."""
    cust = customer.where(F.col("c_mktsegment") == "BUILDING")
    ords = orders.where(
        F.col("o_orderdate") < TS.utc_literal("1995-03-15 00:00:00")
    )
    li = lineitem.where(
        F.col("l_shipdate") > TS.utc_literal("1995-03-15 00:00:00")
    )
    joined = (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            TS.normalize_ts(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5: the region filter prunes through nation -> supplier
    before touching the facts; only orders-lineitem shuffles."""
    reg = region.where(F.col("r_name") == "ASIA")
    nr = nation.join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
    sup = supplier.join(F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey)
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(sup),
            (lineitem.l_suppkey == sup.s_suppkey)
            & (customer.c_nationkey == sup.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape (adapted to the fixture columns: the stock EXISTS
    predicate compares l_commitdate/l_receiptdate, which the fixtures
    lack; ours keeps the identical plan skeleton — date-windowed orders,
    an EXISTS-decorrelated semi join against lineitem with an extra
    non-equi conjunct, priority rollup): orders placed in Q1-1996 where
    some line shipped more than 90 days after the order date. The
    optimizer must produce a LeftSemi join (one probe per order, no
    fan-out duplication) with the date window pushed to the orders scan.

    Cross-engine note: day arithmetic uses datediff (Spark) vs
    date_diff('day', ...) (DuckDB) — both count calendar-day boundaries,
    and on UTC-midnight fixture timestamps the session-timezone date
    casts shift BOTH operands identically, so the difference is
    tz-stable (probed under America/Los_Angeles)."""
    o = orders.where(
        (F.col("o_orderdate") >= TS.utc_literal("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < TS.utc_literal("1996-04-01 00:00:00"))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (F.datediff(li.l_shipdate, o.o_orderdate) > 90),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q14_promo_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: fact-dimension broadcast join + conditional
    revenue ratio in ONE aggregation — the part side broadcasts (no fact
    shuffle), both CASE branches ride the same map-side-combined pass,
    and the single-row ratio is one double division over DECIMAL-exact
    sums (never a second query)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= TS.utc_literal("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < TS.utc_literal("1996-07-01 00:00:00"))
    )
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == part.p_partkey,
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
    total = F.sum(disc)
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
        ).alias("promo_revenue")
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape (adapted to the fixture columns: the stock
    anti-predicate is on o_comment, which the fixtures lack; ours filters
    ``o_orderpriority <> '1-URGENT'`` — the plan skeleton is identical):
    orders-per-customer distribution including zero-order customers.

    The textbook formulation is a LEFT OUTER join customer->orders
    followed by two aggregations; at 100 TB that outer join fans every
    order row through a shuffle keyed on custkey.  The engine instead
    AGGREGATES BEFORE JOINING: orders collapse to (o_custkey, c_count)
    with map-side partial counts first — the join input shrinks from
    |orders| rows to |customers-with-orders| rows — then a left join
    fills the zero-count customers via coalesce.  Both shapes are
    value-identical (COUNT(o_orderkey) over the outer join counts only
    matched rows, exactly the pre-aggregated count); the second
    aggregation groups on c_count (tiny domain) and is all map-side."""
    o = orders.where(F.col("o_orderpriority") != "1-URGENT").select("o_custkey")
    ocnt = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    per_cust = customer.select("c_custkey").join(
        ocnt, customer.c_custkey == ocnt.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q18_large_volume_customer(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: float = 300.0,
) -> DataFrame:
    """TPC-H Q18 shape: GROUP-HAVING over the biggest table, then rejoin
    the survivors to the dimension tables.  The quantity rollup is
    map-side combined and DECIMAL-exact; the HAVING filter collapses it
    to a handful of hot orders.  The survivor set's cardinality is
    data-dependent (how many orders clear the HAVING bar scales with
    fact volume), so neither rejoin carries an explicit broadcast hint
    — per the repo rule ("no unconditional F.broadcast of
    data-dependent aggregates") AQE broadcasts when the runtime size is
    small and degrades to a spillable shuffle join when it is not
    (ADVICE r7).  Top-100 is TakeOrderedAndProject (no global sort)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty")
        )
        .where(F.col("sum_qty") > threshold)
    )
    big_orders = orders.join(
        big, orders.o_orderkey == big.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
    out = customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey
    )
    return (
        out.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            TS.normalize_ts(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, nations: tuple[int, ...] = (1, 3, 5, 7, 9)
) -> DataFrame:
    """TPC-H Q22 shape (adapted to the fixture columns: the stock query
    selects on phone country codes and anti-joins customers with NO
    orders — the fixtures have no c_phone and every customer has orders,
    so ours selects on a nation set and anti-joins customers with no
    URGENT order; skeleton identical): a global scalar aggregate feeds a
    per-row predicate, then an anti join, then a rollup.

    Scale shape: the scalar average is ONE map-side-combined pass
    collapsed to a single row that cross-join-broadcasts into the
    filter (BroadcastNestedLoopJoin over exactly one row — no shuffle);
    the anti join shuffles only (custkey) pairs and AQE may broadcast
    the filtered side.  The average is a DECIMAL-exact sum with one
    explicit double division, per the cross-engine parity recipes."""
    cust = customer.where(F.col("c_nationkey").isin(*nations)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    lost = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return (
        lost.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy(F.col("c_nationkey").asc())
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: four conjunctive predicates, all reaching PushedFilters,
    then one global DECIMAL-exact sum — no join, no second pass."""
    li = lineitem.where(
        (F.col("l_shipdate") >= TS.utc_literal("1994-01-01 00:00:00"))
        & (F.col("l_shipdate") < TS.utc_literal("1995-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue")
    )


def _dsum(c: Column) -> Column:
    """DECIMAL-exact sum rendered back to double (order-independent,
    the cross-engine parity recipe for float fact columns)."""
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def q7_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension table in TWO roles — nation
    joined once through supplier (supp_nation) and once through
    customer (cust_nation), keeping only cross pairs — grouped by the
    two roles and the shipment year.

    Scale shape: both nation-filtered dimension chains broadcast
    (supplier x 2 nations is tiny; customer stays un-hinted so a
    large customer side can fall back to a shuffle); the only
    fact-fact shuffle is lineitem-orders. The year is extracted from
    the UTC-normalized rendering (normalize_ts) so the grouping is
    session-timezone independent — ``year(ts)`` would follow the
    session zone."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b))
    sup = supplier.join(
        F.broadcast(
            nat.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(
            nat.select(
                F.col("n_nationkey").alias("c_nk"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    j = (
        lineitem.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    l_year = F.substring(TS.normalize_ts(F.col("l_shipdate"), "yyyy-MM-dd"), 1, 4)
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            l_year.alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_v"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(_dsum(F.col("_v")), 2).alias("revenue"))
    )


def q12_priority_class_by_flag(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixtures have no l_shipmode, so the
    grouping key is l_returnflag; skeleton identical): date-windowed
    fact-fact equi join, then BOTH priority-class counts as conditional
    sums in ONE map-side-combined aggregation — never two passes."""
    li = lineitem.where(
        (F.col("l_shipdate") >= TS.utc_literal("1995-01-01 00:00:00"))
        & (F.col("l_shipdate") < TS.utc_literal("1996-01-01 00:00:00"))
    ).select("l_orderkey", "l_returnflag")
    j = li.join(
        orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: an aggregated revenue view, a scalar MAX over
    it, and the argmax row(s) selected by equality against the
    broadcast scalar — the ties-preserved argmax-by-join pattern (no
    window, no global sort). Equality compares ROUND(.,2) values that
    both engines compute identically from DECIMAL-exact sums.

    Scale shape: the per-supplier rollup is map-side combined; the MAX
    collapses to one row that cross-join-broadcasts; the supplier
    dimension joins against the (tiny) argmax set, so no fact row
    touches the second join."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= TS.utc_literal("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < TS.utc_literal("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("_max_rev")
    )
    return (
        supplier.join(F.broadcast(top), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("s_suppkey").asc())
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17 shape: a correlated scalar AVG subquery ("lines below
    20% of this part's average quantity") decorrelated into a per-part
    pre-aggregation joined back to the fact — the aggregate-join-back
    dual of Q18's HAVING.

    Scale shape: the brand filter broadcasts into the fact FIRST, so
    both the average pass and the probe pass read only the brand's
    lineitems; the per-part threshold set is left UN-hinted — its
    cardinality is data-dependent (grows with the brand's part count,
    ~|part|/25 in stock TPC-H, far past broadcast limits at 100 TB), so
    per the repo rule ("no unconditional F.broadcast of data-dependent
    aggregates") AQE picks the strategy: broadcast when the runtime
    stats are small, spillable shuffle join when they are not (ADVICE
    r7).  The threshold is one explicit double division off a
    DECIMAL-exact sum (both engines bit-identical), compared strictly."""
    pk = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (_dsum(F.col("l_quantity")) / F.count("*"))).alias("_t")
    ).withColumnRenamed("l_partkey", "_tk")
    small = li.join(
        thresholds, F.col("l_partkey") == F.col("_tk")
    ).where(F.col("l_quantity") < F.col("_t"))
    return small.agg(
        F.round(_dsum(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly")
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: a DISJUNCTION of brand/size/quantity conjunction
    branches mixing fact and dimension columns — the OR cannot push
    whole, so the plan must stay one broadcast dim join with the
    disjunctive residual filter evaluated inline (never a union of
    three scans, never a cartesian)."""
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5)) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10)) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15)) & q.between(20, 30))
    )
    return j.where(branch).agg(
        F.round(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10 shape: returned-item reporting — flag + date-window
    filtered fact, rolled up per customer, dimension-joined and
    top-20'd. The plan discipline: the RETURN flag and the date window
    both reach the fact scans, the per-customer rollup is map-side
    combined BEFORE the customer join (aggregate-before-join again —
    the textbook formulation joins first and aggregates the fan-out),
    nation broadcasts, and the top-20 is TakeOrderedAndProject."""
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_v"),
    )
    o = orders.where(
        (F.col("o_orderdate") >= TS.utc_literal("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < TS.utc_literal("1995-04-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(_dsum(F.col("_v")), 2).alias("revenue"))
    )
    out = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey
    ).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        out.select("c_custkey", "c_name", "n_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q21_suppliers_kept_waiting(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
) -> DataFrame:
    """TPC-H Q21 shape (adapted to the fixture columns: the stock "late"
    predicate is l_receiptdate > l_commitdate, which the fixtures lack;
    ours flags l_returnflag = 'R' — a pure lineitem predicate exactly
    like the stock one, so the skeleton is identical): per supplier in
    one nation, the number of finished multi-supplier orders where THIS
    supplier was the ONLY one flagged — one EXISTS (another supplier on
    the order) and one NOT EXISTS (another FLAGGED supplier on the
    order), both correlated self-joins of the biggest table.

    The decorrelation the plan must produce (the hardest shape in the
    TPC-H suite): EXISTS -> LeftSemi self-join on l_orderkey with the
    non-equi conjunct (suppkey <>) as a join-side residual, NOT EXISTS
    -> LeftAnti on the same key — one probe per flagged line, no
    fan-out duplication, never a cartesian.  Scale shape: both
    self-join edges shuffle on l_orderkey and stay SPILLABLE
    (sort-merge at real scale; AQE may broadcast at fixture scale);
    supplier/nation broadcast; the rollup is map-side combined;
    top-100 is TakeOrderedAndProject."""
    flagged = F.col("l_returnflag") == "R"
    l1 = lineitem.where(flagged).select("l_orderkey", "l_suppkey")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = lineitem.where(flagged).select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    fin = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    nat = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_name")
    out = waiting.join(
        fin, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        out.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def q20_potential_part_promotion(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "small",
    nation_name: str = "NATION_1",
    share: float = 0.3,
) -> DataFrame:
    """TPC-H Q20 shape (adapted: the stock query compares partsupp
    availqty against half the year's shipped volume; the fixtures have
    no partsupp, so ours flags (supplier, part) pairs that shipped MORE
    THAN ``share`` of the part's total 1995 volume — the same
    nested-aggregate threshold, derived from the same fact table):
    suppliers in one nation holding a dominant share of some
    name-filtered part.  Skeleton identical to stock: innermost
    correlated aggregate (per-part total) -> decorrelated join against
    the per-(supp, part) aggregate -> semi-join chain into supplier ->
    dimension filter.

    Scale shape: ONE pass over the date-windowed fact — the per-pair
    rollup is map-side combined, and the per-part total is a WINDOW sum
    over the rollup's output partitioned by l_partkey (the standard
    decorrelation of an "aggregate of my group" predicate).  The
    textbook aggregate-join-back form was measured to plan as TWO fact
    scans here (the per-pair subtree is consumed by both the total and
    the join, and Catalyst does not reuse it); the window form pays one
    keyed exchange of pair rows instead of a rescan of the fact — the
    strictly better trade at 100 TB.  The supplier probe is a LeftSemi
    (one probe per supplier); name/nation filters push to the dims."""
    from pyspark.sql import Window

    li = lineitem.where(
        (F.col("l_shipdate") >= TS.utc_literal("1995-01-01 00:00:00"))
        & (F.col("l_shipdate") < TS.utc_literal("1996-01-01 00:00:00"))
    ).join(
        F.broadcast(
            part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        _dsum(F.col("l_quantity")).alias("pair_qty")
    )
    part_qty = F.round(
        F.sum(F.col("pair_qty").cast("decimal(18,6)"))
        .over(Window.partitionBy("l_partkey"))
        .cast("double"),
        6,
    )
    dominant = per_pair.withColumn("part_qty", part_qty).where(
        F.col("pair_qty") > F.lit(share) * F.col("part_qty")
    )
    nat = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    return (
        supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .join(
            dominant,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy(F.col("s_name").asc())
    )


def q2_minimum_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    size_max: int = 25,
) -> DataFrame:
    """TPC-H Q2 shape (adapted: the stock correlated scalar-min runs
    over partsupp's ps_supplycost; the fixtures have no partsupp, so the
    (part, supplier) cost relation is derived from lineitem as the
    minimum observed unit price — the correlated-subquery skeleton is
    untouched): for each size-filtered part, the region's suppliers
    offering exactly the region-wide minimum cost, ordered by account
    balance.

    The decorrelation: the correlated ``cost = (SELECT MIN ... WHERE
    same part, supplier in region)`` becomes a per-part MIN *window*
    over the region-restricted cost relation, compared in place — ties
    preserved, the grouped dual of Q15's global argmax.  (The
    aggregate-join-back form was measured to plan as TWO fact scans —
    the cost subtree feeds both the min and the join and Catalyst does
    not reuse it; the window form is one fact pass plus one keyed
    exchange of the already-aggregated pairs.)  Cross-engine
    exactness: unit price is one IEEE division per row rounded to 6;
    MIN is order-independent (no summation), so the equality key is
    bit-identical on both engines.

    Scale shape: the cost relation aggregates map-side off one fact
    pass (the region/dimension filters broadcast INTO that pass, so
    out-of-region rows never reach the aggregate); the per-part min
    window shuffles pair rows, never fact rows; top-100 is
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    reg = region.where(F.col("r_name") == region_name)
    nat = nation.join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
    sup = supplier.join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    pk = part.where(F.col("p_size") <= size_max).select("p_partkey", "p_type")
    cost = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("_unit"),
        )
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("_unit").alias("supply_cost"))
    )
    min_cost = F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    best = cost.withColumn("_min_cost", min_cost).where(
        F.col("supply_cost") == F.col("_min_cost")
    )
    out = (
        best.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        out.select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            "supply_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


def q8_national_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part_type: str = "PROMO",
    supp_nation: str = "NATION_1",
    market_region: str = "AMERICA",
) -> DataFrame:
    """TPC-H Q8 shape: national market share — within one region's
    market for one part type, the yearly revenue fraction supplied by
    one nation.  A six-way join where nation plays TWO roles (the
    customer's region membership and the supplier's nationality) and
    the share is a conditional ratio per group.

    Scale shape: the part-type filter broadcasts into the fact FIRST
    (the most selective edge); the customer->nation->region chain
    broadcasts as one pruned dimension; the supplier dimension carries
    its nation name for the CASE; the only fact-fact shuffle is
    lineitem-orders.  BOTH the numerator and denominator ride ONE
    map-side-combined aggregation (conditional DECIMAL sums, one
    double division at the end — the Q14 recipe per group)."""
    pk = part.where(F.col("p_type") == part_type).select("p_partkey")
    reg = region.where(F.col("r_name") == market_region)
    cnat = nation.join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
    cust = customer.join(
        F.broadcast(cnat.select("n_nationkey")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    sup = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
            )
        ),
        supplier.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    j = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    o_year = F.substring(TS.normalize_ts(F.col("o_orderdate"), "yyyy-MM-dd"), 1, 4)
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    nat_vol = F.sum(
        F.when(F.col("supp_nation") == supp_nation, F.col("_v")).otherwise(zero)
    )
    tot_vol = F.sum(F.col("_v"))
    return (
        j.select(o_year.alias("o_year"), vol.alias("_v"), "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                nat_vol.cast("double") / tot_vol.cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy(F.col("o_year").asc())
    )


def q9_product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    name_token: str = "widget",
    cost_factor: float = 0.8,
) -> DataFrame:
    """TPC-H Q9 shape (adapted cost model: the stock profit subtracts
    ps_supplycost * l_quantity; with no partsupp table the unit cost is
    ``cost_factor * p_retailprice`` — a dimension attribute, preserving
    the join skeleton exactly): profit per (supplier nation, order
    year) over parts whose name contains a token.

    Scale shape: the name filter broadcasts into the fact first and
    carries p_retailprice along for the profit arithmetic; supplier ->
    nation broadcasts; lineitem-orders is the one fact-fact shuffle;
    the (nation, year) rollup is map-side combined over DECIMAL-exact
    amounts.  The LIKE filter cannot push to parquet as a range, but
    it DOES evaluate in the dimension scan — never against the fact."""
    pk = part.where(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    sup = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation")
            )
        ),
        supplier.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", "nation")
    j = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    o_year = F.substring(TS.normalize_ts(F.col("o_orderdate"), "yyyy-MM-dd"), 1, 4)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        j.select("nation", o_year.alias("o_year"), amount.alias("_a"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("_a").cast("double"), 2).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q11_important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    avg_multiple: float = 2.5,
) -> DataFrame:
    """TPC-H Q11 shape (adapted value relation: revenue supplied by the
    nation's suppliers per part, in place of the fixture-less
    partsupp's cost*availqty): parts whose value exceeds
    ``avg_multiple`` times the nation's AVERAGE per-part value — a
    grouped aggregate compared against a global scalar of the same
    aggregate.  (Stock Q11 hard-codes fraction = 0.0001/SF to keep the
    threshold scale-invariant; dividing by the part count does the
    same normalization without a scale-factor parameter.)

    Scale note: like Q15's argmax, the rollup subtree feeds both the
    scalar and the filter, so the fixture plan computes it twice (two
    map-side-combined fact passes); the production path persists the
    per-part rollup (|parts| rows) and derives both from the cache.

    Scale shape: ONE map-side-combined per-part rollup off the
    nation-restricted fact; the global total is a second aggregation
    of the rollup's output (never a rescan), collapsed to one row that
    cross-join-broadcasts into the HAVING filter (the Q22 scalar
    recipe).  Ordered by value desc with partkey tiebreak."""
    nat = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    li = lineitem.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.round(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("part_value")
    )
    total = per_part.agg(
        (F.sum(F.col("part_value").cast("decimal(18,6)")).cast("double")).alias("_tot"),
        F.count("*").alias("_cnt"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("part_value")
            > F.lit(avg_multiple) * F.col("_tot") / F.col("_cnt")
        )
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


def q16_parts_supplier_relationship(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    brand_not: str = "Brand#1",
    sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22),
) -> DataFrame:
    """TPC-H Q16 shape (adapted exclusion: the stock query drops
    suppliers whose comment marks complaints; ours drops suppliers with
    a returned ('R') line shipped in the first week of 1995 — a ~40%
    exclusion on the fixtures, so the anti join is exercised without
    emptying the result; the NOT-IN-subquery -> anti-join skeleton is
    identical): how many distinct suppliers can supply each (brand,
    size) bucket, excluding the flagged suppliers and one brand.

    Scale shape: the supplier exclusion list is a DISTINCT projection
    of the fact (bounded by |supplier|) anti-joined BEFORE the rollup;
    the part filters broadcast; the count-distinct rides one grouped
    aggregation with partial_count over (brand, size, suppkey) —
    Spark's two-phase distinct — never a row explosion."""
    bad = (
        lineitem.where(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= TS.utc_literal("1995-01-01 00:00:00"))
            & (F.col("l_shipdate") < TS.utc_literal("1995-01-08 00:00:00"))
        )
        .select(F.col("l_suppkey").alias("_bad_sk"))
        .distinct()
    )
    pk = part.where(
        (F.col("p_brand") != brand_not) & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_size")
    j = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("_bad_sk"), "left_anti")
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        j.groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_size").asc(),
        )
    )
