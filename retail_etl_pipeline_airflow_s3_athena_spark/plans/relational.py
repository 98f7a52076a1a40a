"""Relational-breadth queries: semi/anti joins, EXCEPT, decorrelated
subqueries, HAVING-filtered aggregate joins, and lag/rank windows.

The reference's query surface is plain SELECT/JOIN/GROUP BY Athena SQL
(`scripts/athena_queries.py:74-126`); a user migrating from Athena to
this engine brings the rest of ANSI SQL with them — EXISTS / NOT
EXISTS, EXCEPT, scalar subqueries, HAVING, window ranks.  Each
operator here is the Spark-first expression of one of those shapes,
with the TPC-H query it rhymes with noted:

- EXISTS            -> ``left_semi`` join          (Q4 shape)
- NOT EXISTS        -> ``left_anti`` join          (Q22 shape)
- EXCEPT            -> ``DataFrame.subtract``      (set-op breadth)
- correlated scalar -> decorrelated agg + join     (Q17 shape)
- HAVING subquery   -> agg → filter → join back    (Q18 shape)
- lag/ntile windows -> window over daily rollup    (trend analysis)

Scale notes (100 TB): semi/anti joins shuffle both sides on the join
key exactly like inner joins and benefit from the same broadcast /
AQE decisions; the decorrelated Q17 aggregate is a map-side-combinable
groupBy whose output is |parts| rows — broadcastable back against
lineitem.  The windows in ``daily_revenue_delta`` run over a
*daily-grain rollup* (rows = #days), so the single-partition window
is bounded by the calendar, not the fact table; ``customer_value_tiles``
partitions its rank computation only after a distributed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
    carried_deps,
)
from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    cents,
    exact_sum,
    int_avg,
    money_avg,
    money_sum,
    revenue_e4,
    revenue_sum,
    sql_cents,
    sql_exact_sum,
    sql_int_avg,
    sql_money_avg,
    sql_money_sum,
    sql_revenue_e4,
    sql_revenue_sum,
)
from retail_etl_pipeline_airflow_s3_athena_spark.functions.ranking import (
    attach_global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround, sql_dround


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# EXISTS -> left_semi (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in 1996 with at least one line item shipped after
    the order date, counted by priority.  EXISTS becomes a
    ``left_semi`` join: Spark keeps each order at most once no matter
    how many line items match, and the date filter is pushed to the
    orders scan."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def oracle_late_shipment_priority_sql() -> str:
    return """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """


# ---------------------------------------------------------------------------
# NOT EXISTS -> left_anti (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

DORMANT_CUTOFF = "2000-06-01"


def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order since DORMANT_CUTOFF, rolled up by
    market segment.  NOT EXISTS becomes ``left_anti``; the cutoff
    filter shrinks the orders side before the shuffle, and the anti
    join output feeds a small groupBy."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.expr(f"o_orderdate >= TIMESTAMP_NTZ'{DORMANT_CUTOFF} 00:00:00'")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def oracle_dormant_customers_sql() -> str:
    return f"""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {sql_money_sum('c.c_acctbal')} AS total_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '{DORMANT_CUTOFF}')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """


# ---------------------------------------------------------------------------
# EXCEPT -> subtract
# ---------------------------------------------------------------------------

CHURN_SPLIT = "1998-01-01"


def churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered before CHURN_SPLIT but never after —
    EXCEPT DISTINCT via ``DataFrame.subtract`` (hash-distinct both
    sides, then a left-anti on all columns), joined back to customer
    for the segment.  Customer scales with SF (~15M rows at sf100),
    so no broadcast hint — AQE chooses per scale."""
    orders = _t(spark, sf_dir, "orders")
    before = orders.filter(
        F.expr(f"o_orderdate < TIMESTAMP_NTZ'{CHURN_SPLIT} 00:00:00'")
    ).select("o_custkey")
    after = orders.filter(
        F.expr(f"o_orderdate >= TIMESTAMP_NTZ'{CHURN_SPLIT} 00:00:00'")
    ).select("o_custkey")
    churned = before.subtract(after)
    cust = _t(spark, sf_dir, "customer")
    return (
        churned.join(cust, churned.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_mktsegment"),
        )
        .orderBy("c_custkey")
    )


def oracle_churned_buyers_sql() -> str:
    return f"""
        WITH churned AS (
            SELECT o_custkey FROM orders
            WHERE o_orderdate < TIMESTAMP '{CHURN_SPLIT}'
            EXCEPT
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '{CHURN_SPLIT}'
        )
        SELECT c.c_custkey, c.c_name, c.c_mktsegment
        FROM churned ch JOIN customer c ON ch.o_custkey = c.c_custkey
        ORDER BY c.c_custkey
    """


# ---------------------------------------------------------------------------
# Correlated scalar subquery -> decorrelated agg + join (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in below-half-average-quantity line items.  The
    correlated ``(SELECT AVG(..) WHERE same part)`` decorrelates into
    one per-part aggregate joined back to lineitem — the aggregate is
    map-side combinable.  Its output is |parts| rows, which GROWS WITH
    DATA (~20M at sf100), so it carries no broadcast hint: AQE picks
    broadcast at small scale and shuffle join once the side is big.
    The 0.5*avg comparison is deterministic across engines because
    l_quantity is integer-valued, so the per-part sums (and hence the
    averages) are exact doubles under any accumulation order."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(
            per_part,
            on="l_partkey",
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_small_lines"),
            money_sum("l_extendedprice").alias("total_revenue"),
        )
    )


def oracle_small_quantity_revenue_sql() -> str:
    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
               {sql_money_sum('l.l_extendedprice')} AS total_revenue
        FROM lineitem l
        WHERE l.l_quantity < (
            SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """


# ---------------------------------------------------------------------------
# HAVING-filtered aggregate join-back (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

BIG_ORDER_QTY = 300


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds BIG_ORDER_QTY, with
    the customer attached — ``IN (GROUP BY .. HAVING)`` becomes an
    aggregate, a filter, and an inner join back.  The HAVING aggregate
    output is "rare" but still O(data) — like customer, it scales with
    SF — so neither side carries a broadcast hint: AQE broadcasts them
    while they fit and switches to shuffle join at scale.  Quantity
    sums are exact (integer-valued doubles), making the threshold
    deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > BIG_ORDER_QTY)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def oracle_big_orders_sql() -> str:
    return f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, h.total_qty
        FROM orders o
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > {BIG_ORDER_QTY}) h
          ON o.o_orderkey = h.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# Lag / delta trend window over a daily rollup
# ---------------------------------------------------------------------------

def daily_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day order revenue with absolute and percent change.
    The lag window runs over the *daily rollup* (rows = #days), so the
    unpartitioned window is calendar-bounded, not data-bounded; the
    revenue is rounded before the lag so the delta maths is on
    identical inputs in both engines."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("order_day")
    prev = F.lag("revenue").over(w)
    return (
        daily.select(
            "order_day",
            "revenue",
            dround(F.col("revenue") - prev, 2).alias("delta"),
            dround(
                F.lit(100.0) * (F.col("revenue") - prev)
                / F.greatest(prev, F.lit(1.0)),
                4,
            ).alias("pct_change"),
        )
        .orderBy("order_day")
    )


def oracle_daily_revenue_delta_sql() -> str:
    rev = sql_money_sum("o_totalprice")
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS order_day,
                   {rev} AS revenue
            FROM orders GROUP BY 1
        ), lagged AS (
            SELECT order_day, revenue,
                   LAG(revenue) OVER (ORDER BY order_day) AS prev
            FROM daily
        )
        SELECT order_day, revenue,
               {sql_dround('revenue - prev', 2)} AS delta,
               {sql_dround('100.0 * (revenue - prev) / GREATEST(prev, 1.0)', 4)}
                   AS pct_change
        FROM lagged
        ORDER BY order_day
    """


# ---------------------------------------------------------------------------
# ntile / percent_rank customer tiers
# ---------------------------------------------------------------------------

def customer_value_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime spend quartiles: distributed aggregate first,
    then a DISTRIBUTED two-pass rank (functions/ranking.py) over the
    |customers|-row rollup — range-repartition on the tie-broken sort
    key, per-partition local row numbers, cumulative offsets from a
    #partitions-row stats table.  NTILE(4) and PERCENT_RANK become
    pure arithmetic on (rank, total), bucket-for-bucket identical to
    the SQL window functions the oracle runs, with NO unpartitioned
    WindowExec anywhere in the plan: at 100 TB |customers| is billions
    of rows and a ``Window.orderBy`` with no partitionBy would funnel
    them through one task."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    ranked = attach_global_rank(
        spend,
        [F.desc("total_spend"), F.asc("o_custkey")],
        rank_col="_rank",
        total_col="_n",
    )
    rank, n = F.col("_rank"), F.col("_n")
    out = (
        ranked.select(
            F.col("o_custkey").alias("custkey"),
            "total_spend",
            "n_orders",
            ntile_from_rank(rank, n, 4).alias("quartile"),
            dround(percent_rank_from_rank(rank, n), 6).alias("pct_rank"),
        )
        .orderBy("custkey")
    )
    return attach_cached_deps(out, *carried_deps(ranked))


def oracle_customer_value_tiles_sql() -> str:
    return f"""
        WITH spend AS (
            SELECT o_custkey AS custkey,
                   {sql_money_sum('o_totalprice')} AS total_spend,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT custkey, total_spend, n_orders,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               {sql_dround('PERCENT_RANK() OVER w', 6)} AS pct_rank
        FROM spend
        WINDOW w AS (ORDER BY total_spend DESC, custkey ASC)
        ORDER BY custkey
    """


# ---------------------------------------------------------------------------
# Correlated argmin retrieval (TPC-H Q2 shape)
# ---------------------------------------------------------------------------

def cheapest_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each size-1 part, the supplier behind the CHEAPEST unit-price
    line item (Q2's correlated-MIN-then-retrieve shape, over lineitem
    since the fixture has no partsupp).  The argmin is a per-part
    row_number over (rounded unit price, tie-break keys) — the rounded
    value drives the ordering on BOTH engines so float noise can't flip
    ties.  Part and supplier scale with SF, so their joins carry no
    broadcast hint (AQE decides); only the fixed-size nation dim keeps
    its hint."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    unit = dround(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey"),
        F.asc("l_orderkey"), F.asc("l_linenumber"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            "p_partkey", "p_name", "l_suppkey", "l_orderkey", "l_linenumber",
            unit.alias("unit_price"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "unit_price", "s_name", "n_name")
        .orderBy("p_partkey")
    )


def oracle_cheapest_part_supplier_sql() -> str:
    return f"""
        WITH lines AS (
            SELECT p.p_partkey, p.p_name, l.l_suppkey,
                   {sql_dround('l.l_extendedprice / l.l_quantity', 6)}
                       AS unit_price,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.p_partkey
                       ORDER BY {sql_dround('l.l_extendedprice / l.l_quantity', 6)} ASC,
                                l.l_suppkey ASC, l.l_orderkey ASC,
                                l.l_linenumber ASC) AS rn
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_size = 1
        )
        SELECT x.p_partkey, x.p_name, x.unit_price, s.s_name, n.n_name
        FROM lines x
        JOIN supplier s ON x.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE x.rn = 1
        ORDER BY x.p_partkey
    """


# ---------------------------------------------------------------------------
# Bi-nation trade volume by year (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue between (supplier nation, customer nation) pairs per
    order year — Q7's shape: the fact chain shuffles on its join keys,
    both nation dims broadcast, and the output is bounded by
    nations^2 x years regardless of fact scale.  Year extraction
    happens AFTER the joins on the grouped key only."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            revenue_sum("l_extendedprice", "l_discount").alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


def oracle_nation_trade_volume_sql() -> str:
    return f"""
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
               {sql_revenue_sum('l.l_extendedprice', 'l.l_discount')}
                   AS volume
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_name <> nc.n_name
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# NOT IN + distinct-count rollup (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

def part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers who shipped each (brand, type) part group,
    EXCLUDING suppliers with negative account balance — Q16's
    NOT IN (subquery) becomes a ``left_anti`` join; the distinct count
    is the standard two-phase plan.  Part and the excluded-supplier
    set both scale with SF, so no broadcast hints — AQE decides."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
    )


def oracle_part_supplier_breadth_sql() -> str:
    return """
        SELECT p.p_brand, p.p_type,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type
        ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC
    """


# ---------------------------------------------------------------------------
# HAVING-qualified semi-join (TPC-H Q20 shape)
# ---------------------------------------------------------------------------

PROMO_QTY_THRESHOLD = 50


def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose total shipped PROMO-part quantity exceeds a
    threshold — Q20's nested IN (… HAVING …) becomes: fact-side
    aggregate -> threshold filter -> ``left_semi`` back to the
    supplier dim.  The promo-part set and the qualifying-supplier
    aggregate both scale with data, so they carry no broadcast hints
    (AQE decides per scale); nation is a true fixed-size dim and
    keeps its hint."""
    li = _t(spark, sf_dir, "lineitem")
    promo = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    qual = (
        li.join(promo, li.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .filter(F.col("promo_qty") > PROMO_QTY_THRESHOLD)
    )
    return (
        supp.join(qual, supp.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def oracle_promo_part_suppliers_sql() -> str:
    return f"""
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_type = 'PROMO'
            GROUP BY l.l_suppkey
            HAVING SUM(l.l_quantity) > {PROMO_QTY_THRESHOLD}
        )
        ORDER BY s.s_suppkey
    """


# ---------------------------------------------------------------------------
# Disjunctive join predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

def brand_basket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjoint (brand, size-range, quantity-range)
    baskets — Q19's OR-of-ANDs shape.  The equi-join key (partkey)
    stays conjunctive so Catalyst still plans a hash join; the
    disjunction is a post-join filter the optimizer can partially push
    (the common `p_size >= 1` and quantity bounds reach the scans).
    One aggregate row out."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    basket = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & (F.col("p_size").between(5, 25))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(25, 50))
        )
    )
    return j.filter(basket).agg(
        revenue_sum("l_extendedprice", "l_discount").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def oracle_brand_basket_revenue_sql() -> str:
    return f"""
        SELECT {sql_revenue_sum('l.l_extendedprice', 'l.l_discount')}
                   AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 1 AND 15)
           OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 5 AND 25
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 25 AND 50)
    """


# ---------------------------------------------------------------------------
# Per-group market share (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

MARKET_SHARE_NATION = "NATION_3"  # fixture nations are NATION_0..24


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's supplier-revenue share per order year within
    ASIA-customer orders — Q8's conditional-share shape: the ratio of a
    CASE-gated sum to the group total, computed in ONE aggregate pass
    (no self-join, no window).  Rounding happens only on the final
    share; the two sums are exact-order-independent after dround(4)
    because prices are 2dp x discounts 2dp."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_e4 = revenue_e4("l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                exact_sum(
                    F.when(
                        F.col("supp_nation") == MARKET_SHARE_NATION, rev_e4
                    ).otherwise(F.lit(0))
                )
                / 1e4
            ).alias("nation_revenue"),
            revenue_sum("l_extendedprice", "l_discount").alias(
                "total_revenue"
            ),
        )
        .select(
            "order_year",
            "nation_revenue",
            "total_revenue",
            dround(
                F.col("nation_revenue") / F.col("total_revenue"), 6
            ).alias("market_share"),
        )
        .orderBy("order_year")
    )


def oracle_nation_market_share_sql() -> str:
    share = sql_dround("nation_revenue / total_revenue", 6)
    return f"""
        WITH agg AS (
            SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
                       AS order_year,
                   {sql_exact_sum(
                       "CASE WHEN ns.n_name = '" + MARKET_SHARE_NATION
                       + "' THEN " + sql_revenue_e4(
                           "l.l_extendedprice", "l.l_discount")
                       + " ELSE 0 END")} / 1e4 AS nation_revenue,
                   {sql_revenue_sum(
                       "l.l_extendedprice", "l.l_discount")}
                       AS total_revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            JOIN region r ON nc.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            WHERE r.r_name = 'ASIA'
            GROUP BY 1
        )
        SELECT order_year, nation_revenue, total_revenue,
               {share} AS market_share
        FROM agg
        ORDER BY order_year
    """


# ---------------------------------------------------------------------------
# Outer-join zero-preserving count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N orders (urgent orders
    excluded) — Q13's custdist: a LEFT OUTER join so zero-order
    customers survive with count 0, then a second aggregation over the
    per-customer counts.

    Plan shape: the outer join shuffles on custkey; the first groupBy
    is map-side combinable on the same key (no extra exchange after the
    join); the second groupBy's input is |customers| rows collapsing to
    |distinct counts| — tiny.  Counts are integers, so every value is
    exact and the gate hash is stable."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def oracle_customer_order_distribution_sql() -> str:
    return """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """


# ---------------------------------------------------------------------------
# Semi + anti against the same fact (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

LATE_DAYS = 30


def lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper in finished
    multi-supplier orders — Q21's stacked EXISTS / NOT EXISTS against
    the same lineitem table, decorrelated into ONE per-order aggregate:
    n_supp = distinct suppliers in the order, n_late = distinct LATE
    suppliers (shipped > LATE_DAYS after the order date).  A late
    (order, supplier) pair qualifies iff n_supp > 1 and n_late = 1 —
    set algebra instead of two correlated subqueries.

    Plan: ONE fact scan + join reduces to the DISTINCT
    (order, supplier, was-late) pair table, which is PERSISTED — it
    feeds both the per-order rollup and the late-pair filter (without
    the persist the fact join ran twice).  Both consumers then work on
    the pair grain, O(orders × suppliers-per-order) ≪ O(lines).
    Cache ownership transfers to the caller
    (``functions.caching.release_cached``).

    Determinism: lateness compares whole-day timestamps (exact), and
    numwait is an integer count; ties in the top-20 break on s_name."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
            ).cast("int").alias("late_i"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late_i").alias("late_i"))
        .persist()
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late_i").alias("n_late"),
    )
    late_pairs = pairs.filter(F.col("late_i") == 1).select(
        "l_orderkey", "l_suppkey"
    )
    supp = _t(spark, sf_dir, "supplier")
    out = (
        late_pairs.join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ),
            "l_orderkey",
        )
        .join(supp, late_pairs.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
    return attach_cached_deps(out, pairs)


def oracle_lone_late_supplier_sql() -> str:
    return f"""
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate
                       + INTERVAL {LATE_DAYS} DAYS) AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                       AS n_late
            FROM lo GROUP BY l_orderkey
        ),
        late_pairs AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late_pairs lp
        JOIN per_order p
          ON lp.l_orderkey = p.l_orderkey
         AND p.n_supp > 1 AND p.n_late = 1
        JOIN supplier s ON lp.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# Scalar-subquery threshold + NOT EXISTS (full TPC-H Q22 shape)
# ---------------------------------------------------------------------------

def above_avg_dormant_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Untapped-value rollup: customers with an above-average positive
    account balance and no order since DORMANT_CUTOFF, by market
    segment — the full Q22: a scalar subquery (avg positive balance)
    gates the customer scan, NOT EXISTS becomes ``left_anti``.

    The scalar threshold is rounded to 2 dp with the cross-engine
    ``dround`` BEFORE the comparison: balances are 2-dp money, so the
    only way the qualifying set could differ between engines is a
    balance sitting within one ulp of the unrounded engine-dependent
    average — rounding removes that edge.  The 1-row average
    cross-joins (broadcast) against customer; at any scale the scalar
    side is 1 row."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        dround(money_avg("c_acctbal"), 2).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.expr(f"o_orderdate >= TIMESTAMP_NTZ'{DORMANT_CUTOFF} 00:00:00'")
    ).select("o_custkey")
    return (
        cust.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def oracle_above_avg_dormant_value_sql() -> str:
    return f"""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {sql_money_sum('c.c_acctbal')} AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT {sql_dround(sql_money_avg('c2.c_acctbal'), 2)}
                FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '{DORMANT_CUTOFF}')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """


# ---------------------------------------------------------------------------
# HAVING against a global scalar (TPC-H Q11 shape)
# ---------------------------------------------------------------------------

REVENUE_SHARE_FACTOR = 1.05


def supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose discounted revenue exceeds
    REVENUE_SHARE_FACTOR x the MEAN supplier revenue — Q11's
    HAVING-against-global-scalar: the per-supplier aggregate, the mean
    threshold, and the grand total all come from the SAME
    map-side-combinable groupBy (one fact scan), cross-joined back as a
    1-row scalar.  The threshold is relative to the supplier
    population, so the query stays selective at every scale factor (a
    fixed share cutoff goes empty as |suppliers| grows).

    Determinism: per-supplier revenue, the mean threshold, and the
    total are all rounded to 2 dp with the cross-engine ``dround``
    before comparison/division, so accumulation order can't flip a
    borderline supplier; the reported share of total is rounded to
    6 dp."""
    li = _t(spark, sf_dir, "lineitem")
    # persisted: the |suppliers|-row aggregate feeds both the scalar
    # pass and the filter — without it the fact table is scanned twice
    per_supp = li.groupBy("l_suppkey").agg(
        dround(
            revenue_sum("l_extendedprice", "l_discount"), 2
        ).alias("supp_revenue")
    ).persist()
    scalars = per_supp.agg(
        money_sum("supp_revenue").alias("total_revenue"),
        dround(
            F.lit(REVENUE_SHARE_FACTOR) * money_avg("supp_revenue"), 2
        ).alias("rev_cutoff"),
    )
    supp = _t(spark, sf_dir, "supplier")
    share = dround(F.col("supp_revenue") / F.col("total_revenue"), 6)
    out = (
        per_supp.crossJoin(scalars)
        .filter(F.col("supp_revenue") > F.col("rev_cutoff"))
        .withColumn("revenue_share", share)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "supp_revenue",
            "revenue_share",
        )
        .orderBy(F.desc("revenue_share"), F.asc("s_suppkey"))
    )
    return attach_cached_deps(out, per_supp)


def oracle_supplier_revenue_share_sql() -> str:
    return f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   {sql_dround(sql_revenue_sum(
                       "l_extendedprice", "l_discount"), 2)}
                       AS supp_revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        scalars AS (
            SELECT {sql_money_sum('supp_revenue')} AS total_revenue,
                   {sql_dround(
                       f'{REVENUE_SHARE_FACTOR} * '
                       + sql_money_avg('supp_revenue'), 2)}
                       AS rev_cutoff
            FROM per_supp
        )
        SELECT s.s_suppkey, s.s_name, p.supp_revenue,
               {sql_dround('p.supp_revenue / t.total_revenue', 6)}
                   AS revenue_share
        FROM per_supp p CROSS JOIN scalars t
        JOIN supplier s ON p.l_suppkey = s.s_suppkey
        WHERE p.supp_revenue > t.rev_cutoff
        ORDER BY revenue_share DESC, s.s_suppkey
    """


# ---------------------------------------------------------------------------
# Scan-only aggregate (TPC-H Q6 shape)
# ---------------------------------------------------------------------------

def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be recovered by eliminating mid-band
    discounts on small orders in 1997 — Q6's shape: a single fact
    scan whose three predicates (date range, discount band, quantity
    cap) ALL push down to the parquet reader, followed by one
    map-side-combinable global aggregate.  No join, no wide shuffle —
    at 100 TB this is the cheapest query in the workload because the
    scan reads only 4 columns and row groups outside the ship-date
    range are skipped on footer statistics."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dround(
            exact_sum(cents("l_extendedprice") * cents("l_discount")) / 1e4,
            2,
        ).alias("forecast_revenue"),
        F.count("*").alias("n_lines"),
    )


def oracle_discount_band_revenue_sql() -> str:
    e4 = f"({sql_cents('l_extendedprice')} * {sql_cents('l_discount')})"
    return f"""
        SELECT {sql_dround(sql_exact_sum(e4) + ' / 1e4', 2)}
                   AS forecast_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """


# ---------------------------------------------------------------------------
# Product-line profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

Q9_PART_TOKEN = "gear"


def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue of parts whose name contains
    ``Q9_PART_TOKEN``, by supplier nation and order year — Q9's join
    topology (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) with the
    part-name filter pushed into the part scan.  The filtered part
    side is O(|parts|/k) — data-scaling, so it carries NO broadcast
    hint (AQE broadcasts it at small SF and shuffles at large); only
    the fixed-size nation dim is hinted.  Output is bounded by
    nations × years."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_PART_TOKEN)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        # exact 1e-4-dollar integer accumulation (functions/money.py):
        # the r5 driver caught this query penny-off at sf0.1 when it was
        # dround(SUM(double)) — float accumulation order put two cells
        # within an ulp of the .005 rounding boundary.
        .agg(
            dround(
                revenue_sum("l_extendedprice", "l_discount"), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("order_year"))
    )


def oracle_nation_year_profit_sql() -> str:
    return f"""
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
               {sql_dround(sql_revenue_sum(
                   'l.l_extendedprice', 'l.l_discount'), 2)}
                   AS sum_profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%{Q9_PART_TOKEN}%'
        GROUP BY n.n_name, YEAR(o.o_orderdate)
        ORDER BY nation, order_year DESC
    """


# ---------------------------------------------------------------------------
# Returned-item reporting (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returned line items for
    orders placed in 1997H1 — Q10's shape: the order-date filter
    shrinks the orders side BEFORE its join to lineitem, the
    returnflag filter prunes lineitem at the scan, and the final
    top-20 runs as TakeOrderedAndProject (per-partition partial
    top-k, no full sort).  Revenue is dround-ed BEFORE ordering and
    ties broken by c_custkey so the limit is cross-engine stable."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ'1997-07-01 00:00:00'"
        )
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
            F.col("n_name").alias("nation"),
        )
        .agg(
            dround(
                revenue_sum("l_extendedprice", "l_discount"), 2
            ).alias("lost_revenue")
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def oracle_returned_item_customers_sql() -> str:
    return f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
               n.n_name AS nation,
               {sql_dround(sql_revenue_sum(
                   'l.l_extendedprice', 'l.l_discount'), 2)}
                   AS lost_revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
                 n.n_name
        ORDER BY lost_revenue DESC, c.c_custkey
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# Priority mix by line status (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

def linestatus_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of high- vs low-priority orders behind each line status
    for lines shipped in 1997 — Q12's conditional-aggregation shape
    (the reference schema has no ship-mode column, so line status
    stands in as the grouping).  One fact⋈orders shuffle; the CASE
    sums combine map-side, and output is bounded by |statuses|."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def oracle_linestatus_priority_mix_sql() -> str:
    return """
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus
    """


# ---------------------------------------------------------------------------
# Top supplier by windowed revenue (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose 1997Q1 shipped revenue equals the maximum —
    Q15's scalar-subquery-on-a-view shape: the per-supplier aggregate
    (|suppliers| rows) is PERSISTED so the fact table is scanned once
    and both consumers — the 1-row MAX and the equality filter — read
    the materialized view (static planning does NOT reuse the exchange
    here; without the persist the 100 TB scan would run twice).  Cache
    ownership transfers to the caller
    (``functions.caching.release_cached``).  Revenue is dround-ed
    before the MAX comparison so both engines agree on exact equality
    at the cent grain."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1997-04-01 00:00:00'"
        )
    )
    per_supp = li.groupBy("l_suppkey").agg(
        dround(
            revenue_sum("l_extendedprice", "l_discount"), 2
        ).alias("total_revenue")
    ).persist()
    max_rev = per_supp.agg(
        F.max("total_revenue").alias("max_revenue")
    )
    supp = _t(spark, sf_dir, "supplier")
    out = (
        per_supp.crossJoin(max_rev)
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    return attach_cached_deps(out, per_supp)


def oracle_top_revenue_supplier_sql() -> str:
    return f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   {sql_dround(sql_revenue_sum(
                       'l_extendedprice', 'l_discount'), 2)}
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, p.total_revenue
        FROM per_supp p
        JOIN supplier s ON p.l_suppkey = s.s_suppkey
        WHERE p.total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
        ORDER BY s.s_suppkey
    """


# ---------------------------------------------------------------------------
# CUBE rollup (multi-dimensional grouping-set breadth)
# ---------------------------------------------------------------------------

def segment_year_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue by (market segment × order year) with ALL
    grouping-set margins — ``DataFrame.cube``: one shuffle produces
    the full lattice (detail, per-segment, per-year, grand total) via
    partial aggregation; the expansion factor is the lattice size (4),
    applied at the map-side-combined grain, not the fact grain.

    The fact side is PRE-AGGREGATED to (custkey, year) grain BEFORE
    the customer join — an aggregate push-through-join Catalyst does
    not perform itself: the join input shrinks from |orders| to the
    roughly |customers|-sized active grid, so at 100 TB the wide
    shuffle carries partial sums, not order rows.  Partials are
    carried as exact BIGINT cents (``functions/money.py``), so the
    two-stage accumulation is order-independent by construction."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    pre = orders.groupBy(
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(
        # partial sums carried as exact BIGINT cents so the two-stage
        # accumulation (pre-agg then cube) stays order-independent
        F.sum(cents("o_totalprice")).alias("rev_cents"),
        F.count("*").alias("n_part"),
    )
    return (
        pre.join(cust, pre.o_custkey == cust.c_custkey)
        .cube("c_mktsegment", "order_year")
        .agg(
            (exact_sum(F.col("rev_cents")) / 1e2).alias("revenue"),
            F.sum("n_part").alias("n_orders"),
        )
        .orderBy(
            F.asc_nulls_first("c_mktsegment"),
            F.asc_nulls_first("order_year"),
        )
    )


def oracle_segment_year_cube_sql() -> str:
    return f"""
        SELECT c.c_mktsegment,
               CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
               {sql_money_sum('o.o_totalprice')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY CUBE (c.c_mktsegment, YEAR(o.o_orderdate))
        ORDER BY c_mktsegment NULLS FIRST, order_year NULLS FIRST
    """


# ---------------------------------------------------------------------------
# Integer-exact daily anomaly detection (MAD z-score)
# ---------------------------------------------------------------------------

ANOMALY_K = 3


def anomalous_revenue_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship days whose revenue deviates from the period mean by more
    than ``ANOMALY_K`` mean-absolute-deviations.

    Cross-engine determinism by construction: daily revenue is
    rounded to integer CENTS, and every statistic is then integer
    arithmetic — ``dev_i = |cents_i·n − S|`` (S = Σcents) and
    ``T = Σdev`` stay exact in 64-bit (cents ≈ 1e8, n ≈ 2.5e3,
    T ≈ 2.5e15 < 2^53), so the filter ``n·dev > K·T`` (equivalent to
    |x−mean| > K·MAD without any division) cannot flip on float
    accumulation order.  Scale: the fact scan reduces to a days-grain
    rollup (rows = calendar days) which is PERSISTED so the three
    consumers (scalar pass, deviation pass, total pass) share ONE
    fact scan instead of re-reading 100 TB four times; the caller
    releases it via the cache-ownership contract."""
    li = _t(spark, sf_dir, "lineitem")
    # Daily cents via the EXACT 1e-4-integer revenue sum, rounded to
    # cents in pure integer arithmetic ((e4 + 50) div 100) — the
    # previous floor(SUM(double)*100 + 0.5) crossed a half-cent
    # boundary at 10x sf0.1 volume (caught by the /tmp/sf1 endurance
    # gate: 142287890.12 vs .11 on 1995-02-22).
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("sale_date"))
        .agg(
            F.sum(revenue_e4("l_extendedprice", "l_discount")).alias("e4")
        )
        .select("sale_date", F.expr("(e4 + 50) div 100").alias("cents"))
        .persist()
    )
    scalars = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    dev = daily.crossJoin(scalars).withColumn(
        "dev", F.abs(F.col("cents") * F.col("n") - F.col("s"))
    )
    total = dev.agg(F.sum("dev").alias("t"))
    out = (
        dev.crossJoin(total)
        .filter(F.col("n") * F.col("dev") > F.lit(ANOMALY_K) * F.col("t"))
        .select(
            F.col("sale_date"),
            (F.col("cents") / 100).alias("revenue"),
            dround(
                F.col("n") * F.col("dev") / F.col("t"), 4
            ).alias("mad_ratio"),
        )
        .orderBy("sale_date")
    )
    return attach_cached_deps(out, daily)


def oracle_anomalous_revenue_days_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS sale_date,
                   CAST((SUM({sql_revenue_e4(
                       'l_extendedprice', 'l_discount')}) + 50) // 100
                   AS BIGINT) AS cents
            FROM lineitem GROUP BY 1
        ),
        scalars AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM daily),
        dev AS (
            SELECT d.sale_date, d.cents,
                   ABS(d.cents * sc.n - sc.s) AS dev, sc.n
            FROM daily d CROSS JOIN scalars sc
        ),
        total AS (SELECT SUM(dev) AS t FROM dev)
        SELECT d.sale_date,
               d.cents / 100.0 AS revenue,
               {sql_dround('d.n * d.dev / t.t', 4)} AS mad_ratio
        FROM dev d CROSS JOIN total t
        WHERE d.n * d.dev > {ANOMALY_K} * t.t
        ORDER BY d.sale_date
    """


# ---------------------------------------------------------------------------
# Inter-order gap analysis (lag window at fact grain)
# ---------------------------------------------------------------------------

def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer, rolled up to
    market segment — a lag window PARTITIONED BY customer (bounded
    per-partition work: a customer's order history, not the fact
    table) feeding a segment-grain aggregate.  The gap multiset is
    invariant under reordering of equal order dates, and the window
    sort is pinned by (o_orderdate, o_orderkey) anyway."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn(
            "gap_days",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date("prev_date")
            ).cast("long"),
        )
    )
    return (
        gaps.join(cust, gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            dround(int_avg("gap_days"), 2).alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


def oracle_customer_order_gaps_sql() -> str:
    return f"""
        WITH gaps AS (
            SELECT o_custkey,
                   CAST(date_diff('day',
                       LAG(o_orderdate) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS BIGINT) AS gap_days
            FROM orders
        )
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               {sql_dround(sql_int_avg('g.gap_days'), 2)} AS avg_gap_days,
               MAX(g.gap_days) AS max_gap_days
        FROM gaps g
        JOIN customer c ON g.o_custkey = c.c_custkey
        WHERE g.gap_days IS NOT NULL
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """


# ---------------------------------------------------------------------------
# Statistical aggregate: per-brand Pearson correlation via explicit sums
# ---------------------------------------------------------------------------

def brand_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per brand,
    computed from EXPLICIT moment sums (n, Σx, Σy, Σx², Σy², Σxy)
    rather than the native ``corr`` aggregate: the five sums are
    map-side-combinable in one fact pass (native corr is too, but its
    streaming co-moment update is engine-specific — exact integer
    moment sums give a formula both engines evaluate identically,
    see ``functions/money.py``).  Groups
    with zero variance in either variable are excluded (the guard,
    not NULL-juggling, keeps div-by-zero semantics out of the
    comparison).  One fact⋈part join, one groupBy, output = |brands|."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity").cast("long")
    yc = cents("l_extendedprice")
    s = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            # exact integer moments (quantity is integer, price 2-dp).
            # Accumulator width is chosen per column, narrowest that is
            # overflow-proof: l_quantity is domain-bounded (<= 50), so
            # Σq / Σq² fit a LONG for up to ~10^15 rows per group —
            # ANSI mode raises loudly past that, never corrupts.  The
            # cents-scaled price moments (per-row values up to ~10^14)
            # keep the DECIMAL(38,0) accumulator; measured cost of the
            # decimal sums vs naive double sums is ~0.1s at sf0.1
            # (COVERAGE.md) — the price of cross-engine bit-exactness.
            F.sum(q).cast("double").alias("sx"),
            (exact_sum(yc) / 1e2).alias("sy"),
            F.sum(q * q).cast("double").alias("sxx"),
            (exact_sum(yc * yc) / 1e4).alias("syy"),
            (exact_sum(q * yc) / 1e2).alias("sxy"),
        )
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter((var_x > 0) & (var_y > 0))
        .select(
            "p_brand",
            "n",
            dround(cov / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        )
        .orderBy("p_brand")
    )


def oracle_brand_corr_stats_sql() -> str:
    return f"""
        WITH s AS (
            SELECT p.p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_exact_sum('CAST(l.l_quantity AS BIGINT)')} AS sx,
                   {sql_exact_sum(sql_cents('l.l_extendedprice'))} / 1e2
                       AS sy,
                   {sql_exact_sum(
                       'CAST(l.l_quantity AS BIGINT)'
                       ' * CAST(l.l_quantity AS BIGINT)')} AS sxx,
                   {sql_exact_sum(
                       sql_cents('l.l_extendedprice') + ' * '
                       + sql_cents('l.l_extendedprice'))} / 1e4 AS syy,
                   {sql_exact_sum(
                       'CAST(l.l_quantity AS BIGINT) * '
                       + sql_cents('l.l_extendedprice'))} / 1e2 AS sxy
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        )
        SELECT p_brand, n,
               {sql_dround(
                   '(n*sxy - sx*sy) / SQRT((n*sxx - sx*sx) * (n*syy - sy*sy))',
                   6)} AS corr_qty_price
        FROM s
        WHERE (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
        ORDER BY p_brand
    """


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

def basket_rules(
    spark: SparkSession,
    sf_dir: str,
    min_pair: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k association rules part_a -> part_b by lift:
    (part_a, part_b, n_ab, support, confidence, lift) — the classic
    market-basket analysis the reference's SQL stack has no operators
    for (co-occurrence self-join + three-way ratio metrics).

    Plan / scale notes: baskets are DISTINCT (order, part) pairs — one
    projection+distinct off the fact scan; the pair space is the
    within-order self-join, bounded by basket width (TPC-H orders hold
    <= 7 parts; pair rows ~ W^2/2 per basket).  At extreme scale the
    Apriori property prunes first (drop items below min support BEFORE
    pairing); here min_pair filters after the combinable pair count.
    All three metrics derive from integer counts cast to double with a
    single rounding each — deterministic ordering (n_ab desc, lift
    desc, part_a, part_b) with a bounded top-k merge."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    n_baskets = li.select("okey").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item = li.groupBy("part").agg(F.count(F.lit(1)).alias("n_i"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    ia = item.select(F.col("part").alias("part_a"), F.col("n_i").alias("n_a"))
    ib = item.select(F.col("part").alias("part_b"), F.col("n_i").alias("n_b"))
    scored = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            dround(F.col("n_ab") / F.col("n_baskets"), 6).alias("support"),
            dround(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            dround(
                F.col("n_ab").cast("double")
                * F.col("n_baskets")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("n_ab"), F.desc("lift"), F.asc("part_a"), F.asc("part_b")
    ).limit(k)


def oracle_basket_rules_sql(min_pair: int = 2, k: int = 20) -> str:
    supp = sql_dround("CAST(p.n_ab AS DOUBLE) / nb.n_baskets", 6)
    conf = sql_dround("CAST(p.n_ab AS DOUBLE) / ia.n_i", 6)
    lift = sql_dround(
        "CAST(p.n_ab AS DOUBLE) * nb.n_baskets "
        "/ (CAST(ia.n_i AS DOUBLE) * ib.n_i)",
        6,
    )
    return f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem
        ),
        nb AS (SELECT COUNT(DISTINCT okey) AS n_baskets FROM li),
        item AS (SELECT part, COUNT(*) AS n_i FROM li GROUP BY part),
        pairs AS (
            SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS n_ab
            FROM li a JOIN li b
              ON a.okey = b.okey AND a.part < b.part
            GROUP BY part_a, part_b
            HAVING COUNT(*) >= {min_pair}
        )
        SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
               {supp} AS support,
               {conf} AS confidence,
               {lift} AS lift
        FROM pairs p
        JOIN item ia ON p.part_a = ia.part
        JOIN item ib ON p.part_b = ib.part
        CROSS JOIN nb
        ORDER BY n_ab DESC, lift DESC, part_a ASC, part_b ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Exact distributed percentiles
# ---------------------------------------------------------------------------

QUANTILE_PCTS = (1, 5, 25, 50, 75, 90, 95, 99)


def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide order-value percentiles at scale: (q,
    n_orders, value_cents) — the value at rank ceil(q/100 * n) of the
    (value, orderkey)-ordered total order.

    The Athena habit this replaces is ``approx_percentile`` (plus the
    occasional exact ``percentile_disc``); Spark's exact percentile
    aggregate buffers the whole column in ONE aggregation buffer, and
    a ``Window.orderBy`` rank funnels the table through one task —
    both non-starters on billions of orders.  The scale path reuses
    functions/ranking.py's distributed two-pass rank (range partition
    + per-partition offsets, no single-partition WindowExec), after
    which every percentile is one equality against the broadcast
    8-row percentile table: rank == (q·n + 99) div 100.  Values are
    exact integer cents, and the unique (value, key) tie-break makes
    the selected row — hence the whole result — deterministic and
    engine-exact even with heavily tied values (the selected VALUE at
    a rank inside a tie run is the tied value itself regardless of
    tie order)."""
    orders = _t(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("value_cents"), "o_orderkey"
    )
    ranked = attach_global_rank(
        orders,
        [F.asc("value_cents"), F.asc("o_orderkey")],
        rank_col="_rank",
        total_col="_n",
    )
    qdf = spark.createDataFrame(
        [(int(q),) for q in QUANTILE_PCTS], "q INT"
    )
    out = (
        ranked.join(
            F.broadcast(qdf),
            F.col("_rank") == F.expr("(q * _n + 99) div 100"),
        )
        .select(
            "q",
            F.col("_n").alias("n_orders"),
            "value_cents",
        )
        .orderBy("q")
    )
    return attach_cached_deps(out, *carried_deps(ranked))


def oracle_order_value_quantiles_sql() -> str:
    qrows = ", ".join(f"({int(q)})" for q in QUANTILE_PCTS)
    return f"""
        WITH vals AS (
            SELECT {sql_cents('o_totalprice')} AS value_cents, o_orderkey
            FROM orders
        ),
        ranked AS (
            SELECT value_cents,
                   ROW_NUMBER() OVER (
                       ORDER BY value_cents, o_orderkey
                   ) AS rk,
                   COUNT(*) OVER () AS n
            FROM vals
        ),
        qs(q) AS (VALUES {qrows})
        SELECT CAST(q AS INT)  AS q,
               CAST(n AS BIGINT) AS n_orders,
               value_cents
        FROM ranked JOIN qs ON rk = (q * n + 99) // 100
        ORDER BY q
    """
