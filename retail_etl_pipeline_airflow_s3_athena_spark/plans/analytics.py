"""The analytical SQL workload (reference scripts/athena_queries.py:74-126).

The reference submits 4 SQL strings to AWS Athena (Presto) against the
Gold tables registered in Glue.  Here the same queries run via
``spark.sql`` against temp views of the gold DataFrames — parse/analyze/
optimize/execute all happen in-process through Catalyst (SURVEY.md §3.3).

Single-source-of-truth design: each query body below is dialect-common
SQL that runs BOTH in Spark SQL (against registered gold views) and in
DuckDB (prefixed with the retail + gold CTE chain) — so the engine query
and its correctness oracle are literally the same text.

Queries (reference sites):
- daily_revenue             athena_queries.py:75-86
- top_performing_customers  athena_queries.py:88-100
- product_analysis          athena_queries.py:102-114 (scalar subquery MAX)
- revenue_by_category       athena_queries.py:116-125

Tie-breaks: the reference never defines ORDER BY tie order; we add the
id column as a deterministic secondary key (times_sold ties are common).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    sql_money_avg,
    sql_money_sum,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import sql_dround
from retail_etl_pipeline_airflow_s3_athena_spark.plans import gold, retail_views

# DuckDB CTE fragments for the gold tables, mirroring plans/gold.py.
# CAST(SUM(int) AS BIGINT): DuckDB promotes integer SUM to HUGEINT;
# Spark keeps BIGINT — pin the schema.
# Monetary sums/avgs go through sql_money_sum / sql_money_avg
# (functions/money.py): exact per-row scaled integers + DECIMAL(38,0)
# accumulation, so the value is bit-identical across engines and
# partitionings (a rounded double SUM flips cents when a group's total
# lands near a .005 boundary — caught by the r5 driver).  Residual
# rounding goes through sql_dround (floor(x*10^d+0.5)/10^d), NOT
# native ROUND: Spark and DuckDB ROUND disagree on non-representable
# near-ties (repo determinism policy — README / operators/text.dround).
GOLD_CTES = f"""
daily_sales_summary AS (
    SELECT CAST(order_date AS DATE)              AS sale_date,
           COUNT(transaction_id)                 AS total_orders,
           CAST(SUM(quantity) AS BIGINT)         AS total_items,
           {sql_money_sum('unit_price * quantity')}  AS revenue
    FROM sale_transactions
    WHERE CAST(order_date AS DATE) IS NOT NULL
    GROUP BY 1
),
customer_spend AS (
    SELECT customer_id,
           COUNT(transaction_id)                 AS order_count,
           CAST(SUM(quantity) AS BIGINT)         AS total_items,
           {sql_money_sum('unit_price * quantity')}  AS total_spent
    FROM sale_transactions
    GROUP BY 1
),
top_customers AS (
    SELECT cs.customer_id, cs.order_count, cs.total_items, cs.total_spent,
           c.customer_name, c.nation_id, c.account_balance, c.market_segment
    FROM customer_spend cs LEFT JOIN customers c USING (customer_id)
    ORDER BY cs.total_spent DESC, cs.customer_id ASC
    LIMIT 10
),
product_performance AS (
    SELECT pp.product_id, pp.times_sold, pp.total_quantity, pp.avg_price,
           p.product_name, p.category, p.product_type, p.product_size, p.price
    FROM (
        SELECT product_id,
               COUNT(transaction_id)         AS times_sold,
               CAST(SUM(quantity) AS BIGINT) AS total_quantity,
               {sql_dround(sql_money_avg('unit_price', 8), 4)}     AS avg_price
        FROM sale_transactions
        GROUP BY 1
    ) pp LEFT JOIN products p USING (product_id)
),
store_performance AS (
    SELECT sp.store_id, sp.total_transactions, sp.total_items, sp.total_revenue,
           s.store_name, s.nation_id, s.account_balance
    FROM (
        SELECT store_id,
               COUNT(transaction_id)                AS total_transactions,
               CAST(SUM(quantity) AS BIGINT)        AS total_items,
               {sql_money_sum('unit_price * quantity')} AS total_revenue
        FROM sale_transactions
        GROUP BY 1
    ) sp LEFT JOIN stores s USING (store_id)
)
"""

# Dialect-common query bodies: run verbatim by spark.sql AND by DuckDB.
ANALYTICS_SQL: dict[str, str] = {
    # Reference athena_queries.py:75-86 — daily revenue trend with
    # per-item ratio, positive-revenue filter, latest-10 days.
    "daily_revenue": f"""
        SELECT sale_date, total_orders, total_items, revenue,
               {sql_dround('revenue / total_items', 2)} AS avg_item_value
        FROM daily_sales_summary
        WHERE revenue > 0
        ORDER BY sale_date DESC
        LIMIT 10
    """,
    # Reference athena_queries.py:88-100 — top spenders with avg order value.
    "top_performing_customers": f"""
        SELECT customer_id, customer_name, market_segment,
               order_count, total_spent,
               {sql_dround('total_spent / order_count', 2)} AS avg_order_value
        FROM top_customers
        ORDER BY total_spent DESC, customer_id ASC
        LIMIT 5
    """,
    # Reference athena_queries.py:102-114 — product popularity normalized
    # by the max via a scalar subquery.  The reference's `times_sold * 1.0`
    # int->double promotion (athena_queries.py:110) is written as an
    # explicit CAST: Spark parses the 1.0 literal as DECIMAL(2,1) while
    # Presto/DuckDB make it DOUBLE, so the verbatim form changes the
    # result type.
    "product_analysis": f"""
        SELECT product_id, product_name, category, times_sold, total_quantity,
               {sql_dround('avg_price', 2)} AS avg_price,
               {sql_dround('CAST(times_sold AS DOUBLE) / '
                           '(SELECT MAX(times_sold) FROM product_performance)',
                           4)} AS popularity_score
        FROM product_performance
        ORDER BY times_sold DESC, product_id ASC
        LIMIT 10
    """,
    # Reference athena_queries.py:116-125 — category rollup with a
    # SUM-over-product-expression aggregate.
    "revenue_by_category": f"""
        SELECT category,
               CAST(SUM(times_sold) AS BIGINT)      AS total_sales,
               CAST(SUM(total_quantity) AS BIGINT)  AS total_qty,
               {sql_dround(sql_money_sum('times_sold * avg_price', 4), 2)} AS estimated_revenue
        FROM product_performance
        GROUP BY category
        ORDER BY estimated_revenue DESC
    """,
    # --- engine extensions beyond the reference's 4 queries ------------
    # Cumulative revenue over the daily summary (window function; the
    # running sum's accumulation order is pinned by ORDER BY, so the
    # floor-rounding is cross-engine stable).
    "daily_revenue_running": """
        SELECT sale_date, revenue,
               FLOOR(SUM(revenue) OVER (
                   ORDER BY sale_date ROWS UNBOUNDED PRECEDING
               ) * 1e2 + 0.5) / 1e2 AS running_revenue
        FROM daily_sales_summary
    """,
    # 7-day moving average over the daily gold rollup — a RANGE frame
    # (interval-bounded, gap-aware: missing days shrink the frame) as
    # opposed to daily_revenue_running's ROWS frame.  Dialect-shared:
    # Spark and DuckDB both parse INTERVAL-bounded RANGE frames over a
    # DATE order key.  AVG inputs are 2dp-rounded gold revenue and the
    # 7-value frame sum stays far inside double precision, so the 4dp
    # round is accumulation-order-safe.
    "daily_revenue_ma7": """
        SELECT sale_date, revenue,
               FLOOR(AVG(revenue) OVER (
                   ORDER BY sale_date
                   RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
               ) * 1e4 + 0.5) / 1e4 AS ma7_revenue
        FROM daily_sales_summary
    """,
    # Market-segment rollup with a grand-total row (GROUPING SETS).
    "segment_sales_rollup": f"""
        SELECT market_segment,
               CAST(COUNT(transaction_id) AS BIGINT) AS n_transactions,
               CAST(SUM(quantity) AS BIGINT)         AS total_items,
               {sql_money_sum('unit_price * quantity')}  AS revenue
        FROM sale_transactions st
        JOIN customers c USING (customer_id)
        GROUP BY ROLLUP(market_segment)
    """,
}


# Per-session gold registration state: (sf_dir, cached gold DataFrames).
# WeakKey so a discarded SparkSession doesn't pin its cache alive.
_GOLD_STATE: "weakref.WeakKeyDictionary[SparkSession, tuple[str, list[DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def register_gold_views(spark: SparkSession, sf_dir: str) -> None:
    """Build the retail views from fixtures and register the gold tables
    as temp views (the in-process analog of Glue registration,
    reference scripts/glue_registry.py:184-226).

    The reference's whole design point is that gold is MATERIALIZED
    (scripts/load.py:137-268) so the Athena workload hits tiny tables
    (athena_queries.py:74-126).  Mirror that: register once per
    (session, sf_dir) and ``persist()`` the gold DataFrames — every
    analytics query then reads the cached aggregate instead of
    re-scanning the fact table.  Gold size is bounded by key cardinality
    (days / top-10 / products / stores), so the cache stays small at any
    corpus scale; a production pipeline writes them as parquet
    (sources/writers.write_gold) and registers the files instead."""
    prev = _GOLD_STATE.get(spark)
    if prev is not None and prev[0] == sf_dir:
        return
    if prev is not None:
        for df in prev[1]:
            df.unpersist()
    st = retail_views.sale_transactions(spark, sf_dir)
    cust = retail_views.customers(spark, sf_dir)
    prod = retail_views.products(spark, sf_dir)
    strs = retail_views.stores(spark, sf_dir)
    st.createOrReplaceTempView("sale_transactions")
    cust.createOrReplaceTempView("customers")
    prod.createOrReplaceTempView("products")
    strs.createOrReplaceTempView("stores")
    golds = {
        "daily_sales_summary": gold.daily_sales_summary(st),
        "top_customers": gold.top_customers(st, cust),
        "product_performance": gold.product_performance(st, prod),
        "store_performance": gold.store_performance(st, strs),
    }
    cached = []
    for name, df in golds.items():
        df = df.persist()
        df.createOrReplaceTempView(name)
        cached.append(df)
    _GOLD_STATE[spark] = (sf_dir, cached)


def run_analytics_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """spark.sql entry point for one of the 4 canonical queries."""
    register_gold_views(spark, sf_dir)
    return spark.sql(ANALYTICS_SQL[name])


def execute_query(spark: SparkSession, database: str | None, sql: str):
    """The reference's remote-SQL surface (S14, athena_queries.py:15-68):
    submit SQL, poll until done, fetch rows.  On Spark this collapses to
    a synchronous ``spark.sql`` — the wrapper keeps the call shape
    (optional database scoping, rows out) for pipeline parity."""
    if database:
        spark.catalog.setCurrentDatabase(database)
    return spark.sql(sql).collect()


def oracle_for(name: str) -> str:
    """DuckDB oracle: the same query body over the CTE chain."""
    return retail_views.with_retail_ctes(
        ANALYTICS_SQL[name], extra_ctes=GOLD_CTES
    )
