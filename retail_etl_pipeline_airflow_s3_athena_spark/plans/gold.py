"""Gold-layer business tables (reference scripts/load.py:137-268).

Four builders mirroring the reference's pandas aggregations, as lazy
Spark plans:

- daily_sales_summary   (load.py:137-180, A1+A2+J1+O1)
- top_customers         (load.py:182-213, A3+J2+O2 top-10)
- product_performance   (load.py:215-243, A4+J3+O3)
- store_performance     (load.py:245-268, A5+J4)

Semantic notes (SURVEY.md §7.3):
- The reference computes daily counts and daily revenue as two groupbys
  inner-joined on the key (an artifact of pandas' agg API); one
  ``groupBy().agg(...)`` is semantically identical (same key set on both
  sides) and saves a whole shuffle+join — we implement the single-agg
  form.
- ``count(transaction_id)`` counts non-null, matching pandas
  ``groupby().count()`` on a column.
- The reference's store_performance uses an ad-hoc lambda UDAF for
  sum(unit_price*quantity) (load.py:255); that is a native expression in
  Spark — no UDF.
- Top-k / sort tie order is undefined in the reference (pandas stable
  sort on arbitrary input order); we pin a deterministic secondary key
  (the id column) so results are reproducible and oracle-comparable.
- Monetary aggregates use exact integer-cents accumulation
  (``functions/money.py``): per-row line revenue is recovered to exact
  cents, summed as DECIMAL(38,0), and divided once — gold is a
  materialized product, and stable values under ANY partitioning/engine
  are part of its contract (a plain rounded double SUM is penny-flaky
  when a group's total lands near a rounding boundary).  avg_price is a
  1e-8-quantized order-independent average rounded to 4dp.

Scale notes:
- All aggregations are partial-agg hash aggregates (map-side combine)
  on a single key — the natural Spark shape; no shuffle beyond the one
  required by the group key.
- Dimension joins (customers/products/stores) are explicitly
  ``broadcast()``: dims are tiny (stores ~ 5 rows) relative to the fact
  side, so the post-agg join never shuffles the aggregate.
- The aggregate input is the fact view; at 100 TB the only big shuffle
  is the groupBy key exchange, which AQE coalesces/splits as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    money_avg,
    money_sum,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround


def build_gold_tables(
    sale_transactions: DataFrame,
    customers: DataFrame | None = None,
    products: DataFrame | None = None,
    stores: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """All gold tables with the reference's degrade-gracefully column
    guards (P10, load.py:166,185,218,246): each aggregate is only built
    when its required columns exist; missing dims skip the enrichment
    join (store_performance is skipped entirely without stores data,
    mirroring load.py:246)."""
    from pyspark.sql import functions as _F

    cols = set(sale_transactions.columns)
    out: dict[str, DataFrame] = {}
    if {"transaction_id", "quantity", "order_date"} <= cols:
        if "unit_price" in cols:
            out["daily_sales_summary"] = daily_sales_summary(sale_transactions)
        else:
            # reference load.py:166: the revenue block is guarded on
            # unit_price — without it the summary is counts/items only
            out["daily_sales_summary"] = (
                sale_transactions.withColumn(
                    "sale_date", _F.to_date("order_date")
                )
                .filter(_F.col("sale_date").isNotNull())
                .groupBy("sale_date")
                .agg(
                    _F.count("transaction_id").alias("total_orders"),
                    _F.sum("quantity").alias("total_items"),
                )
                .orderBy("sale_date")
            )
    if {"customer_id", "unit_price", "quantity"} <= cols:
        spend = customer_spend(sale_transactions)
        if customers is not None:
            out["top_customers"] = top_customers(sale_transactions, customers)
        else:
            out["top_customers"] = spend.orderBy(
                _F.desc("total_spent"), _F.asc("customer_id")
            ).limit(10)
    if {"product_id", "quantity", "unit_price"} <= cols and products is not None:
        out["product_performance"] = product_performance(
            sale_transactions, products
        )
    if {"store_id", "quantity", "unit_price"} <= cols and stores is not None:
        out["store_performance"] = store_performance(sale_transactions, stores)
    return out


def daily_sales_summary(sale_transactions: DataFrame) -> DataFrame:
    """Per-day order counts, item counts and revenue.

    Reference: scripts/load.py:137-180 (date pick -> to_date -> dropna ->
    two groupbys -> inner join -> sort asc).
    """
    return (
        sale_transactions.withColumn("sale_date", F.to_date("order_date"))
        .filter(F.col("sale_date").isNotNull())
        .withColumn("line_revenue", F.col("unit_price") * F.col("quantity"))
        .groupBy("sale_date")
        .agg(
            F.count("transaction_id").alias("total_orders"),
            F.sum("quantity").alias("total_items"),
            money_sum("line_revenue").alias("revenue"),
        )
        .orderBy("sale_date")
    )


def customer_spend(sale_transactions: DataFrame) -> DataFrame:
    """Per-customer spend aggregate (reference scripts/load.py:185-198)."""
    return (
        sale_transactions.withColumn(
            "line_revenue", F.col("unit_price") * F.col("quantity")
        )
        .groupBy("customer_id")
        .agg(
            F.count("transaction_id").alias("order_count"),
            F.sum("quantity").alias("total_items"),
            money_sum("line_revenue").alias("total_spent"),
        )
    )


def top_customers(
    sale_transactions: DataFrame, customers: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k customers by total spend, enriched with the customer dim.

    Reference: scripts/load.py:182-213 (groupby -> left join customers ->
    sort desc -> head(10)).  Tie-break on customer_id asc (the reference
    leaves tie order undefined).
    """
    spend = customer_spend(sale_transactions)
    return (
        spend.join(F.broadcast(customers), "customer_id", "left")
        .orderBy(F.desc("total_spent"), F.asc("customer_id"))
        .limit(k)
    )


def product_performance(
    sale_transactions: DataFrame, products: DataFrame
) -> DataFrame:
    """Per-product sales stats joined to the product dim.

    Reference: scripts/load.py:215-243 (groupby count/sum/mean -> left
    join products -> sort desc by times_sold).
    """
    perf = sale_transactions.groupBy("product_id").agg(
        F.count("transaction_id").alias("times_sold"),
        F.sum("quantity").alias("total_quantity"),
        dround(money_avg("unit_price", 8), 4).alias("avg_price"),
    )
    return perf.join(F.broadcast(products), "product_id", "left").orderBy(
        F.desc("times_sold"), F.asc("product_id")
    )


def store_performance(sale_transactions: DataFrame, stores: DataFrame) -> DataFrame:
    """Per-store transaction counts, items and revenue.

    Reference: scripts/load.py:245-268.  The lambda UDAF at load.py:255
    (sum of unit_price*quantity) is a native expression here.
    """
    perf = (
        sale_transactions.withColumn(
            "line_revenue", F.col("unit_price") * F.col("quantity")
        )
        .groupBy("store_id")
        .agg(
            F.count("transaction_id").alias("total_transactions"),
            F.sum("quantity").alias("total_items"),
            money_sum("line_revenue").alias("total_revenue"),
        )
    )
    return perf.join(F.broadcast(stores), "store_id", "left").orderBy(
        F.desc("total_revenue"), F.asc("store_id")
    )
