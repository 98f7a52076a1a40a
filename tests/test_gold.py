"""Gold-layer builders (reference scripts/load.py:137-268) over sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.plans import gold, retail_views


@pytest.fixture(scope="module")
def st(spark, sf_dir):
    return retail_views.sale_transactions(spark, sf_dir).cache()


def test_sale_transactions_shape(st):
    assert st.columns == [
        "transaction_id", "customer_id", "product_id", "store_id",
        "quantity", "unit_price", "order_date",
    ]
    n = st.count()
    assert n == 6000  # every lineitem row has an order
    # transaction_id is a line identifier (the fixture's
    # (orderkey, linenumber) pairs repeat); reference semantics only
    # ever COUNT it (non-null), never require uniqueness.
    assert st.filter(st.transaction_id.isNull()).count() == 0


def test_daily_sales_summary(st):
    dss = gold.daily_sales_summary(st)
    rows = dss.collect()
    assert len(rows) > 1
    # aggregates are internally consistent
    assert sum(r["total_orders"] for r in rows) == 6000
    assert all(r["revenue"] > 0 for r in rows)
    # sorted ascending by date
    dates = [r["sale_date"] for r in rows]
    assert dates == sorted(dates)


def test_top_customers(spark, sf_dir, st):
    cust = retail_views.customers(spark, sf_dir)
    top = gold.top_customers(st, cust).collect()
    assert len(top) == 10
    spends = [r["total_spent"] for r in top]
    assert spends == sorted(spends, reverse=True)
    # dim enrichment survived the left join
    assert all(r["customer_name"] is not None for r in top)


def test_product_performance(spark, sf_dir, st):
    prod = retail_views.products(spark, sf_dir)
    perf = gold.product_performance(st, prod)
    rows = perf.collect()
    assert len(rows) == st.select("product_id").distinct().count()
    assert sum(r["times_sold"] for r in rows) == 6000
    assert all(r["avg_price"] > 0 for r in rows)


def test_store_performance(spark, sf_dir, st):
    strs = retail_views.stores(spark, sf_dir)
    perf = gold.store_performance(st, strs).collect()
    assert 0 < len(perf) <= 10  # supplier dim is tiny
    assert all(r["total_revenue"] > 0 for r in perf)


def test_store_revenue_equals_lambda_udaf_semantics(st):
    """The reference's ad-hoc lambda UDAF (load.py:255) == native
    sum(unit_price*quantity)."""
    expected = st.select(
        F.round(F.sum(F.col("unit_price") * F.col("quantity")), 2).alias("t")
    ).first()["t"]
    got = (
        st.withColumn("r", F.col("unit_price") * F.col("quantity"))
        .groupBy()
        .agg(F.round(F.sum("r"), 2).alias("t"))
        .first()["t"]
    )
    assert abs(expected - got) < 0.01
