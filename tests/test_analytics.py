"""The 4 canonical Athena queries via spark.sql (reference
scripts/athena_queries.py:74-126)."""

from __future__ import annotations

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.plans import analytics


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    analytics.register_gold_views(spark, sf_dir)


def test_daily_revenue(spark):
    rows = spark.sql(analytics.ANALYTICS_SQL["daily_revenue"]).collect()
    assert 0 < len(rows) <= 10
    dates = [r["sale_date"] for r in rows]
    assert dates == sorted(dates, reverse=True)
    assert all(r["revenue"] > 0 for r in rows)
    assert all(r["avg_item_value"] is not None for r in rows)


def test_top_performing_customers(spark):
    rows = spark.sql(analytics.ANALYTICS_SQL["top_performing_customers"]).collect()
    assert len(rows) == 5
    assert all(r["avg_order_value"] > 0 for r in rows)


def test_product_analysis_scalar_subquery(spark):
    rows = spark.sql(analytics.ANALYTICS_SQL["product_analysis"]).collect()
    assert len(rows) == 10
    # popularity normalized by MAX(times_sold): top row == 1.0
    assert rows[0]["popularity_score"] == 1.0
    assert all(0 < r["popularity_score"] <= 1.0 for r in rows)


def test_revenue_by_category(spark):
    rows = spark.sql(analytics.ANALYTICS_SQL["revenue_by_category"]).collect()
    assert len(rows) > 1
    revs = [r["estimated_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_daily_revenue_ma7_gap_aware(spark):
    import datetime as dt

    rows = spark.sql(analytics.ANALYTICS_SQL["daily_revenue_ma7"]).collect()
    assert len(rows) > 7
    by_date = {r["sale_date"]: r["revenue"] for r in rows}
    # recompute the RANGE frame manually: all days within 6 calendar
    # days BEFORE each row's date (gap-aware, unlike a ROWS frame)
    for r in rows[:50]:
        frame = [
            v
            for d, v in by_date.items()
            if dt.timedelta(0) <= r["sale_date"] - d <= dt.timedelta(days=6)
        ]
        import math

        expected = math.floor(sum(frame) / len(frame) * 1e4 + 0.5) / 1e4
        assert abs(r["ma7_revenue"] - expected) < 1e-9
