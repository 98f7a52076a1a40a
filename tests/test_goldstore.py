"""Incremental gold-table maintenance (plans/goldstore.py).

The reference recomputes gold from scratch per DAG run
(scripts/load.py:137-213); the store makes the daily loop O(batch):
mergeable exact-integer partials per batch partition, idempotent
replay by partition overwrite, serve = one small merge, compaction
folds history.  Every test pins bit-identity against the from-scratch
plans/gold.py computation on the same rows.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.plans import gold, goldstore, retail_views

SPLIT1 = "1998-06-01"
SPLIT2 = "1998-09-01"


def _batches(spark, sf_dir):
    st = retail_views.sale_transactions(spark, sf_dir)
    d = F.to_date("order_date")
    return (
        st,
        st.filter(d < SPLIT1),
        st.filter((d >= SPLIT1) & (d < SPLIT2)),
        st.filter(d >= SPLIT2),
    )


@pytest.fixture(scope="module")
def founded(spark, sf_dir):
    """A store founded from b0 with b1, b2 ingested (b1 replayed once
    mid-loop — the retry case)."""
    st, b0, b1, b2 = _batches(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_t_")
    goldstore.write_gold_partials(b0, path, "founding")
    goldstore.write_gold_partials(b1, path, "b1")
    goldstore.write_gold_partials(b1, path, "b1")  # idempotent replay
    goldstore.write_gold_partials(b2, path, "b2")
    return path, st


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_serve_matches_from_scratch_bitwise(spark, founded):
    """The merged daily summary equals gold.daily_sales_summary on the
    union of all batches — exact equality including the float revenue
    (both sides divide the same exact integer by 100.0 once)."""
    path, st = founded
    served = _rows(goldstore.serve_gold_daily(spark, path))
    direct = _rows(gold.daily_sales_summary(st))
    assert served == direct
    assert len(served) > 0


def test_replay_is_idempotent(spark, sf_dir, founded):
    """Re-ingesting an already-ingested batch changes nothing (the
    partition is overwritten, not appended)."""
    path, _ = founded
    before = _rows(goldstore.serve_gold_daily(spark, path))
    _, _, b1, _ = _batches(spark, sf_dir)
    goldstore.write_gold_partials(b1, path, "b1")
    assert _rows(goldstore.serve_gold_daily(spark, path)) == before


def test_compaction_preserves_and_bounds(spark, sf_dir):
    st, b0, b1, b2 = _batches(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_c_")
    goldstore.write_gold_partials(b0, path, "founding")
    goldstore.write_gold_partials(b1, path, "b1")
    before = _rows(goldstore.serve_gold_daily(spark, path))
    stats = goldstore.compact_gold_daily(spark, path)
    assert stats["batches_after"] == 1
    assert _rows(goldstore.serve_gold_daily(spark, path)) == before
    # the loop continues after compaction: a NEW batch still merges
    goldstore.write_gold_partials(b2, path, "b2")
    assert _rows(goldstore.serve_gold_daily(spark, path)) == _rows(
        gold.daily_sales_summary(st)
    )


def test_top_customers_store_matches_from_scratch(spark, sf_dir):
    st, b0, b1, b2 = _batches(spark, sf_dir)
    customers = retail_views.customers(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_s_")
    goldstore.write_spend_partials(b0, path, "founding")
    goldstore.write_spend_partials(b1, path, "b1")
    goldstore.write_spend_partials(b2, path, "b2")
    goldstore.write_spend_partials(b2, path, "b2")  # replay
    served = _rows(goldstore.serve_gold_top_customers(spark, path, customers))
    direct = _rows(gold.top_customers(st, customers))
    assert served == direct


def test_serve_reads_only_the_store(spark, founded):
    """The serve plan scans the partial store, not the fact table: no
    join in the plan, exactly one aggregate exchange, and the scan's
    read schema is the partial columns."""
    path, _ = founded
    plan = goldstore.serve_gold_daily(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan and "orders.parquet" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(sale_date") <= 1


def test_bad_batch_id_rejected(spark, sf_dir):
    _, b0, _, _ = _batches(spark, sf_dir)
    with pytest.raises(ValueError):
        goldstore.write_gold_partials(b0, "/tmp/x", "a/b")
    with pytest.raises(ValueError):
        goldstore.write_gold_partials(b0, "/tmp/x", "a=b")


def test_product_store_avg_decomposition_matches_from_scratch(spark, sf_dir):
    """The AVG-shaped final: avg_price from merged (sum, count)
    partials divided once at serve equals the from-scratch
    gold.product_performance bit-for-bit (money_avg's exact order)."""
    st, b0, b1, b2 = _batches(spark, sf_dir)
    products = retail_views.products(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_p_")
    goldstore.write_product_partials(b0, path, "founding")
    goldstore.write_product_partials(b1, path, "b1")
    goldstore.write_product_partials(b2, path, "b2")
    goldstore.write_product_partials(b2, path, "b2")  # replay
    served = _rows(
        goldstore.serve_gold_product_performance(spark, path, products)
    )
    direct = _rows(gold.product_performance(st, products))
    assert served == direct


def test_retention_preserves_serve_and_bounds_window(spark, sf_dir):
    """retain_gold_daily folds expired dates into __compacted__ and
    drops them from live batch partitions; serve stays bit-identical
    to the from-scratch recompute (r9 verdict #6)."""
    st, b0, b1, b2 = _batches(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_ret_")
    goldstore.write_gold_partials(b0, path, "founding")
    goldstore.write_gold_partials(b1, path, "b1")
    goldstore.write_gold_partials(b2, path, "b2")
    before = _rows(goldstore.serve_gold_daily(spark, path))

    info = goldstore.retain_gold_daily(spark, path, keep_days=120)
    assert info["folded_dates"] > 0
    after = _rows(goldstore.serve_gold_daily(spark, path))
    assert after == before  # bit-identical to full recompute
    direct = _rows(gold.daily_sales_summary(st))
    assert after == direct

    # expired dates now live ONLY in the compacted partition
    store = spark.read.parquet(path)
    cutoff = info["cutoff"]
    live_old = store.filter(
        (F.col("batch") != goldstore.COMPACTED)
        & (F.col("sale_date") <= F.lit(cutoff).cast("date"))
    ).count()
    assert live_old == 0
    assert goldstore.read_gold_watermark(spark, path) == cutoff


def test_retention_refuses_replay_behind_watermark(spark, sf_dir):
    """After retention, re-ingesting a batch whose dates were folded
    must be refused (double-count hazard); batches entirely ahead of
    the watermark still ingest and serve exactly."""
    st, b0, b1, b2 = _batches(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_wm_")
    goldstore.write_gold_partials(b0, path, "founding")
    goldstore.write_gold_partials(b1, path, "b1")
    goldstore.retain_gold_daily(spark, path, keep_days=120)

    with pytest.raises(ValueError, match="watermark"):
        goldstore.write_gold_partials(b0, path, "founding")

    # b2 (all dates >= 1998-09-01, ahead of any 120-day-behind-frontier
    # cutoff of the b0∪b1 store) ingests fine and the serve matches
    # the full recompute over b0∪b1∪b2
    goldstore.write_gold_partials(b2, path, "b2")
    served = _rows(goldstore.serve_gold_daily(spark, path))
    direct = _rows(gold.daily_sales_summary(st))
    assert served == direct


def test_streaming_loop_composes_with_retention(spark, sf_dir):
    """The full lifecycle under the STREAMING writer: stream
    micro-batches into the partial store, RETAIN mid-stream, keep
    ingesting ahead of the watermark — serve stays bit-identical to
    the batch recompute, and a replay of a folded early batch is
    refused (write_gold_partials is the foreachBatch sink, so the
    guard protects the streaming path too)."""
    st, b0, b1, b2 = _batches(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="goldstore_stream_ret_")
    # streamed history: the foreachBatch sink is write_gold_partials
    # keyed by batch_id — drive it directly (the micro-batch contract)
    goldstore.write_gold_partials(b0, path, "0")
    goldstore.write_gold_partials(b1, path, "1")
    goldstore.retain_gold_daily(spark, path, keep_days=120)
    with pytest.raises(ValueError, match="watermark"):
        goldstore.write_gold_partials(b0, path, "0")  # crash-replay of 0
    goldstore.write_gold_partials(b2, path, "2")
    goldstore.write_gold_partials(b2, path, "2")  # replay AHEAD: fine
    served = _rows(goldstore.serve_gold_daily(spark, path))
    assert served == _rows(gold.daily_sales_summary(st))
