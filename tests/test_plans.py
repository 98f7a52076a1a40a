"""Physical-plan shape assertions: the scale properties SCALE.md
claims (broadcasts, pushdown, column pruning, no nested loops) pinned
against the plans Catalyst actually produces, so a regression in plan
shape fails CI even while results stay correct."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from pyspark.sql import functions as F
from retail_etl_pipeline_airflow_s3_athena_spark.plans import gold, retail_views


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_gold_dim_joins_broadcast(spark, sf_dir):
    st = retail_views.sale_transactions(spark, sf_dir)
    cust = retail_views.customers(spark, sf_dir)
    plan = _plan(gold.top_customers(st, cust))
    # the spend ⋈ customers dim join must build a broadcast side; the
    # upstream fact⋈fact join inside the view legitimately plans
    # sort-merge pre-AQE (AQE converts it at runtime from real sizes)
    dim_join_lines = [
        l for l in plan.splitlines() if "Join" in l and "customer_id" in l
    ]
    assert dim_join_lines, plan
    assert all("BroadcastHashJoin" in l for l in dim_join_lines)


def test_top_customers_plans_take_ordered(spark, sf_dir):
    st = retail_views.sale_transactions(spark, sf_dir)
    cust = retail_views.customers(spark, sf_dir)
    plan = _plan(gold.top_customers(st, cust))
    # top-k must be TakeOrderedAndProject (per-partition heap + k-row
    # driver merge), never a global sort feeding a limit
    assert "TakeOrderedAndProject" in plan


def test_pricing_summary_prunes_and_partially_aggregates(spark, sf_dir):
    qs = entry.queries()
    df = qs["pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    # column pruning reaches the parquet scan: unreferenced columns
    # (shipdate, partkey, suppkey) are absent from ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "l_shipdate" not in read_schema[0]
    assert "l_partkey" not in read_schema[0]
    # two-phase hash aggregation (map-side partial before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_shipping_priority_pushes_date_filters(spark, sf_dir):
    qs = entry.queries()
    df = qs["shipping_priority"](spark, sf_dir)
    plan = _plan(df)
    # the date predicates must reach the parquet scans as pushed filters
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_orderdate" in l for l in pushed), plan
    assert any("l_shipdate" in l for l in pushed), plan


def test_no_nested_loop_joins_in_relational_queries(spark, sf_dir):
    qs = entry.queries()
    for name in (
        "late_shipment_priority",
        "part_supplier_breadth",
        "promo_part_suppliers",
        "nation_trade_volume",
        "local_supplier_volume",
    ):
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        # (BroadcastNestedLoopJoin appears legitimately only for
        # 1-row scalar-aggregate cross joins, which none of these use)
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_write_clustered_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """Every output file covers a disjoint o_orderkey range (the
    property parquet min/max skipping needs), and a point-lookup scan
    reads a subset of the files."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.sources import writers

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_clustered")
    writers.write_clustered(orders, out, ["o_orderkey"], n_files=8)

    files = [
        f"{out}/{f}" for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) == 8
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("o_orderkey"), F.max("o_orderkey"))
            .collect()[0]
        )
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges must not overlap"

    # point predicate: Spark's parquet reader prunes to the one file
    key = ranges[3][0]
    got = spark.read.parquet(out).filter(F.col("o_orderkey") == key)
    assert got.count() >= 1


def test_cms_probe_broadcasts_sketch(spark, sf_dir):
    """The <=4096-row sketch must be the broadcast side of the probe
    join; the vocabulary cut must plan TakeOrderedAndProject."""
    qs = entry.queries()
    plan = _plan(qs["cms_heavy_hitters"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_bitmap_broadcasts(spark, sf_dir):
    """The bitmap (<=8192 words) joins broadcast; no shuffle of the
    corpus probe side against it."""
    qs = entry.queries()
    plan = _plan(qs["bloom_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_knn_graph_no_cartesian(spark, sf_dir):
    """kNN merges per-chunk partial top-k rows — the plan must never
    contain a cartesian/nested-loop pair join."""
    qs = entry.queries()
    plan = _plan(qs["knn_graph"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_single_doc_shuffle(spark, sf_dir):
    """Fingerprint selection is a narrow pipeline: exactly one
    doc_id exchange feeds both the gram window and the selection
    frame (plus the final distinct's exchange) — no join anywhere."""
    qs = entry.queries()
    plan = _plan(qs["winnow_fingerprints"](spark, sf_dir))
    assert "Join" not in plan, plan
    # the window sort on (doc_id, gpos) must be reused, not re-shuffled:
    # hashpartitioning(doc_id) appears once pre-window
    n_doc_exchanges = sum(
        1 for l in plan.splitlines()
        if "Exchange hashpartitioning(doc_id" in l
    )
    assert n_doc_exchanges == 1, plan
