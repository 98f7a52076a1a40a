"""Semantics tests for plans/relational.py — semi/anti/except shapes,
decorrelation, and window determinism (conftest SF_DIR fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.plans import relational


def test_semi_join_never_duplicates_orders(spark, sf_dir):
    # EXISTS semantics: each qualifying order counted once even when
    # several line items match the ship-after-order predicate.
    out = relational.late_shipment_priority(spark, sf_dir)
    total = out.agg(F.sum("order_count")).collect()[0][0]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
        )
    )
    assert total <= orders.count()
    # and no order key could appear twice: counts are per-priority of a
    # semi join, so the sum over priorities is a distinct-order count.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    manual = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert total == manual


def test_anti_join_complement(spark, sf_dir):
    # dormant + active partitions the customer table exactly.
    dormant_n = (
        relational.dormant_customers(spark, sf_dir)
        .agg(F.sum("n_customers"))
        .collect()[0][0]
    ) or 0
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    recent = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP_NTZ'{relational.DORMANT_CUTOFF}"
            " 00:00:00'"
        )
    )
    active_n = (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
        .count()
    )
    assert dormant_n + active_n == cust.count()


def test_churned_buyers_truly_churned(spark, sf_dir):
    churned = relational.churned_buyers(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    after = orders.filter(
        F.expr(
            f"o_orderdate >= TIMESTAMP_NTZ'{relational.CHURN_SPLIT} 00:00:00'"
        )
    )
    overlap = churned.join(
        after, churned.c_custkey == after.o_custkey, "left_semi"
    ).count()
    assert overlap == 0


def test_small_quantity_filter_is_strict_subset(spark, sf_dir):
    row = relational.small_quantity_revenue(spark, sf_dir).collect()[0]
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert 0 < row["n_small_lines"] < li_n
    assert row["total_revenue"] > 0


def test_big_orders_threshold_and_order(spark, sf_dir):
    rows = relational.big_orders(spark, sf_dir).collect()
    assert all(r["total_qty"] > relational.BIG_ORDER_QTY for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_daily_delta_reconstructs_revenue(spark, sf_dir):
    rows = relational.daily_revenue_delta(spark, sf_dir).collect()
    assert rows[0]["delta"] is None  # no predecessor for the first day
    for prev, cur in zip(rows, rows[1:]):
        if cur["delta"] is not None:
            assert abs((cur["revenue"] - prev["revenue"]) - cur["delta"]) < 1e-6


def test_quartiles_balanced_and_ranked(spark, sf_dir):
    rows = relational.customer_value_tiles(spark, sf_dir).collect()
    counts = {}
    for r in rows:
        counts[r["quartile"]] = counts.get(r["quartile"], 0) + 1
    assert set(counts) == {1, 2, 3, 4}
    assert max(counts.values()) - min(counts.values()) <= 1  # NTILE balance
    top = min(rows, key=lambda r: r["pct_rank"])
    assert top["total_spend"] == max(r["total_spend"] for r in rows)


def test_cheapest_part_supplier_is_true_argmin(spark, sf_dir):
    rows = relational.cheapest_part_supplier(spark, sf_dir).collect()
    assert len(rows) > 0
    # one row per part, and the chosen unit price is the true minimum
    parts = [r["p_partkey"] for r in rows]
    assert len(parts) == len(set(parts))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter("p_size = 1")
    true_min = {
        r["l_partkey"]: r["m"]
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(F.min(F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 1e6 + 0.5) / 1e6).alias("m"))
        .collect()
    }
    for r in rows:
        assert r["unit_price"] == true_min[r["p_partkey"]]


def test_nation_trade_volume_excludes_domestic(spark, sf_dir):
    rows = relational.nation_trade_volume(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["supp_nation"] != r["cust_nation"] for r in rows)
    years = {r["order_year"] for r in rows}
    assert all(1990 < y < 2100 for y in years)


def test_part_supplier_breadth_excludes_negative_balance(spark, sf_dir):
    bad = {
        r["s_suppkey"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter("s_acctbal < 0")
        .collect()
    }
    # (sf0.001 has no negative-balance suppliers — the exclusion set may
    # legitimately be empty; sf0.01+ exercise it, as does the oracle)
    # recompute one group's count manually including exclusion
    rows = relational.part_supplier_breadth(spark, sf_dir).collect()
    assert len(rows) > 0
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    g0 = rows[0]
    manual = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(
            (F.col("p_brand") == g0["p_brand"])
            & (F.col("p_type") == g0["p_type"])
            & (~F.col("l_suppkey").isin(list(bad)))
        )
        .select("l_suppkey")
        .distinct()
        .count()
    )
    assert manual == g0["supplier_cnt"]


def test_promo_part_suppliers_meet_threshold(spark, sf_dir):
    rows = relational.promo_part_suppliers(spark, sf_dir).collect()
    assert len(rows) > 0
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    promo = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        "p_type = 'PROMO'"
    )
    qty = {
        r["l_suppkey"]: r["q"]
        for r in li.join(promo, li.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    qualifying = {k for k, v in qty.items() if v > relational.PROMO_QTY_THRESHOLD}
    assert {r["s_suppkey"] for r in rows} == qualifying


def test_customer_order_distribution_preserves_zero_bucket(spark, sf_dir):
    # Q13 shape: the left outer join must keep customers with no
    # qualifying orders in a c_count=0 bucket, and the distribution
    # must cover every customer exactly once.
    out = relational.customer_order_distribution(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority <> '1-URGENT'"
    )
    assert sum(r["custdist"] for r in out) == cust.count()
    with_orders = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .select("o_custkey").distinct().count()
    )
    zero = {r["c_count"]: r["custdist"] for r in out}.get(0, 0)
    assert zero == cust.count() - with_orders


def test_lone_late_supplier_counts_are_sole_late(spark, sf_dir):
    # every (order, supplier) credited to numwait must be the ONLY late
    # supplier in a multi-supplier finished order — recompute one
    # supplier's count by brute force
    rows = relational.lone_late_supplier(spark, sf_dir).collect()
    assert rows, "expected non-empty top-20"
    # descending numwait with s_name tie-break
    pairs = [(r["numwait"], r["s_name"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderstatus = 'F'"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate")
            + F.expr(f"INTERVAL {relational.LATE_DAYS} DAYS")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late"),
    ).collect()
    ok_orders = {
        r["l_orderkey"] for r in per_order
        if r["n_supp"] > 1 and r["n_late"] == 1
    }
    supp = {
        r["s_suppkey"]: r["s_name"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    late = (
        lo.filter("late").select("l_orderkey", "l_suppkey").distinct()
        .collect()
    )
    manual: dict[str, int] = {}
    for r in late:
        if r["l_orderkey"] in ok_orders:
            name = supp[r["l_suppkey"]]
            manual[name] = manual.get(name, 0) + 1
    top = sorted(manual.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(n, c) for c, n in pairs] == [(n, c) for n, c in top]


def test_above_avg_dormant_value_threshold_and_dormancy(spark, sf_dir):
    out = relational.above_avg_dormant_value(spark, sf_dir).collect()
    assert out, "expected non-empty rollup"
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    avg_bal = cust.filter("c_acctbal > 0").agg(F.avg("c_acctbal")).collect()[0][0]
    recent = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        f"o_orderdate >= TIMESTAMP_NTZ'{relational.DORMANT_CUTOFF} 00:00:00'"
    )
    manual = (
        cust.filter(F.col("c_acctbal") > round(avg_bal, 2))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .count()
    )
    assert sum(r["n_customers"] for r in out) == manual


def test_supplier_revenue_share_cutoff_is_relative(spark, sf_dir):
    out = relational.supplier_revenue_share(spark, sf_dir).collect()
    assert out, "expected suppliers above the relative cutoff"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("r")
    ).collect()
    revs = [r["r"] for r in per]
    cutoff = round(relational.REVENUE_SHARE_FACTOR * sum(revs) / len(revs), 2)
    expected = {r["l_suppkey"] for r in per if r["r"] > cutoff}
    assert {r["s_suppkey"] for r in out} == expected
    # shares sum to less than 1 and every reported share beats 1/n
    assert all(0 < r["revenue_share"] < 1 for r in out)


def test_discount_band_revenue_scan_only(spark, sf_dir):
    out = relational.discount_band_revenue(spark, sf_dir)
    row = out.collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    assert row["n_lines"] == li.count()
    assert row["forecast_revenue"] > 0
    # scan-only query: the optimized plan must contain no join at all
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_nation_year_profit_bounded_output(spark, sf_dir):
    out = relational.nation_year_profit(spark, sf_dir).collect()
    assert out
    nations = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    years = 8  # 1995..2002 data span
    assert len(out) <= nations * years
    # only parts whose name carries the token contribute
    assert all(r["sum_profit"] > 0 for r in out)


def test_returned_item_customers_top20_deterministic(spark, sf_dir):
    a = relational.returned_item_customers(spark, sf_dir).collect()
    b = relational.returned_item_customers(spark, sf_dir).collect()
    assert a == b
    assert len(a) <= 20
    revs = [r["lost_revenue"] for r in a]
    assert revs == sorted(revs, reverse=True)


def test_linestatus_priority_mix_partitions_lines(spark, sf_dir):
    out = relational.linestatus_priority_mix(spark, sf_dir).collect()
    total = sum(r["high_line_count"] + r["low_line_count"] for r in out)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
    )
    # every 1997-shipped line lands in exactly one (status, priority) cell
    assert total == li.count()


def test_top_revenue_supplier_is_argmax(spark, sf_dir):
    out = relational.top_revenue_supplier(spark, sf_dir).collect()
    assert out
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1997-04-01 00:00:00'"
        )
    )
    per = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("r")
    ).collect()
    best = max(r["r"] for r in per)
    expect = {r["l_suppkey"] for r in per if r["r"] == best}
    assert {r["s_suppkey"] for r in out} == expect


def test_segment_year_cube_lattice(spark, sf_dir):
    rows = relational.segment_year_cube(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    # grand-total cell (both grouping columns NULL) equals the order count
    gt = [
        r for r in rows
        if r["c_mktsegment"] is None and r["order_year"] is None
    ]
    assert len(gt) == 1 and gt[0]["n_orders"] == n_orders
    # per-segment margins sum to the grand total
    seg_margin = [
        r for r in rows
        if r["c_mktsegment"] is not None and r["order_year"] is None
    ]
    assert sum(r["n_orders"] for r in seg_margin) == n_orders
    # detail cells roll up into each segment margin
    detail = [
        r for r in rows
        if r["c_mktsegment"] is not None and r["order_year"] is not None
    ]
    by_seg: dict[str, int] = {}
    for r in detail:
        by_seg[r["c_mktsegment"]] = (
            by_seg.get(r["c_mktsegment"], 0) + r["n_orders"]
        )
    assert by_seg == {r["c_mktsegment"]: r["n_orders"] for r in seg_margin}


def test_anomalous_revenue_days_integer_exact(spark, sf_dir):
    out = relational.anomalous_revenue_days(spark, sf_dir).collect()
    # the filter is pure 64-bit integer arithmetic: re-deriving it from
    # the same cents rollup must agree exactly
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    daily = {
        r["sale_date"]: r["cents"]
        for r in li.groupBy(F.to_date("l_shipdate").alias("sale_date"))
        .agg(F.floor(F.sum(rev) * 100 + F.lit(0.5)).alias("cents"))
        .collect()
    }
    n = len(daily)
    s = sum(daily.values())
    devs = {d: abs(c * n - s) for d, c in daily.items()}
    t = sum(devs.values())
    expect = sorted(
        d for d, dev in devs.items()
        if n * dev > relational.ANOMALY_K * t
    )
    assert [r["sale_date"] for r in out] == expect
    assert all(r["mad_ratio"] > relational.ANOMALY_K for r in out)


def test_customer_order_gaps_match_manual(spark, sf_dir):
    out = {
        r["c_mktsegment"]: r
        for r in relational.customer_order_gaps(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["o_orderdate"], r["o_orderkey"])
        )
    gaps: dict[str, list[int]] = {}
    for ck, lst in by_cust.items():
        lst.sort()
        for (d1, _), (d2, _) in zip(lst, lst[1:]):
            gaps.setdefault(cust[ck], []).append((d2.date() - d1.date()).days)
    for seg, lst in gaps.items():
        assert out[seg]["n_gaps"] == len(lst)
        assert out[seg]["max_gap_days"] == max(lst)


def test_brand_corr_matches_native_corr(spark, sf_dir):
    # explicit-moment formula vs Spark's native corr aggregate
    out = {
        r["p_brand"]: r["corr_qty_price"]
        for r in relational.brand_corr_stats(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    native = {
        r["p_brand"]: r["c"]
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert out, "expected per-brand correlations"
    for brand, c in out.items():
        assert abs(c - native[brand]) < 1e-4
        assert -1.0 <= c <= 1.0
