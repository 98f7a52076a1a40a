"""Physical-plan scale invariants, enforced as tests.

PLANS.md documents the plan shapes; this test makes the two
scale-killer classes REGRESSIONS instead of observations:

- an ORDERED Window with an empty partition spec (single-task global
  sort — the bottleneck class VERDICT r6 #1 removed from
  customer_value_tiles) may appear only in the two documented
  bounded-vocabulary fast paths;
- a CartesianProduct may appear only in the documented
  calendar/constant-bounded cases.

BroadcastNestedLoopJoins are NOT asserted to zero — every current
site is a bounded broadcast (1-row totals, ~50-row bin lists, K-row
centroid tables, the #partitions-row rank plumbing) and new bounded
sites are legitimate — but a PER-QUERY CEILING catches a query whose
plan suddenly sprouts an unbounded nest (the ceiling is the current
count + headroom of 2).

Plans are only BUILT (executedPlan), never executed, so the sweep is
cheap; whitelists must shrink-or-justify, never silently grow.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from plan_audit import AUDIT, audit_one  # noqa: E402

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached

# ordered-global-window sites: bounded by vocab construction
# (<= WINDOW_VOCAB_MAX = 65536 rows / |alphabet|+n_merges rows;
# unigram: |pieces| <= vocab_size + |alphabet| — the persisted-model
# encode path carries ZERO, the ids are persisted)
GLOBAL_WINDOW_OK = {
    "encode_token_ids": 2,
    "bpe_encode_docs": 2,
    "unigram_encode_docs": 1,
    # r12 (full-registry audit): day-grain post-agg running windows —
    # the input is one row per calendar day (the gold daily grain),
    # so the unpartitioned ordered window is bounded by the calendar,
    # not the data (VERDICT r11 reviewed daily_revenue_running live)
    "daily_revenue_running": 1,
    "daily_revenue_delta": 1,
    "daily_revenue_ma7": 1,
}

# cartesian sites: calendar-bounded day list (rolling window), the
# 1-row funnel total, the 1-row doc-count scalar in tf-idf, and the
# crawl report's 1-row x 1-row aggregate combine
CARTESIAN_OK = {
    "rolling_distinct_users": 2,
    "funnel_conversion": 1,
    "tfidf_top_terms": 2,
    "crawl_dedup_report": 2,
    # r12 (full-registry audit): 1-row scalar crossJoins — a grand
    # total / threshold aggregate broadcast onto the fact side
    "supplier_revenue_share": 1,   # total revenue scalar
    "above_avg_dormant_value": 1,  # avg-order-value threshold scalar
    "dq_summary_customer": 1,      # row-count x col-stat combine
    "anomalous_revenue_days": 3,   # mean/stddev scalars + their combine
    # size-dispatched exact path: all-pairs cosine runs ONLY under
    # EXACT_NEAR_DUP_MAX_ROWS (similarity.py:434 dispatch — above it
    # the rp-LSH bucketed path takes over); the cartesian is the
    # calibration-scale oracle twin, bounded by the dispatch constant
    "embedding_near_dup": 1,
    # reviewed r12: host_authority's dangling-mass redistribution —
    # one 1-row scalar aggregate (the dangling PR sum x the 1-row
    # host count) cross-joined back per iteration (3 iterations,
    # persisted-subtree reprints; measured 7 build-only)
    "host_authority_rank": 9,
}

# current BNLJ counts (all bounded-broadcast sites) + headroom of 2;
# queries absent here must stay BNLJ-free (+2 headroom from zero is
# NOT granted: a first BNLJ in a today-clean query needs review)
BNLJ_CEILING = {
    "ivf_topk": 6,
    "basket_rules": 4,
    "rolling_distinct_users": 4,
    "funnel_conversion": 3,
    "customer_value_tiles": 6,
    "dsir_importance": 4,
    "ivf_pq_topk": 6,
    "order_value_quantiles": 8,
    "length_model_outliers": 4,
    "zorder_layout": 4,
    "curriculum_mix": 38,
    "event_key_skew": 4,
    "length_drift_chisq": 6,
    "source_token_kl": 4,
    # textual reprint inflation: the residual corpus (persisted, runs
    # once) carries the centroid crossJoin in its lineage, and each
    # Lloyd-round consumer reprints it — two bounded K-row crossJoins
    # execute at runtime
    "ivf_pq_residual_topk": 40,
    # reviewed r8: ONE bounded crossJoin executes (<=n_queries rows x
    # K centroids, the probe scoring); the persisted `probed` subtree
    # reprints it in plan text per consumer + AQE initial/final copies
    "ann_index_topk": 8,
    "ann_index_append_topk": 8,
    # reviewed r9: same bounded probe/centroid crossJoins as the topk
    # siblings, reprinted per persisted-subtree consumer (measured 4);
    # staleness composes serve + fresh-retrain sides (measured 6)
    "ann_index_compacted_topk": 8,
    "ann_index_rebuilt_topk": 8,
    "ann_index_staleness": 8,
    # reviewed r11: the delete gates share the serve shape exactly
    # (bounded probe/centroid crossJoins, reprinted per persisted-
    # subtree consumer — measured 4 build-only / 6 executed); the
    # tombstone anti-join is a plain BroadcastHashJoin
    "ann_index_deleted_topk": 8,
    "ann_index_delete_compacted": 8,
    # reviewed r8: the bounded K-row centroid crossJoin of the IVF
    # cell assignment, reprinted in the persisted-subtree text
    "pq_sdc_near_dup": 6,
    # reviewed r10: the funnel report combines three 1-row aggregates
    # (captures / staged / curated counts) — 1x1 crossJoins only
    "crawl_dedup_report": 3,
    # r12 (full-registry audit) — measured + 2 headroom, every site a
    # bounded broadcast:
    # the K-row (label-count) centroid crossJoin of the Lloyd
    # assignment (similarity.py kmeans_fit — same family as the IVF
    # probe scoring)
    "kmeans_refine": 3,
    "kmeans_two_round": 4,
    # the broadcast 51-row powers-of-two msb table of the
    # deterministic-log2 lookup (functions/detmath.py), reprinted per
    # L() site / per persisted-subtree consumer
    "bigram_prob_score": 3,
    "dsir_select": 3,
    "dsir_stream_importance": 3,
    "chisq_stream_drift": 4,
    "kl_stream_drift": 3,
    # the n_queries-row broadcast query set of the brute-force cosine
    # baseline (similarity.py:113 — non-equi self-exclusion join)
    "cosine_topk": 3,
}


# the finalized-plan subset: AQE rewrites SMJ->BHJ at runtime, so
# broadcast/pushdown assertions need an EXECUTED plan (the
# .collect()-first discipline plan_audit.py uses); window/cartesian/
# BNLJ presence is static, so the rest of AUDIT stays build-only
EXECUTED = {"shipping_priority", "daily_sales_summary", "top_customers"}


@pytest.fixture(scope="module")
def audits(spark, sf_dir):
    import __spark_entry__ as entry
    from tests.conftest import run_query_sweep

    qs = entry.queries()
    out = {}

    def build(name, fn):
        df = fn(spark, sf_dir)
        if name in EXECUTED:
            df.collect()
        out[name] = audit_one(name, df)
        release_cached(df)

    run_query_sweep([(n, qs[n]) for n in AUDIT], build)
    return out


def test_no_unpartitioned_ordered_windows(audits):
    for name, a in audits.items():
        cap = GLOBAL_WINDOW_OK.get(name, 0)
        assert a["global_window"] <= cap, (
            f"{name}: {a['global_window']} unpartitioned ordered "
            f"Window(s) (allowed {cap}) — a single-task global sort "
            "at scale; use functions/ranking.py's two-pass rank"
        )


def test_no_undocumented_cartesians(audits):
    for name, a in audits.items():
        cap = CARTESIAN_OK.get(name, 0)
        assert a["cartesian"] <= cap, (
            f"{name}: {a['cartesian']} CartesianProduct(s) "
            f"(allowed {cap}) — document the bound or remove it"
        )


def test_bnlj_within_bounded_ceilings(audits):
    # A whitelisted bounded non-equi join prints as EITHER
    # CartesianProduct or BroadcastNestedLoopJoin depending on the
    # planner's size estimates — observed in-suite: the 1-row
    # revenue-total scalar of supplier_revenue_share flips to BNLJ
    # when other modules' session state shifts the estimate.  Bound
    # the SUM of both operators by the sum of both allowances: an
    # operator-form flip stays green, a NEW nest still fails.
    for name, a in audits.items():
        cap = BNLJ_CEILING.get(name, 0) + CARTESIAN_OK.get(name, 0)
        assert a["bnlj"] + a["cartesian"] <= cap, (
            f"{name}: {a['bnlj']} BroadcastNestedLoopJoin(s) + "
            f"{a['cartesian']} CartesianProduct(s) (combined ceiling "
            f"{cap}) — every bounded-broadcast site is whitelisted; "
            "new sites need review + a ceiling bump"
        )


def test_reference_core_stays_shuffle_lean(audits):
    """The four gold queries and the TPC-H-shape core keep broadcast
    dimension joins and pushed scans — the plan shapes BASELINE.md's
    throughput comparison rests on."""
    assert audits["top_customers"]["take_ordered"], "top-k must stay TakeOrderedAndProject"
    for name in ["shipping_priority", "daily_sales_summary", "top_customers"]:
        assert audits[name]["bhj"] >= 1, f"{name}: dimension join no longer broadcasts"
        assert audits[name]["pushed"], f"{name}: scan filters no longer push down"


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The automatic leg of the skew story (SCALE.md session defaults):
    a join with one pathological key must trigger AQE's
    OptimizeSkewedJoin — the finalized plan marks the sort-merge join
    skew=true — with results identical to the logical join.  Salting
    (salted_segment_order_stats) covers the case this optimizer can't;
    this test proves the default path actually engages."""
    from pyspark.sql import functions as F

    conf = spark.conf
    # pin EVERYTHING that decides the join strategy — the shared test
    # session is mutated by earlier tests (bucketing, invariance
    # sweeps), and a leaked broadcast threshold turns the SMJ this
    # test needs into a BHJ with no skew to split
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        ]
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.shuffle.partitions", "8")
        # 300k rows on ONE key + a uniform tail; dim side non-trivial
        fact = spark.range(0, 300_000).select(
            F.lit(7).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 30_000).select(
                (F.col("id") % 97 + 100).alias("k"), F.col("id").alias("v")
            )
        )
        dim = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        # NOTE: no groupBy on the join key downstream — AQE declines
        # to split skew when the split would break a partitioning a
        # downstream operator needs (forceOptimizeSkewedJoin=false);
        # the bare join is the shape the optimizer actually fixes
        joined = fact.join(dim, "k")
        rows = joined.collect()
        hot = sum(1 for r in rows if r["k"] == 7)
        assert hot == 300_000 and len(rows) == 330_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan, (
            "join was broadcast despite pinned -1 thresholds — "
            "skew split has nothing to act on"
        )
        assert "skew=true" in plan, (
            "AQE did not mark the skewed SMJ — the automatic skew "
            "mitigation the session defaults promise is not engaging"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
