"""Physical-plan audit: for a set of headline queries, extract the
plan-health signals the 100 TB design cares about — exchange (shuffle)
count, broadcast vs sort-merge joins, parquet pushdown, whole-stage
codegen coverage, and the operators that would be red flags at scale
(CartesianProduct / BroadcastNestedLoopJoin on data-scaling sides).

Writes PLANS.md.  Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from retail_etl_pipeline_airflow_s3_athena_spark import get_spark
from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    release_cached,
)

# r12 (VERDICT r11 #1): the audit covers EVERY queries() entry —
# generated from the registry so a new query can never ship without a
# plan-invariant row.  The list is registry-ordered (the order bench
# and the gate run in, and the order the r12 full-complement scan
# validated).  HEADLINE below marks the subset main() EXECUTES
# (collect) before auditing so AQE-finalized signals (broadcast
# rewrites, pushdown) are real; the rest are audited build-only —
# window/cartesian/BNLJ presence is static.  (AUDIT is assigned
# right after HEADLINE.)

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "daily_sales_summary",
    "top_customers",
    "gold_store_daily",
    "gold_store_compacted",
    "gold_store_top_customers",
    "gold_store_products",
    "gold_stream_daily",
    "wav_features",
    "mjpeg_frame_luma",
    "gif_frame_luma",
    "warc_ingest_docs",
    "tar_ingest_docs",
    "media_type_census",
    "wav_band_energy",
    "video_near_dup",
    "audio_near_dup",
    "html_extract_docs",
    "gold_store_retained",
    "url_canonical_dedup",
    "multimodal_training_set",
    "multimodal_manifest",
    "crawl_to_training_set",
    "crawl_dedup_report",
    "jsonl_roundtrip",
    "multimodal_manifest_diff",
    "robots_rules_parsed",
    "robots_filter_captures",
    "crawl_admitted_training_set",
    "sitemap_urls_parsed",
    "crawl_coverage_report",
    "compression_signals",
    "ann_index_deleted_topk",
    "ann_index_delete_compacted",
    "near_dup_pairs",
    "simhash_near_dup",
    "embedding_near_dup_lsh",
    "ivf_topk",
    "winnow_fingerprints",
    "cms_heavy_hitters",
    "bloom_decontaminate",
    "knn_graph",
    "encode_token_ids",
    "build_training_set",
    "basket_rules",
    "rolling_distinct_users",
    "sessionize_events",
    "asof_join_events",
    "funnel_conversion",
    "nation_market_share",
    "dedup_keep_best",
    "source_overlap",
    "nation_year_profit",
    "customer_value_tiles",
    "dsir_importance",
    "source_entropy",
    "tfidf_top_terms",
    "bpe_doc_tokens",
    "bpe_encode_docs",
    "pq_topk",
    "ivf_pq_topk",
    "dup_spans",
    "strip_dup_spans",
    "mixing_sample",
    "order_value_quantiles",
    "pq_recall",
    "length_model_outliers",
    "zorder_layout",
    "data_card",
    "near_dup_recall",
    "curriculum_mix",
    "event_key_skew",
    "length_drift_chisq",
    "source_token_kl",
    "snapshot_value_psi",
    "training_manifest",
    "manifest_diff",
    "salted_segment_order_stats",
    "ivf_pq_residual_topk",
    "png_features",
    "image_near_dup",
    "stored_near_dups",
    "store_ingest_loop",
    "store_compacted_dedup",
    "ann_index_topk",
    "ann_index_append_topk",
    "bpe_encode_persisted",
    "pq_sdc_near_dup",
    "ann_index_compacted_topk",
    "ann_index_staleness",
    "unigram_encode_docs",
    "unigram_encode_persisted",
    "quality_model_scores",
    "jpeg_features",
    "ann_index_rebuilt_topk",
]

AUDIT = list(entrymod.queries())
assert set(HEADLINE) <= set(AUDIT), sorted(set(HEADLINE) - set(AUDIT))


def _unpartitioned_windows(plan: str) -> int:
    """Count Window operators with an EMPTY partition spec — the
    single-task bottleneck.  An unpartitioned ORDERED window prints
    ``Window [exprs], [order]`` (2 top-level groups, the second being
    sort orders with ASC/DESC); a partitioned one prints 3 groups, and
    a partition-only window (groupBy-like frame, scales fine) prints
    2 groups whose second is bare partition columns WITHOUT a sort
    direction — the direction token is what distinguishes them."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"(?:^|\s)Window (\[.*)$", line)
        if not m:
            continue
        depth, groups, spans = 0, 0, []
        for i, ch in enumerate(m.group(1)):
            if ch == "[":
                if depth == 0:
                    groups += 1
                    spans.append([i, None])
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    spans[-1][1] = i
        if groups != 2 or spans[-1][1] is None:
            continue
        last = m.group(1)[spans[-1][0]: spans[-1][1]]
        if " ASC" in last or " DESC" in last:
            n += 1
    return n


def audit_one(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    return {
        "name": name,
        "exchanges": sum(1 for l in lines if re.search(r"^\s*[+:\-\s]*Exchange", l)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # executedPlan prints codegen spans as "*(n) Operator"
        "codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "global_window": _unpartitioned_windows(plan),
        "pushed": bool(
            [l for l in lines if "PushedFilters: [" in l and "PushedFilters: []" not in l]
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rows = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        # collect() executes THIS DataFrame's queryExecution, flipping
        # AdaptiveSparkPlan to isFinalPlan=true with codegen spans
        # annotated (count() would finalize a different execution).
        # Only the HEADLINE subset is executed — the scale-killer
        # signals (windows/cartesians/BNLJ) are static, so the rest
        # of the registry is audited build-only (cheap)
        if name in HEADLINE:
            df.collect()
        rows.append(audit_one(name, df))
        release_cached(df)
        spark.catalog.clearCache()

    out = [
        "# Physical-plan audit (generated by tools/plan_audit.py)",
        "",
        f"Signals extracted from `executedPlan` at `{sf_dir}` for",
        "EVERY `queries()` entry (r12: registry-generated — a query",
        "cannot ship un-audited).  The HEADLINE subset is executed",
        "(AQE-finalized plans: broadcast rewrites + pushdown real);",
        "the rest are audited build-only — the scale-killer signals",
        "(global windows, cartesians, BNLJ) are static.",
        "Exchanges = shuffle boundaries in the final plan (AQE may",
        "coalesce further at runtime).  NOTE: operators that persist a",
        "shared intermediate (e.g. the near-dup pipelines' flat-shingle",
        "table) reprint that subtree's exchanges once per consumer in",
        "the plan TEXT — the runtime executes the cached subtree once,",
        "so high textual counts there overstate actual shuffles.  `bnlj`/`cartesian` are red",
        "flags unless one side is a bounded broadcast.  The audited",
        "non-zero cases are all bounded by construction:",
        "`rolling_distinct_users` (day-range join against a",
        "calendar-bounded day list), 1-row scalar crossJoins, the",
        "K-row broadcast centroid crossJoins of the IVF routing",
        "(`ivf_topk`/`ivf_pq_topk` — every vector scores K bounded",
        "cells; the argmax then partial-aggregates map-side), and the",
        "deterministic-log2 msb lookup (functions/detmath.py — a",
        "non-equi join against a broadcast 51-row powers-of-two table;",
        "reprinted once per L() site in `dsir_*`/`source_entropy`/",
        "`tfidf_top_terms`/`customer_value_tiles` plan text), and the",
        "distributed-rank plumbing in `order_value_quantiles` (the",
        "#partitions-row triangular prefix-sum self-join of",
        "functions/ranking.py plus the 8-row broadcast percentile",
        "table — both sides bounded by cluster config / constants,",
        "never by data), and the drift family's rollup crossJoins",
        "(`length_drift_chisq`/`source_token_kl` — a ~50-row bin list,",
        "a 1-row grand total, and per-source totals broadcast onto a",
        "bounded rollup, reprinted per consumer of the persisted obs",
        "table).",
        "`codegen` counts distinct WholeStageCodegen",
        "spans (wider spans = more of the query fused into generated",
        "JVM loops).",
        "",
        "`globalWin` counts ORDERED Window operators with an EMPTY",
        "partition spec (the single-task bottleneck); partition-only",
        "windows (no sort) scale fine and are excluded.  The",
        "non-zero rows are bounded-by-construction vocabularies:",
        "`encode_token_ids`' small-vocabulary fast path (a rank window",
        "over at most WINDOW_VOCAB_MAX = 65536 rows; larger",
        "vocabularies dispatch to the distributed two-pass rank in",
        "functions/ranking.py, as does customer_value_tiles —",
        "globalWin 0) and `bpe_encode_docs`' piece-id numbering (vocab",
        "size <= |alphabet| + n_merges, independent of corpus size).",
        "",
        "| query | exchanges | broadcast joins | sort-merge | BNLJ | cartesian | codegen spans | TakeOrdered | globalWin | pushed filters |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['name']} | {r['exchanges']} | {r['bhj']} | {r['smj']} "
            f"| {r['bnlj']} | {r['cartesian']} | {r['codegen_spans']} "
            f"| {'y' if r['take_ordered'] else ''} "
            f"| {r['global_window']} "
            f"| {'y' if r['pushed'] else ''} |"
        )
    out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("\n".join(out[-len(rows) - 2 :]))


if __name__ == "__main__":
    main()
