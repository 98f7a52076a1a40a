"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

The comparable baseline (BASELINE.md) is the reference's compute path:
pandas transform+gold+quality ~= 9 s for ~11.6k input rows.  We run the
same logical workload (4 gold builders + 4 analytics queries + the
flagship wide agg) at sf0.1 (~600k lineitem rows).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from retail_etl_pipeline_airflow_s3_athena_spark import get_spark

HEADLINE = [
    # retail surface (reference parity)
    "daily_sales_summary",
    "top_customers",
    "product_performance",
    "store_performance",
    "daily_revenue",
    "top_performing_customers",
    "product_analysis",
    "revenue_by_category",
    "pricing_summary",
    # training-data extensions (one per family)
    "text_features",
    "dedup_exact",
    "minhash_signatures",
    "near_dup_pairs",
    "cosine_topk",
    "embedding_near_dup_gemm",
    "windowed_event_stats",
    "sessionize_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JVM/codegen warmup on the tiniest SF so we measure the query, not
    # class loading.
    qs["pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
