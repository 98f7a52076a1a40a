"""Time a SUBSET of declared queries with bench.py's methodology
(warmup run at sf0.001, then min-of-N at $SPARK_GRAFT_SF_DIR), so an
optimization loop can iterate on one family without paying the full
240-query bench.  Usage:

    python tools/bench_subset.py q1 q2 ...          # min-of-2 (default)
    BENCH_ITERS=3 python tools/bench_subset.py q1   # min-of-3

Prints one JSON line {name: sec}.  NOT part of the driver contract —
bench.py stays the single headline harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from retail_etl_pipeline_airflow_s3_athena_spark import get_spark
from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_subset.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        wdf = qs[n](spark, warm_dir)
        wdf.collect()
        release_cached(wdf)
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for _ in range(iters):
        for n in names:
            spark.sparkContext.setJobDescription(n)
            t0 = time.time()
            df = qs[n](spark, sf_dir)
            df.collect()
            dt = time.time() - t0
            release_cached(df)
            if n not in timings or dt < timings[n]:
                timings[n] = round(dt, 3)
        spark.catalog.clearCache()
    print(json.dumps({"total": round(sum(timings.values()), 3), **timings}))


if __name__ == "__main__":
    main()
