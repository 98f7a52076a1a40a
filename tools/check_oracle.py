"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given scale factor, compare row count, column names, and an
order-insensitive canonicalized value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from retail_etl_pipeline_airflow_s3_athena_spark import get_spark  # noqa: E402
from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (  # noqa: E402
    release_cached,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    # r9 verdict #1: the driver's canonicalizer distinguishes Python
    # Decimal from int (quality_model_scores' decimal(38,0) margin was
    # driver-hash-red while str() here collapsed Decimal("42") and 42).
    # Mirror that strictness: a Decimal reaching a gate surface is a
    # bug the local gate must surface too.
    if isinstance(v, decimal.Decimal):
        return f"Decimal({v})"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision (round-trip repr), not %.9g: the r5 driver
        # caught nation_year_profit penny-off at sf0.1 while this gate
        # said PASS — %.9g collapsed 23431740.07 and 23431740.06's
        # underlying doubles' differing cent digits for values >= 1e7.
        # The gate must be at least as strict as the driver's
        # full-precision hash.
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Data-driven oracle twins (bpe.py's pure-Python BPE) recompute on
    # the SAME parquet this gate registers — export the dir so their
    # default (the driver's sf0.01) is overridden at other scales.
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            release_cached(sdf)  # the documented ownership contract
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"OK?   {name}: rows={len(srows)} (no oracle — rows-only check)"
                  f" [{spark_s:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = _hash_rows(scols, srows), _hash_rows(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                srt = sorted(srows)
                drt = sorted(drows)
                for a, b in zip(srt, drt):
                    if _canon(a) != _canon(b):
                        print(f"      first diff:\n        spark  {a}\n        duckdb {b}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} [{spark_s:.1f}s]")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
