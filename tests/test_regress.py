"""Exact-integer OLS quality model: coefficients vs a numpy/Fraction
mirror, residual-ranking semantics, degenerate-input behavior.

Reference scope: no learned quality surface in the reference
(scripts/data_quality.py is per-column null/dup counts); extension
coverage for the statistical-outlier curation tier."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import regress

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _exact_fit(rows):
    """(slope, intercept) as exact Fractions from (x, y) pairs."""
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxx = sum(x * x for x, _ in rows)
    sxy = sum(x * y for x, y in rows)
    dx = n * sxx - sx * sx
    return (
        Fraction(n * sxy - sx * sy, dx),
        Fraction(sy * sxx - sx * sxy, dx),
        dx,
    )


def test_fit_matches_fraction_mirror(spark):
    docs = _docs(spark)
    row = regress.length_model_fit(docs).collect()[0]
    pairs = [
        (r["x"], r["y"])
        for r in docs.select(
            F.regexp_count("text", F.lit(r"\S+")).alias("x"),
            F.length("text").alias("y"),
        ).collect()
    ]
    slope, intercept, _ = _exact_fit(pairs)
    assert row["n_docs"] == len(pairs)
    assert row["sum_tokens"] == sum(x for x, _ in pairs)
    assert row["sum_chars"] == sum(y for _, y in pairs)
    # truncating fixed-point of the exact rational, sign factored out
    def fx(q, scale):
        sgn = -1 if q < 0 else 1
        return sgn * int(abs(q) * scale)

    assert row["slope_e6"] == fx(slope, 10**6)
    assert row["intercept_e2"] == fx(intercept, 100)


def test_outliers_rank_by_exact_residual(spark):
    docs = _docs(spark)
    out = regress.length_model_outliers(docs, k=10).collect()
    pairs = {
        r["doc_id"]: (r["x"], r["y"])
        for r in docs.select(
            "doc_id",
            F.regexp_count("text", F.lit(r"\S+")).alias("x"),
            F.length("text").alias("y"),
        ).collect()
    }
    slope, intercept, dx = _exact_fit(list(pairs.values()))
    r_nums = {
        did: y * dx - (intercept * dx) - (slope * dx) * x
        for did, (x, y) in pairs.items()
    }
    expect = sorted(pairs, key=lambda d: (-abs(r_nums[d]), d))[:10]
    assert [r["doc_id"] for r in out] == expect
    for r in out:
        rn = r_nums[r["doc_id"]]
        assert r["resid_sign"] == (1 if rn > 0 else -1 if rn < 0 else 0)
        assert r["resid_e2"] == int(100 * abs(rn) / dx)


def test_degenerate_inputs(spark):
    # zero variance in x: fit reports zeros, outliers are empty
    flat = spark.createDataFrame(
        [(i, "one two") for i in range(3)], "doc_id INT, text STRING"
    )
    row = regress.length_model_fit(flat).collect()[0]
    assert row["slope_e6"] == 0 and row["intercept_e2"] == 0
    assert regress.length_model_outliers(flat).count() == 0
    # empty corpus
    empty = flat.filter(F.lit(False))
    row = regress.length_model_fit(empty).collect()[0]
    assert row["n_docs"] == 0 and row["slope_e6"] == 0
    assert regress.length_model_outliers(empty).count() == 0
    # NULL text rows are dropped, not crashed on
    nulls = spark.createDataFrame(
        [(1, None), (2, "a bb"), (3, "a bb ccc dddd")],
        "doc_id INT, text STRING",
    )
    assert regress.length_model_fit(nulls).collect()[0]["n_docs"] == 2


def test_signed_div_truncates_exactly(spark):
    """r7 ADVICE repro: decimal '/' rounds HALF_UP to scale 6 before
    floor, so floor(100*430000003 / (1e9+7)) said 43; truth (and
    DuckDB //) is 42.  _signed_div_e must truncate exactly, and stay
    exact on >18-digit quotients where `div` would wrap to BIGINT."""
    dec = "decimal(38,0)"
    df = spark.createDataFrame(
        [(430000003, 10**9 + 7), (-430000003, 10**9 + 7), (7, 2)],
        "num LONG, den LONG",
    ).select(F.col("num").cast(dec).alias("num"),
             F.col("den").cast(dec).alias("den"))
    got = [
        r["_sd"]
        for r in df.select(
            regress._signed_div_e(F.col("num"), F.col("den"), 100)
        ).collect()
    ]
    truth = [
        (1 if n > 0 else -1) * (100 * abs(n) // d)
        for n, d in [(430000003, 10**9 + 7), (-430000003, 10**9 + 7), (7, 2)]
    ]
    assert got == truth
