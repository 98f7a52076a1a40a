"""Z-order layout: Morton-key semantics vs a Python mirror, pruning
locality of the written layout, degenerate inputs.

Reference scope: the reference's only layout lever is the silver
date= partition (scripts/load.py); multi-dimensional clustering is
extension coverage for the 100 TB scan-pruning tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import layout

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(layout.BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_mirror(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 3, 7, 100) for y in (0, 5, 63, 99)],
        "x LONG, y LONG",
    )
    out = layout.with_zorder_key(df, F.col("x"), F.col("y")).collect()
    mnx, mxx, mny, mxy = 0, 100, 0, 99
    for r in out:
        xn = (r["x"] - mnx) * layout.MAX_N // (mxx - mnx)
        yn = (r["y"] - mny) * layout.MAX_N // (mxy - mny)
        assert r["z"] == _morton(xn, yn)


def test_bucket_extents_are_narrow_rectangles(spark):
    rows = layout.zorder_layout(_orders(spark)).collect()
    assert sum(r["n_rows"] for r in rows) == _orders(spark).count()
    gmin = min(r["min_custkey"] for r in rows)
    gmax = max(r["max_custkey"] for r in rows)
    spans = [r["max_custkey"] - r["min_custkey"] for r in rows]
    # 256 buckets tile the plane ~16x16: each bucket's custkey extent
    # should be a small fraction of the global range (theory: ~1/16;
    # assert < 1/4 to stay robust to sparse cells)
    assert sum(spans) / len(spans) < (gmax - gmin) / 4


def test_written_layout_has_narrow_per_partition_extents(spark, tmp_path):
    orders = _orders(spark)
    path = str(tmp_path / "zordered")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    layout.write_zordered(
        orders, F.col("o_custkey"), days, path, n_files=16
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
            F.datediff(
                F.max("o_orderdate"), F.min("o_orderdate")
            ).alias("day_span"),
        )
        .collect()
    )
    assert len(per_file) > 4  # actually split across files
    g = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("d"),
    ).collect()[0]
    mean_ck = sum(r["ck_span"] for r in per_file) / len(per_file)
    mean_day = sum(r["day_span"] for r in per_file) / len(per_file)
    # every file covers a narrow rectangle in BOTH dims — the footer
    # min/max pruning contract (unordered layout would be ~100% each)
    assert mean_ck < g["ck"] * 0.6
    assert mean_day < g["d"] * 0.6


def test_degenerate_inputs(spark):
    # constant dimension: range 0 -> all keys identical, single bucket
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "x LONG, y LONG"
    )
    out = layout.with_zorder_key(df, F.col("y"), F.col("y")).collect()
    assert {r["z"] for r in out} == {0}
    # NULLs dropped, not crashed on
    dfn = spark.createDataFrame(
        [(1, None), (2, 7), (None, 3)], "x LONG, y LONG"
    )
    assert layout.with_zorder_key(dfn, F.col("x"), F.col("y")).count() == 1
    # empty input
    empty = df.filter(F.lit(False))
    assert layout.with_zorder_key(empty, F.col("x"), F.col("y")).count() == 0


def test_write_zordered_keeps_null_keyed_rows(spark, tmp_path):
    """A layout REWRITE must never lose rows: NULL-keyed rows land in
    the sentinel bucket z = -1 (first file), the rest z-order normally
    (r7 ADVICE; Delta/Iceberg ZORDER semantics)."""
    df = spark.createDataFrame(
        [(1, None, 10), (2, 7, None), (3, None, None), (4, 5, 40),
         (5, 9, 50)],
        "id LONG, x LONG, y LONG",
    )
    path = str(tmp_path / "z_nulls")
    layout.write_zordered(df, F.col("x"), F.col("y"), path, n_files=2)
    back = spark.read.parquet(path)
    assert back.count() == 5  # nothing dropped
    assert {r["id"] for r in back.collect()} == {1, 2, 3, 4, 5}
    keyed = layout.with_zorder_key(
        df, F.col("x"), F.col("y"), keep_nulls=True
    ).collect()
    assert {r["z"] for r in keyed if r["id"] in (1, 2, 3)} == {-1}
    assert all(r["z"] >= 0 for r in keyed if r["id"] in (4, 5))


def test_zorder_normalization_survives_huge_ranges(spark):
    """Epoch-micros-scale dimension ranges (> 1.4e14) overflowed the
    BIGINT (x-min)*65535 product and wrapped silently (r7 ADVICE);
    the DECIMAL(38,0) product must keep keys exact and monotone."""
    lo, hi = 0, 4 * 10**18  # range * 65535 >> 2^63
    df = spark.createDataFrame(
        [(lo, 0), (hi // 2, 0), (hi, 0)], "x LONG, y LONG"
    )
    out = {
        r["x"]: r["z"]
        for r in layout.with_zorder_key(
            df, F.col("x"), F.col("y")
        ).collect()
    }
    xs = sorted(out)
    assert all(out[x] >= 0 for x in xs)
    assert out[xs[0]] < out[xs[1]] < out[xs[2]]
    # exact mirror: xn = (x-lo)*65535 // (hi-lo), y constant -> z =
    # even-bit spread of xn
    for x in xs:
        xn = (x - lo) * layout.MAX_N // (hi - lo)
        assert out[x] == _morton(xn, 0)
