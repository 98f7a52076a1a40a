"""Distributed two-pass rank (functions/ranking.py): equivalence with
the single-partition window functions it replaces, partition
invariance, and the large-vocabulary guard in encode_token_ids."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.ranking import (
    attach_global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators import vocab as vocab_ops
from retail_etl_pipeline_airflow_s3_athena_spark.plans import relational


def _demo(spark, n=537, parts=7):
    # values with duplicates in v but unique (v, k) tie-break
    return spark.range(n).repartition(parts).select(
        (F.col("id") % 97).alias("v"), F.col("id").alias("k")
    )


def test_rank_matches_window_row_number(spark):
    df = _demo(spark)
    got = attach_global_rank(
        df, [F.desc("v"), F.asc("k")], rank_col="r", total_col="n"
    )
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = df.select("v", "k", F.row_number().over(w).alias("r"))
    g = {(r.v, r.k): r.r for r in got.collect()}
    wnt = {(r.v, r.k): r.r for r in want.collect()}
    assert g == wnt
    totals = {r.n for r in got.select("n").distinct().collect()}
    assert totals == {537}


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 100, 101, 103])
def test_ntile_and_pct_rank_match_sql_semantics(spark, n):
    df = spark.range(n).select(F.col("id").alias("k"))
    got = attach_global_rank(
        df, [F.asc("k")], rank_col="r", total_col="n"
    ).select(
        "k",
        ntile_from_rank(F.col("r"), F.col("n"), 4).alias("q"),
        F.round(percent_rank_from_rank(F.col("r"), F.col("n")), 9).alias("p"),
    )
    w = Window.orderBy(F.asc("k"))
    want = df.select(
        "k",
        F.ntile(4).over(w).alias("q"),
        F.round(F.percent_rank().over(w), 9).alias("p"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_rank_partition_invariance(spark):
    df = _demo(spark, n=211, parts=5)
    a = attach_global_rank(
        df, [F.desc("v"), F.asc("k")], rank_col="r", num_partitions=2
    )
    b = attach_global_rank(
        df, [F.desc("v"), F.asc("k")], rank_col="r", num_partitions=16
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_customer_value_tiles_no_unpartitioned_window(spark, sf_dir):
    df = relational.customer_value_tiles(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the plan must not contain a Window operator at all (the rank is
    # pure arithmetic over range-partitioned offsets)
    assert "Window" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert {r.quartile for r in rows} <= {1, 2, 3, 4}


def test_encode_token_ids_large_vocab_uses_distributed_rank(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma tok{i} tok{i % 3}") for i in range(40)]
    )
    small = vocab_ops.encode_token_ids(docs, vocab_size=1000)
    big = vocab_ops.encode_token_ids(docs, vocab_size=1_000_000)
    # same corpus, vocab covers every token in both cases -> identical ids
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )
    # the large-vocab plan must not run a single-partition rank window
    plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan.lower()