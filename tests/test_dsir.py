"""DSIR importance weighting + the deterministic fixed-point log2 it
rides on (functions/detmath.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions import detmath
from retail_etl_pipeline_airflow_s3_athena_spark.operators import dsir
from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers


def test_log2_e20_tracks_true_log2():
    worst = 0.0
    for n in [1, 2, 3, 5, 4095, 4096, 4097, 10**6, 10**12,
              detmath.MAX_LOG_INPUT]:
        worst = max(
            worst, abs(detmath.log2_e20(n) / detmath.E20 - math.log2(n))
        )
    assert worst < 2 ** -11  # 12-bit mantissa bound
    assert detmath.log2_e20(1) == 0
    assert detmath.log2_e20(2) == detmath.E20
    assert detmath.log2_e20(1 << 20) == 20 * detmath.E20


def test_log2_e20_out_of_range_raises():
    with pytest.raises(ValueError):
        detmath.log2_e20(0)
    with pytest.raises(ValueError):
        detmath.log2_e20(detmath.MAX_LOG_INPUT + 1)


def test_attach_det_log2_matches_python_reference(spark):
    ns = [1, 2, 3, 7, 100, 4096, 99991, 10**9, detmath.MAX_LOG_INPUT]
    df = spark.createDataFrame([(n,) for n in ns], "n BIGINT")
    out = detmath.attach_det_log2_e20(
        df, "n", "l", detmath.log2_table_df(spark),
        detmath.pow2_table_df(spark),
    )
    got = {r["n"]: r["l"] for r in out.collect()}
    assert got == {n: detmath.log2_e20(n) for n in ns}


def test_attach_det_log2_guard_raises_loudly(spark):
    df = spark.createDataFrame([(0,)], "n BIGINT")
    out = detmath.attach_det_log2_e20(
        df, "n", "l", detmath.log2_table_df(spark),
        detmath.pow2_table_df(spark),
    )
    with pytest.raises(Exception, match="det_log2 input out of"):
        out.collect()


def _toy_docs(spark):
    rows = [
        Row(doc_id=1, text="the cat sat on the mat", lang="en", source="a"),
        Row(doc_id=2, text="the dog ran", lang="en", source="a"),
        Row(doc_id=3, text="der hund lief schnell weg", lang="de", source="b"),
        Row(doc_id=4, text="le chat noir", lang="fr", source="b"),
        Row(doc_id=5, text="the cat and the dog", lang="de", source="b"),
        Row(doc_id=6, text="", lang="en", source="a"),
    ]
    return spark.createDataFrame(rows)


def test_dsir_importance_ranks_targetlike_docs_higher(spark):
    docs = _toy_docs(spark)
    out = {
        r["doc_id"]: r["importance_e20"]
        for r in dsir.dsir_importance(docs, F.col("lang") == "en").collect()
    }
    # doc 6 has zero tokens -> absent
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 5 shares every token with the EN target corpus; doc 3 shares
    # none — the weight must separate them (per token: docs 3 and 5
    # have the same length, so no normalization confound)
    assert out[5] > out[3]
    # target-built docs outrank the pure-DE doc
    assert out[1] > out[3] and out[2] > out[3]


def test_dsir_importance_partition_invariance(spark, sf_dir):
    docs = readers.read_documents(spark, sf_dir)
    a = dsir.dsir_importance(docs, F.col("lang") == "en")
    b = dsir.dsir_importance(
        docs.repartition(13), F.col("lang") == "en"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_select_topk_and_plan(spark, sf_dir):
    docs = readers.read_documents(spark, sf_dir)
    sel = dsir.dsir_select(docs, F.col("lang") == "en", k=20)
    rows = sel.collect()
    assert len(rows) == 20
    imps = [r["importance_e20"] for r in rows]
    assert imps == sorted(imps, reverse=True)
    # selection is a TakeOrderedAndProject, not a full sort / window
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_mixing_plan_arithmetic(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import mixing

    rows = [
        Row(doc_id=1, text="a b c d", lang="en", source="big"),
        Row(doc_id=2, text="e f g h i j", lang="en", source="big"),
        Row(doc_id=3, text="x y", lang="en", source="small"),
        Row(doc_id=4, text="z", lang="en", source="unweighted"),
    ]
    docs = spark.createDataFrame(rows)
    out = {
        r["source"]: r
        for r in mixing.mixing_plan(
            docs, {"big": 600_000, "small": 400_000}, token_budget=20
        ).collect()
    }
    big = out["big"]  # 10 tokens, desired 12 -> rate 1.2e6, uncapped
    assert big["n_tokens"] == 10 and big["rate_e6"] == 1_200_000
    assert big["planned_tokens"] == 12 and not big["capped"]
    small = out["small"]  # 2 tokens, desired 8 -> raw 4e6, capped at 3e6
    assert small["rate_e6"] == 3_000_000 and small["capped"]
    assert small["planned_tokens"] == 6
    un = out["unweighted"]  # absent from weights -> zero everything
    assert un["weight_e6"] == 0 and un["rate_e6"] == 0
    assert un["planned_tokens"] == 0 and not un["capped"]


def test_source_entropy_flags_degenerate_source(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import mixing

    rows = [
        # uniform source: 8 distinct tokens once each -> H = 3 bits
        Row(doc_id=1, text="a b c d e f g h", lang="en", source="uniform"),
        # degenerate source: one token repeated -> H = 0
        Row(doc_id=2, text="spam spam spam spam", lang="en", source="dupey"),
    ]
    out = {
        r["source"]: r
        for r in mixing.source_entropy(spark.createDataFrame(rows)).collect()
    }
    assert out["dupey"]["entropy_e20"] == 0
    assert abs(out["uniform"]["entropy_e20"] - 3 * detmath.E20) < 3000
    assert out["uniform"]["n_distinct_tokens"] == 8
