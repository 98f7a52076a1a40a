"""Exact-substring duplicate spans (operators/spans.py), the realized
training mix (mixing_sample), and exact distributed percentiles
(order_value_quantiles): hand-computed toy semantics, keep-first
choice, extent merging, partition invariance, and plan shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import mixing
from retail_etl_pipeline_airflow_s3_athena_spark.operators import spans
from retail_etl_pipeline_airflow_s3_athena_spark.plans import relational


def _docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def test_dup_spans_keep_first_across_docs(spark):
    # doc 2 repeats doc 1's run "a b c d"; window=3 -> removable
    # windows in doc 2 at pos 1 ((a,b,c)) and 2 ((b,c,d)), merged into
    # one extent [1, 5).  Doc 1 (the first occurrence) keeps its text.
    docs = _docs(
        spark,
        [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "x a b c d y"},
        ],
    )
    out = [tuple(r) for r in spans.dup_spans(docs, window=3).collect()]
    assert out == [(2, 1, 5, 2)]


def test_dup_spans_within_doc_repeat_merges(spark):
    # "p q r s p q r s": the second copy's windows at pos 4 and 5 are
    # repeats of pos 0 and 1 -> one merged extent [4, 8)
    docs = _docs(spark, [{"doc_id": 7, "text": "p q r s p q r s"}])
    out = [tuple(r) for r in spans.dup_spans(docs, window=3).collect()]
    assert out == [(7, 4, 8, 2)]


def test_dup_spans_disjoint_extents_stay_separate(spark):
    # two shared runs separated by unique middles -> two extents in
    # the later doc, not one
    docs = _docs(
        spark,
        [
            {"doc_id": 1, "text": "a b c m m m d e f"},
            {"doc_id": 2, "text": "a b c u v w x d e f"},
        ],
    )
    out = [tuple(r) for r in spans.dup_spans(docs, window=3).collect()]
    assert out == [(2, 0, 3, 1), (2, 7, 10, 1)]


def test_strip_dup_spans_rebuilds_survivors(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "x a b c d y"},
            {"doc_id": 3, "text": "a b c d e f"},  # full duplicate
            {"doc_id": 4, "text": "zz"},  # shorter than the window
        ],
    )
    out = {
        r["doc_id"]: r
        for r in spans.strip_dup_spans(docs, window=3).collect()
    }
    assert out[1]["kept_text"] == "a b c d e f"
    assert out[1]["kept_tokens"] == 6 and out[1]["n_tokens"] == 6
    assert out[2]["kept_text"] == "x y"
    assert out[2]["kept_tokens"] == 2
    # doc 3 is a verbatim copy of doc 1 -> fully stripped, row kept
    assert out[3]["kept_text"] == "" and out[3]["kept_tokens"] == 0
    # sub-window docs cannot contain an L-token duplicate
    assert out[4]["kept_text"] == "zz" and out[4]["n_tokens"] == 1


def test_dup_spans_partition_invariance(spark):
    rows = [
        {"doc_id": i, "text": f"alpha beta gamma delta run{i % 4} end tail"}
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    a = spans.dup_spans(docs.repartition(1), window=3).collect()
    b = spans.dup_spans(docs.repartition(13), window=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_mixing_sample_epochs_and_determinism(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": i, "text": "t " * 10, "source": "big"}
            for i in range(20)
        ]
        + [{"doc_id": 100, "text": "u v", "source": "zero"}],
    )
    # big: 200 tokens, weight 1.0, budget 400 -> rate exactly 2.0e6:
    # every doc exactly twice, the fractional branch never fires
    out = mixing.mixing_sample(docs, {"big": 1_000_000}, token_budget=400)
    rows = out.collect()
    assert len(rows) == 40
    assert {r["epoch"] for r in rows} == {1, 2}
    assert all(r["source"] == "big" for r in rows)  # zero-weight absent
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == [1, 2] for v in per_doc.values())
    # content-hash selection: invariant under repartitioning
    again = mixing.mixing_sample(
        docs.repartition(7), {"big": 1_000_000}, token_budget=400
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_mixing_sample_fractional_rate_matches_plan(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": i, "text": "w x y z", "source": "s"}
            for i in range(50)
        ],
    )
    # 200 tokens, budget 300 -> rate 1.5e6: everyone once, ~half twice
    out = mixing.mixing_sample(docs, {"s": 1_000_000}, token_budget=300)
    per_epoch = {
        r["epoch"]: r["n"]
        for r in out.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    assert per_epoch[1] == 50
    assert 0 < per_epoch.get(2, 0) < 50  # hash-selected strict subset


def test_order_value_quantiles_exact_on_fixture(spark, sf_dir):
    out = relational.order_value_quantiles(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # distributed rank, no WindowExec
    rows = out.collect()
    assert [r["q"] for r in rows] == [1, 5, 25, 50, 75, 90, 95, 99]
    vals = [r["value_cents"] for r in rows]
    assert vals == sorted(vals)
    # cross-check against a driver-side exact computation
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = sorted(
        int(v * 100 + 0.5)
        for v in [r["o_totalprice"] for r in orders.collect()]
    )
    n = len(cents)
    assert all(r["n_orders"] == n for r in rows)
    for r in rows:
        target = (r["q"] * n + 99) // 100
        assert r["value_cents"] == cents[target - 1]


def test_curriculum_mix_orders_phases_by_quality(spark):
    """curriculum_mix: pos is a 1..n permutation, phase is monotone in
    pos, every (doc, epoch) of the realized mix appears exactly once,
    and later phases hold higher-quality documents."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import mixing
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        quality_score,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"src0": 500_000, "src1": 500_000}
    out = mixing.curriculum_mix(docs, weights, 10_000, n_phases=4)
    rows = out.collect()
    release_cached(out)
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
    assert [r["phase"] for r in rows] == sorted(r["phase"] for r in rows)

    mix = mixing.mixing_sample(docs, weights, 10_000)
    want = {(r["doc_id"], r["epoch"]) for r in mix.collect()}
    assert {(r["doc_id"], r["epoch"]) for r in rows} == want
    assert len(rows) == len(want)

    # later phases = higher quality: min quality of the last phase >=
    # max quality of the first (disjoint quartiles of a total order)
    q = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    p1 = [q[r["doc_id"]] for r in rows if r["phase"] == 1]
    p4 = [q[r["doc_id"]] for r in rows if r["phase"] == 4]
    assert p1 and p4 and min(p4) >= max(p1)
