"""Distribution-drift diagnostics (operators/drift.py): semantic
properties the oracle hash can't see — a flat source scores ~0, a
shifted source scores high, and results are partitioning-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached
from retail_etl_pipeline_airflow_s3_athena_spark.operators import drift


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING"
    )


def test_chisq_flat_vs_shifted(spark):
    # src_a and src_b share the corpus length shape (chi2 ~ 0);
    # src_c is an order of magnitude longer (different msb bin).
    short, long = "w " * 8, "w " * 300
    rows = (
        [(i, short, "src_a") for i in range(40)]
        + [(100 + i, long, "src_a") for i in range(40)]
        + [(200 + i, short, "src_b") for i in range(40)]
        + [(300 + i, long, "src_b") for i in range(40)]
        + [(400 + i, short, "src_c") for i in range(10)]
    )
    out = drift.length_drift_chisq(_docs(spark, rows))
    got = {r["source"]: r.asDict() for r in out.collect()}
    release_cached(out)
    assert got["src_a"]["chi2_e6"] == got["src_b"]["chi2_e6"]
    # src_a/src_b track the corpus shape (small residual: the corpus
    # includes src_c's skew); the all-short source dominates by far
    assert got["src_c"]["chi2_e6"] > 10 * got["src_a"]["chi2_e6"]
    assert got["src_c"]["n_docs"] == 10
    # every source sees the full corpus bin grid: dof identical
    assert len({v["dof"] for v in got.values()}) == 1


def test_kl_zero_for_identical_distributions(spark):
    # every source has the SAME token distribution -> P_s == Q exactly
    # -> KL == 0 up to fixed-point truncation (a few ulps, clamped >= 0)
    rows = [
        (s * 10 + i, "alpha beta beta gamma", f"s{s}")
        for s in range(3)
        for i in range(5)
    ]
    out = drift.source_token_kl(_docs(spark, rows))
    vals = out.collect()
    release_cached(out)
    assert len(vals) == 3
    for r in vals:
        assert 0 <= r["kl_e20"] <= 64  # < 2^-14 bits of noise
        assert r["n_tokens"] == 20


def test_kl_flags_divergent_source(spark):
    rows = [(i, "common words here", "normal") for i in range(20)] + [
        (100 + i, "zzz qqq xxx", "weird") for i in range(20)
    ]
    out = drift.source_token_kl(_docs(spark, rows))
    got = {r["source"]: r["kl_e20"] for r in out.collect()}
    release_cached(out)
    # disjoint vocab halves: KL(P||Q) = log2(2) = 1.0 -> 2^20 each,
    # minus truncation
    assert got["weird"] > (1 << 19)
    assert got["normal"] > (1 << 19)


def test_psi_stable_vs_drifted(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # cutoff far past the data: post window empty -> smoothing-only
    # baseline; mid-month cutoff on real data stays small; a synthetic
    # value shift must dominate both.
    out = drift.snapshot_value_psi(ev).collect()
    assert {r["event_type"] for r in out} == {
        "click", "error", "purchase", "signup", "view",
    }
    for r in out:
        assert r["psi_e20"] >= 0
        assert r["n_pre"] > 0 and r["n_post"] > 0
    # synthetic hard drift: values *10 after the cutoff
    shifted = ev.withColumn(
        "value",
        F.when(
            F.col("ts") >= F.lit(drift.PSI_CUTOFF).cast("timestamp"),
            F.col("value") * 10,
        ).otherwise(F.col("value")),
    )
    drifted = {
        r["event_type"]: r["psi_e20"]
        for r in drift.snapshot_value_psi(shifted).collect()
    }
    base = {r["event_type"]: r["psi_e20"] for r in out}
    for t in base:
        assert drifted[t] > max(4 * base[t], 1 << 20)


def test_drift_partitioning_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = drift.length_drift_chisq(docs)
    b = drift.length_drift_chisq(docs.repartition(13))
    ra, rb = a.collect(), b.collect()
    release_cached(a)
    release_cached(b)
    assert ra == rb
    ka = drift.source_token_kl(docs.limit(120))
    kb = drift.source_token_kl(docs.limit(120).repartition(7))
    va, vb = ka.collect(), kb.collect()
    release_cached(ka)
    release_cached(kb)
    assert va == vb
