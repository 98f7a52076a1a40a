"""The fused crawl → training pipeline (plans/crawl.py).

Reference scope: none — end-to-end composition of the crawl-tier
extensions (WARC ingest, URL canonical dedup, HTML extraction,
curation/split/pack)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import training
from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import warc as warc_ops
from retail_etl_pipeline_airflow_s3_athena_spark.plans import crawl


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_fixture_packs_every_capture(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    caps = warc_ops.warc_ingest_uris(crawl.crawl_fixture_warcs(docs))
    assert caps.count() == docs.count()  # one capture per doc, none lost


def test_kept_capture_is_min_uri_variant(spark, sf_dir):
    """For full 3-variant resources the kept capture is the v1 URI
    ('HTTP://EXAMPLE.COM:80/…' sorts first) — so the surviving text
    is the doc_id % 3 == 1 member's page."""
    docs = _docs(spark, sf_dir).limit(60)
    caps = warc_ops.warc_ingest_uris(crawl.crawl_fixture_warcs(docs))
    kept = url_ops.url_dedup_keep_first(caps).collect()
    for r in kept:
        assert r["target_uri"] == min(
            c["target_uri"]
            for c in caps.collect()
            if url_ops and c["target_uri"].split("/doc/")[1].split("?")[0]
            == r["target_uri"].split("/doc/")[1].split("?")[0]
        )


def test_end_to_end_equals_training_set_over_kept_docs(spark, sf_dir):
    """The fused plan equals build_training_set applied to the
    locally-derived kept-doc table (resource id, kept variant's
    text) — each stage's semantics survive the composition."""
    docs = _docs(spark, sf_dir)
    rows = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    # local re-derivation of the kept capture per resource
    import itertools

    kept = {}
    for did, text in rows.items():
        g, v = did // 3, did % 3
        uri = {
            0: f"http://example.com/doc/{g}?page=2",
            1: f"HTTP://EXAMPLE.COM:80/doc/{g}?utm_campaign=retail&page=2",
            2: f"http://Example.Com:80/doc/{g}?page=2&fbclid=abc123#frag-{did}",
        }[v]
        if g not in kept or uri < kept[g][0]:
            kept[g] = (uri, text)
    kept_df = spark.createDataFrame(
        [(g, t) for g, (_u, t) in kept.items()], ["doc_id", "text"]
    )
    want = sorted(
        tuple(r)
        for r in training.build_training_set(kept_df).collect()
    )
    got = sorted(
        tuple(r) for r in crawl.crawl_to_training_set(docs).collect()
    )
    assert got == want
    assert len(got) > 0


def test_single_scan_plan(spark, sf_dir):
    plan = (
        crawl.crawl_to_training_set(_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan


def test_dedup_report_funnel_invariants(spark, sf_dir):
    [r] = crawl.crawl_dedup_report(_docs(spark, sf_dir)).collect()
    assert (
        r["n_captures"]
        >= r["n_resources"]
        >= r["n_unique_docs"]
        >= r["n_curated"]
        > 0
    )
    # three capture variants per full resource -> URL tier removes ~2/3
    assert 6000 <= r["url_dup_rate_e4"] <= 6800
    # exact integer rate arithmetic
    assert r["url_dup_rate_e4"] == (
        (r["n_captures"] - r["n_resources"]) * 10000 // r["n_captures"]
    )


def test_admitted_pipeline_drops_exactly_the_disallowed_resources(
    spark, sf_dir
):
    """r11: the robots admission tier removes exactly the resources
    the policy names — ids ending in 0 unless overridden by the
    longest-match Allow for ids ending in 00 — and changes nothing
    else about the surviving training set."""
    base = {
        r["doc_id"]: (r["split"], r["n_tokens"], r["bin_id"])
        for r in crawl.crawl_to_training_set(_docs(spark, sf_dir)).collect()
    }
    admitted = {
        r["doc_id"]: (r["split"], r["n_tokens"], r["bin_id"])
        for r in crawl.crawl_admitted_training_set(
            _docs(spark, sf_dir)
        ).collect()
    }
    assert set(admitted) < set(base)
    dropped = set(base) - set(admitted)
    assert dropped, "admission must drop something in the fixture"
    def off_limits(g: int) -> bool:
        # the patterns match the DECIMAL STRING: "0" ends in one
        # zero (disallowed), "100" in two (the Allow override)
        return str(g).endswith("0") and not str(g).endswith("00")

    for g in dropped:
        assert off_limits(g), g
    for g in admitted:
        assert not off_limits(g), g
    # survivors keep their split and token counts (bin packing may
    # renumber bins within a split once members change)
    for g, (split, n_tokens, _bin) in admitted.items():
        assert (split, n_tokens) == base[g][:2]


def test_concat_key_tiebreak_inputs_stay_collation_safe(spark, sf_dir):
    """ADVICE r11: the crawl oracles break arg_min ties with the
    composite string key ``target_uri || chr(0) || text``, which
    matches Spark's (target_uri, text, ...) tuple ordering ONLY while
    both fields are NUL-free and contain no code point in/above the
    surrogate range (Java's UTF-16 code-unit order and DuckDB's UTF-8
    byte order agree exactly on U+0001..U+D7FF).  Pin that fixture
    invariant so the trick can't silently drift: every string entering
    the concat keys — the messy capture URIs and the capture text —
    stays inside the safe set."""
    docs = _docs(spark, sf_dir)
    keyed = url_ops.with_messy_url(docs).select(
        F.col("url").alias("s")
    ).union(docs.select(F.col("text").alias("s")))
    [r] = (
        keyed.filter(F.col("s").isNotNull())
        .select(
            F.max(
                F.array_max(
                    F.transform(F.split("s", ""), lambda c: F.ascii(c))
                )
            ).alias("max_cp"),
            F.max(F.col("s").contains("\x00").cast("int")).alias("has_nul"),
        )
        .collect()
    )
    assert r["has_nul"] == 0
    assert r["max_cp"] is None or r["max_cp"] < 0xD800, hex(r["max_cp"])
