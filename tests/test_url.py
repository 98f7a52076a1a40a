"""URL canonicalization + provenance dedup (operators/url.py).

Reference scope: none — extension coverage for the crawl front door
(r9 verdict #5).  Rules tested in isolation, then the composed
WARC-bytes path against the DuckDB re-derivation.
"""

from __future__ import annotations

import duckdb
import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import warc as warc_ops

CASES = [
    # (raw, canonical)
    ("http://example.com/a", "http://example.com/a"),
    ("HTTP://EXAMPLE.com/a", "http://example.com/a"),        # case
    ("http://example.com:80/a", "http://example.com/a"),     # default port
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # real port
    ("https://example.com:80/a", "https://example.com:80/a"),    # not https default
    ("http://example.com/a#frag", "http://example.com/a"),   # fragment
    ("http://example.com", "http://example.com/"),           # empty path
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&page=2", "http://example.com/a?page=2"),
    ("http://example.com/a?page=2&gclid=1&q=spark", "http://example.com/a?page=2&q=spark"),
    ("http://example.com/a?ref=tw", "http://example.com/a"),
    ("http://example.com/a?referrer=tw", "http://example.com/a?referrer=tw"),
    ("http://example.com/a?fbclid=z#f", "http://example.com/a"),
    ("HTTPS://User.Example.COM:443/P/q?utm_x=1&id=9#top",
     "https://user.example.com/P/q?id=9"),                   # path case kept
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["u"])
    got = [
        r["c"]
        for r in df.select(url_ops.canonical_url("u").alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_sql_twin_matches_spark_rules():
    con = duckdb.connect()
    vals = ", ".join(f"('{r}')" for r, _ in CASES)
    rows = con.execute(
        f"SELECT {url_ops.sql_canonical_url('u')} FROM (VALUES {vals}) t(u)"
    ).fetchall()
    assert [r[0] for r in rows] == [c for _, c in CASES]


def test_canonicalization_is_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CASES], ["u"])
    got = [
        r["c"]
        for r in df.select(url_ops.canonical_url("u").alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_dedup_through_warc_bytes(spark, sf_dir):
    """The composed gate path: messy variants -> real WARC/1.0 bytes
    -> ingest with URIs -> canonical collapse.  Every resource's 3
    variants merge; the kept URI is the lexicographic min."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    messy = url_ops.with_messy_url(docs)
    caps = warc_ops.warc_ingest_uris(
        warc_ops.docs_to_warc(messy, url_col="url")
    )
    assert caps.count() == n_docs  # no capture lost in the round trip
    out = url_ops.url_canonical_dedup(caps).collect()
    groups = {r["canonical_url"]: r for r in out}
    # resources = distinct doc_id DIV 3 values
    n_resources = messy.selectExpr("doc_id DIV 3 AS g").distinct().count()
    assert len(groups) == n_resources
    full = [r for r in out if r["n_captures"] == 3]
    assert len(full) >= n_resources - 2  # tail groups may be partial
    for r in full:
        assert r["kept_uri"].startswith("HTTP://EXAMPLE.COM:80/")


def test_mixed_tracking_and_real_params_preserve_order(spark):
    raw = "http://h.io/p?b=2&utm_a=1&a=1&fbclid=x&c=3"
    df = spark.createDataFrame([(raw,)], ["u"])
    got = df.select(url_ops.canonical_url("u").alias("c")).collect()[0]["c"]
    assert got == "http://h.io/p?b=2&a=1&c=3"
