"""CDX URL-index tests: the (offset, length) range-request contract,
SURT key semantics, status/mime extraction, and the distributed index
against hand-computed rows."""

from __future__ import annotations

import hashlib

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import cdx as cdx_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import warc as warc_ops

RECORDS = [
    ("http://news.example.com/a?q=1", b"alpha"),
    ("https://example.com:443/b", b"beta body"),
    ("http://other.test/c/d?utm_source=x&k=v", b""),
]


@pytest.mark.parametrize("gzip_members", [True, False])
def test_offsets_reparse_standalone(gzip_members):
    """archive[offset : offset + length] must re-parse to exactly the
    record the index row describes — the CDX range-request contract."""
    archive = warc_ops.write_warc(
        RECORDS,
        gzip_members=gzip_members,
        statuses=[200, 404, 301],
        mimes=["text/plain", "text/html", "text/plain"],
        dates=[
            "2024-01-01T00:00:01Z",
            "2024-01-01T00:00:02Z",
            "2024-01-01T00:00:03Z",
        ],
    )
    walked = list(warc_ops._walk_members(archive))
    assert len(walked) == 3
    for (uri, body), (off, length, fields, raw) in zip(RECORDS, walked):
        assert fields["warc-target-uri"] == uri
        sliced = archive[off : off + length]
        again = list(warc_ops._walk_members(sliced))
        assert len(again) == 1
        o2, l2, f2, raw2 = again[0]
        assert (f2["warc-target-uri"], raw2) == (uri, raw)
        assert warc_ops._strip_http(raw2) == body


def test_status_mime_extraction():
    archive = warc_ops.write_warc(
        RECORDS,
        gzip_members=False,
        statuses=[200, 404, 301],
        mimes=["text/plain", "text/html", "application/json"],
    )
    got = [
        cdx_ops._http_status_mime(body)
        for _o, _l, _f, body in warc_ops._walk_members(archive)
    ]
    assert got == [
        (200, "text/plain"),
        (404, "text/html"),
        (301, "application/json"),
    ]


def test_surt_key_semantics(spark):
    rows = [
        ("http://news.example.com/a?q=1",),
        ("HTTP://EXAMPLE.COM:80/x",),
        ("https://example.com/p?utm_source=t&k=v#frag",),
        ("http://single/",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = [
        r[0]
        for r in df.select(cdx_ops.surt_key("url")).collect()
    ]
    assert got == [
        "com,example,news)/a?q=1",
        "com,example)/x",
        "com,example)/p?k=v",
        "single)/",
    ]


def test_cdx_index_rows(spark):
    """End-to-end over a two-archive frame: every field, including
    digest-of-decoded-payload under a content-encoded leg."""
    a1 = warc_ops.write_warc(
        [("http://h.example/a", "héllo".encode())],
        encodings=["gzip"],
        dates=["2024-03-05T06:07:08Z"],
    )
    a2 = warc_ops.write_warc(
        [("http://h.example/b", b"plain")],
        statuses=[404],
        mimes=["text/html"],
    )
    warcs = spark.createDataFrame(
        [("s1", bytearray(a1)), ("s2", bytearray(a2))],
        warc_ops.WARC_ARCHIVE_SCHEMA,
    )
    rows = {
        r["url"]: r
        for r in cdx_ops.cdx_index(warcs).collect()
    }
    ra = rows["http://h.example/a"]
    assert ra["urlkey"] == "example,h)/a"
    assert ra["cdx_ts"] == "20240305060708"
    assert ra["status"] == 200
    assert ra["mime"] == "text/plain"
    assert ra["digest"] == hashlib.sha256("héllo".encode()).hexdigest()
    assert ra["filename"] == "s1"
    rb = rows["http://h.example/b"]
    assert rb["cdx_ts"] == "20240101000000"
    assert rb["status"] == 404
    assert rb["mime"] == "text/html"
    assert rb["digest"] == hashlib.sha256(b"plain").hexdigest()


def test_write_warc_defaults_byte_identical():
    """The r12 statuses/mimes/dates parameters must not perturb the
    bytes existing round-trip gates hash."""
    plain = warc_ops.write_warc(RECORDS)
    explicit = warc_ops.write_warc(
        RECORDS,
        statuses=[200] * 3,
        mimes=["text/plain"] * 3,
        dates=["2024-01-01T00:00:00Z"] * 3,
    )
    assert plain == explicit


def test_crawl_delta_classification(spark):
    """Hand-built indexes: unchanged, changed, new, gone — per host."""
    cols = ["urlkey", "digest"]
    ia = spark.createDataFrame(
        [
            ("ex,a)/1", "d1"),
            ("ex,a)/2", "d2"),
            ("ex,b)/1", "d3"),
        ],
        cols,
    )
    ib = spark.createDataFrame(
        [
            ("ex,a)/1", "d1"),       # unchanged
            ("ex,a)/2", "d2x"),      # changed
            ("ex,a)/3", "d4"),       # new
            # ex,b)/1 gone
        ],
        cols,
    )
    got = {
        r["host_key"]: (
            r["n_unchanged"], r["n_changed"], r["n_new"], r["n_gone"]
        )
        for r in cdx_ops.crawl_delta(ia, ib).collect()
    }
    assert got == {"ex,a": (1, 1, 1, 0), "ex,b": (0, 0, 0, 1)}


def test_store_lookup_prunes_partitions_and_pushes_prefix(spark, tmp_path):
    """The layout contract: a host lookup must hit ONE bucket
    partition (PartitionFilters) and push the urlkey prefix into the
    parquet scan (PushedFilters StringStartsWith) — and return
    exactly what a full-scan filter would."""
    idx = spark.createDataFrame(
        [
            (f"ex,h{i % 5})/p/{i}", f"2024010100000{i % 10}",
             f"http://h{i % 5}.ex/p/{i}", "text/plain", 200,
             f"d{i}", "s")
            for i in range(50)
        ],
        ["urlkey", "cdx_ts", "url", "mime", "status", "digest",
         "filename"],
    )
    path = str(tmp_path / "cdx_store")
    cdx_ops.write_cdx_store(idx, path)
    looked = cdx_ops.cdx_store_lookup(spark, path, "h3.ex")
    plan = looked._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "host_bucket" in plan.split("PartitionFilters: [", 1)[1]
    assert "StartsWith(urlkey,ex,h3)" in plan.replace(" ", "")
    got = sorted(r["urlkey"] for r in looked.collect())
    want = sorted(
        r["urlkey"]
        for r in idx.filter(idx.urlkey.startswith("ex,h3)")).collect()
    )
    assert got == want and len(got) == 10
