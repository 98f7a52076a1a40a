"""CDX URL-index generation — the crawl tier's lookup artifact.

A web archive is unusable without its index: the CDX(J) files that
map a canonicalized URL key to (capture timestamp, archive file,
byte offset, length, payload digest) are what URL-lookup services,
crawl-over-crawl dedup, and selective re-fetch read INSTEAD of
scanning archives.  Common Crawl publishes exactly this artifact
next to its WARC/WAT/WET shards (the public columnar/CDXJ index);
the reference pipeline has no crawl tier, so this module implements
the public semantics (SURT keys + 14-digit timestamps + per-record
archive coordinates) Spark-first:

- ``cdx_records(warcs)``: the only non-relational step — an Arrow
  ``mapInPandas`` walk over the binary archive column emitting one
  row per record with its HTTP status, media type, WARC-Date, the
  sha256 of the DECODED payload (after dechunk / content-decoding /
  charset transcode — the digest crawl-dedup compares), and the
  (offset, length) of the smallest archive slice that re-parses to
  that record: the compressed gzip MEMBER for the member-per-record
  Common Crawl layout, the record byte-span for bare WARC.  Digest
  is computed inside the walk (stdlib hashlib) so bodies never leave
  the executor — the index is metadata-sized, not corpus-sized.
- ``surt_key(url)``: SURT canonicalization as a pure built-in column
  expression layered on ``url.canonical_url`` (scheme dropped, host
  reversed and comma-joined, ``)`` separator, canonical path+query)
  — JVM-side, codegen-friendly, with an independently-derived DuckDB
  twin (``sql_surt_key_cte``) so the gate hashes the key function
  itself.  Reversed-host keys give the index its lookup power: one
  SORT puts all of ``com,example``'s captures (any subdomain)
  adjacent, so host- and prefix-queries are range scans.
- ``cdx_index(warcs)``: records + urlkey + the 14-digit timestamp
  (string ops over WARC-Date), all relational after the walk.
- ``cdx_host_stats(index)``: the index CONSUMED relationally — per
  host: captures, distinct URL keys, OK-rate, latest capture — the
  shape a recrawl scheduler or coverage monitor reads off the index
  without touching a single archive byte.

Correctness: the gate packs the driver's documents table through
``docs_to_warc(vary_captures=True, encode_bodies=True)`` — statuses
404/301, text/html media types, per-record capture times, gzip /
deflate / chunked / iso-8859-1 body legs — and the oracle re-derives
every index field in pure SQL from the documents table (the pack
cycles are deterministic functions of doc_id), so a byte lost
anywhere in the walk, the decode stack, or the SURT key flips the
value hash.  (offset, length) are NOT SQL-predictable (gzip member
sizes); they are gated by the unit suite instead: slicing
``archive[offset : offset + length]`` must re-parse to exactly that
record — the range-request contract.

Scale: the walk is a shuffle-free projection (one archive per row,
the CC processing unit); everything after is one groupBy at most.
At 100 TB the index build is a single pass over the shards — exactly
how the real CC index is cut — and index consumers never read the
archives at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .url import canonical_url, sql_canonical_url
from .warc import _strip_http, _walk_members, docs_to_warc

_MAXLEN = 1 << 20

CDX_RAW_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def with_capture_url(docs: DataFrame) -> DataFrame:
    """Provenance URLs for the CDX fixture: one SUBDOMAIN per source
    (so SURT adjacency and the per-host stats are exercised over many
    hosts, not one), with the same three messiness legs the URL-dedup
    fixture cycles — default port, uppercase scheme/host, tracking
    params, fragments."""
    g = F.expr("doc_id DIV 3")
    v = F.pmod(F.col("doc_id"), F.lit(3))
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".example.com/doc/"), g, F.lit("?page=2"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTP://"), F.upper(F.col("source")),
                F.lit(".EXAMPLE.COM:80/doc/"), g,
                F.lit("?utm_campaign=retail&page=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".Example.Com:80/doc/"), g,
                F.lit("?page=2&fbclid=abc123#frag-"), F.col("doc_id"),
            )
        )
    )
    return docs.withColumn("url", url)


def sql_capture_url() -> str:
    """DuckDB twin of with_capture_url's construction."""
    g = "CAST(doc_id // 3 AS VARCHAR)"
    return f"""CASE doc_id % 3
        WHEN 0 THEN 'http://' || source || '.example.com/doc/'
                    || {g} || '?page=2'
        WHEN 1 THEN 'HTTP://' || upper(source) || '.EXAMPLE.COM:80/doc/'
                    || {g} || '?utm_campaign=retail&page=2'
        ELSE 'http://' || source || '.Example.Com:80/doc/' || {g}
             || '?page=2&fbclid=abc123#frag-' || CAST(doc_id AS VARCHAR)
    END"""


def _http_status_mime(body: bytes) -> tuple[int, str]:
    """(status, media type) from a raw HTTP/1.1 response envelope;
    resource records (no envelope) index as (200, '')."""
    if not body.startswith(b"HTTP/1."):
        return 200, ""
    head_end = body.index(b"\r\n\r\n")
    lines = body[:head_end].decode("utf-8").split("\r\n")
    status = int(lines[0].split(" ")[1])
    mime = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            mime = v.split(";")[0].strip()
    return status, mime


def cdx_records(warcs: DataFrame) -> DataFrame:
    """WARC binaries -> one index row per response/resource record
    (url, WARC-Date, HTTP status, media type, decoded-payload sha256,
    archive offset + length).  Shuffle-free Arrow projection; bodies
    are hashed in place and never shipped."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                for off, length, fields, body in _walk_members(
                    bytes(payload)
                ):
                    if fields.get("warc-type") not in (
                        "response",
                        "resource",
                    ):
                        continue
                    status, mime = _http_status_mime(body)
                    digest = hashlib.sha256(
                        _strip_http(body)
                    ).hexdigest()
                    rows.append(
                        (
                            str(aid),
                            fields.get("warc-target-uri", ""),
                            fields.get("warc-date", ""),
                            status,
                            mime,
                            digest,
                            off,
                            length,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in CDX_RAW_SCHEMA.fields]
            )

    return warcs.mapInPandas(batches, CDX_RAW_SCHEMA)


def surt_key(url) -> F.Column:
    """SURT (Sort-friendly URI Reordering Transform) key of ``url``:
    canonicalize (url.canonical_url — lowercased host, default ports
    and fragments and tracking params dropped), then drop the scheme
    and reverse the host labels comma-joined ahead of a ``)``
    separator: ``http://news.example.com/a?q=1`` ->
    ``com,example,news)/a?q=1``.  Pure built-in expression."""
    canon = canonical_url(url)
    rest = F.regexp_replace(canon, "^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_extract(rest, "^([^/]*)", 1)
    pathq = F.substring(rest, F.length(host) + F.lit(1), F.lit(_MAXLEN))
    return F.concat(
        F.array_join(F.reverse(F.split(host, "[.]")), ","),
        F.lit(")"),
        pathq,
    )


def cdx_index(warcs: DataFrame) -> DataFrame:
    """The full CDX index of an archive set: the record walk plus the
    relational key layer — SURT urlkey and the 14-digit timestamp
    (digits of WARC-Date; ISO 8601 UTC by the WARC spec, so digit
    order IS yyyyMMddHHmmss)."""
    return cdx_records(warcs).select(
        surt_key("url").alias("urlkey"),
        F.regexp_replace("warc_date", "[^0-9]", "").alias("cdx_ts"),
        "url",
        "mime",
        "status",
        "digest",
        F.col("archive_id").alias("filename"),
        "offset",
        "length",
    )


def cdx_fixture_index(docs: DataFrame) -> DataFrame:
    """The gate plan: documents -> messy provenance URLs -> varied
    captures (statuses/mimes/dates + gzip/deflate/chunked/iso-8859-1
    body legs) -> one WARC per source -> the index, SQL-predictable
    columns only (offset/length are unit-gated — gzip member sizes
    aren't SQL-expressible)."""
    warcs = docs_to_warc(
        with_capture_url(docs),
        url_col="url",
        encode_bodies=True,
        vary_captures=True,
    )
    return cdx_index(warcs).select(
        "urlkey", "cdx_ts", "url", "mime", "status", "digest", "filename"
    )


def _surt_cte(url_expr: str, extra_cols: str) -> str:
    """Shared CTE chain deriving urlkey stepwise in DuckDB (the twin
    of surt_key, re-derived independently: RE2 + list functions)."""
    return f"""
    WITH m AS (
        SELECT doc_id, source, text, {url_expr} AS url FROM documents
    ),
    c AS (SELECT *, {sql_canonical_url('url')} AS canon FROM m),
    r AS (
        SELECT *,
            regexp_replace(canon, '^[a-z][a-z0-9+.-]*://', '') AS rest
        FROM c
    ),
    h AS (
        SELECT *, regexp_extract(rest, '^([^/]*)', 1) AS host FROM r
    ),
    k AS (
        SELECT *,
            array_to_string(
                list_reverse(string_split(host, '.')), ','
            ) || ')' || substring(rest, length(host) + 1) AS urlkey,
            '2024010100'
                || lpad(CAST((doc_id % 97) // 60 AS VARCHAR), 2, '0')
                || lpad(CAST((doc_id % 97) % 60 AS VARCHAR), 2, '0')
                AS cdx_ts,
            CASE doc_id % 4 WHEN 2 THEN 404 WHEN 3 THEN 301
                ELSE 200 END AS status,
            CASE WHEN (doc_id % 13) % 2 = 1 THEN 'text/html'
                ELSE 'text/plain' END AS mime,
            sha256(coalesce(text, '')) AS digest,
            {extra_cols}
        FROM h
    )"""


def oracle_cdx_index_sql() -> str:
    """DuckDB twin of cdx_fixture_index: every index field re-derived
    from the documents table (the pack cycles are deterministic
    functions of doc_id; docs_to_warc pins WARC-Date to the epoch
    minute plus doc_id % 97 seconds)."""
    return (
        _surt_cte(sql_capture_url(), "source AS filename")
        + """
    SELECT urlkey, cdx_ts, url, mime,
           CAST(status AS INTEGER) AS status, digest, filename
    FROM k
    ORDER BY urlkey, cdx_ts, url"""
    )


CDX_BUCKETS = 64

# the store is a TYPED artifact (like the real CDX files): fixed
# column set, so readers never depend on schema inference — an EMPTY
# store (no captures yet) still reads as a valid zero-row frame
CDX_STORE_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType()),
        T.StructField("cdx_ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("host_bucket", T.IntegerType()),
    ]
)


def _host_bucket(host_key: F.Column) -> F.Column:
    """Deterministic bucket of a SURT host key — the store's
    partition column.  Murmur3 (Spark's ``hash``) is stable across
    runs; the bucket only PRUNES (correctness never depends on it),
    so the oracle stays bucket-free."""
    return F.pmod(F.hash(host_key), F.lit(CDX_BUCKETS))


def write_cdx_store(index: DataFrame, path: str) -> None:
    """Materialize the index for lookup: hive-partitioned by host
    bucket (bounded directory count), urlkey-sorted within files so
    parquet row-group min/max stats make prefix scans skip.  A host
    lookup then reads ONE partition directory and the row groups
    whose [min, max] straddle the prefix — at 100 TB the difference
    between a lookup and a scan.

    The store is a TYPED artifact: columns are cast to
    ``CDX_STORE_SCHEMA`` at WRITE time, so a writer handing in wider
    types (e.g. a LongType status from a hand-built frame) cannot
    produce files the schema'd reader rejects with a parquet
    physical-type mismatch."""
    index = index.select(
        *[
            F.col(f.name).cast(f.dataType)
            for f in CDX_STORE_SCHEMA.fields
            if f.name != "host_bucket"
        ]
    )
    (
        index.withColumn(
            "host_bucket",
            _host_bucket(F.regexp_extract("urlkey", r"^([^)]*)", 1)),
        )
        .repartition(CDX_BUCKETS, "host_bucket")
        .sortWithinPartitions("host_bucket", "urlkey")
        .write.mode("overwrite")
        .partitionBy("host_bucket")
        .parquet(path)
    )


def cdx_store_lookup(spark, path: str, host: str) -> DataFrame:
    """Range-scan one host's captures out of the store: partition
    pruning on the host bucket (a 1-row scalar read of the same hash
    expression) + a pushed StringStartsWith on the sorted urlkey.
    Returns index rows for every subdomain-free exact host match."""
    host_key = ",".join(reversed(host.lower().split(".")))
    bucket = (
        spark.range(1)
        .select(_host_bucket(F.lit(host_key)).alias("b"))
        .first()["b"]
    )
    prefix = host_key + ")"
    return (
        spark.read.schema(CDX_STORE_SCHEMA)
        .parquet(path)
        .filter(F.col("host_bucket") == bucket)
        .filter(F.col("urlkey").startswith(prefix))
        .drop("host_bucket")
    )


def crawl_delta(index_a: DataFrame, index_b: DataFrame) -> DataFrame:
    """Crawl-over-crawl delta — the reason archive indexes exist:
    comparing two crawls' CDX indexes on (urlkey, payload digest)
    classifies every URL as unchanged / changed / new / gone WITHOUT
    reading a single archive byte (the monthly-crawl dedup Common
    Crawl itself performs, emitting revisit records for the
    unchanged class).  One full-outer join on urlkey + one host
    rollup; both sides are metadata-sized."""
    a = index_a.select("urlkey", F.col("digest").alias("digest_a"))
    b = index_b.select("urlkey", F.col("digest").alias("digest_b"))
    j = a.join(b, "urlkey", "full_outer")
    host = F.regexp_extract("urlkey", r"^([^)]*)", 1)
    da, db = F.col("digest_a"), F.col("digest_b")
    cls = (
        F.when(da.isNotNull() & db.isNotNull() & (da == db), "unchanged")
        .when(da.isNotNull() & db.isNotNull(), "changed")
        .when(db.isNotNull(), "new")
        .otherwise("gone")
    )
    return (
        j.select(host.alias("host_key"), cls.alias("cls"))
        .groupBy("host_key")
        .agg(
            F.sum(F.when(F.col("cls") == "unchanged", 1).otherwise(0))
            .alias("n_unchanged"),
            F.sum(F.when(F.col("cls") == "changed", 1).otherwise(0))
            .alias("n_changed"),
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0))
            .alias("n_new"),
            F.sum(F.when(F.col("cls") == "gone", 1).otherwise(0))
            .alias("n_gone"),
        )
        .orderBy("host_key")
    )


def delta_page_url() -> F.Column:
    """Unique per-doc page URL for the delta fixture (no dedup legs —
    the delta is keyed on urlkey, so the fixture keeps urlkey
    1:1 with doc)."""
    return F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit(".example.com/page/"),
        F.col("doc_id").cast("string"),
    )


def crawl_delta_fixture(docs: DataFrame) -> DataFrame:
    """Two synthetic crawl snapshots of the documents corpus —
    crawl A misses every doc_id % 13 == 7 page (discovered later),
    crawl B drops every doc_id % 11 == 3 page (gone) and re-captures
    every doc_id % 5 == 0 page with mutated content — each packed
    through the real WARC pipeline and indexed; the delta is then
    computed index-to-index."""
    a_docs = docs.filter(F.col("doc_id") % 13 != 7).withColumn(
        "url", delta_page_url()
    )
    b_docs = (
        docs.filter(F.col("doc_id") % 11 != 3)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")), F.lit(" v2")
                ),
            ).otherwise(F.col("text")),
        )
        .withColumn("url", delta_page_url())
    )
    ia = cdx_index(docs_to_warc(a_docs, url_col="url"))
    ib = cdx_index(docs_to_warc(b_docs, url_col="url"))
    return crawl_delta(ia, ib)


def oracle_crawl_delta_sql() -> str:
    """DuckDB twin of crawl_delta_fixture: both snapshots' (urlkey,
    digest) sets re-derived from documents (urlkey in closed form —
    the fixture URL is already canonical; digests via sha256 over the
    same mutation rules), the same full-outer classification."""
    return """
    WITH base AS (
        SELECT doc_id, source, text,
               'com,example,' || source || ')/page/'
                   || CAST(doc_id AS VARCHAR) AS urlkey
        FROM documents
    ),
    a AS (
        SELECT urlkey, sha256(coalesce(text, '')) AS dg
        FROM base WHERE doc_id % 13 <> 7
    ),
    b AS (
        SELECT urlkey,
               sha256(CASE WHEN doc_id % 5 = 0
                      THEN coalesce(text, '') || ' v2'
                      ELSE coalesce(text, '') END) AS dg
        FROM base WHERE doc_id % 11 <> 3
    ),
    j AS (
        SELECT COALESCE(a.urlkey, b.urlkey) AS urlkey,
               a.dg AS da, b.dg AS db
        FROM a FULL OUTER JOIN b ON a.urlkey = b.urlkey
    )
    SELECT regexp_extract(urlkey, '^([^)]*)', 1) AS host_key,
           CAST(SUM(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                    AND da = db THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unchanged,
           CAST(SUM(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                    AND da <> db THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(CASE WHEN da IS NULL AND db IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN db IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_gone
    FROM j
    GROUP BY 1
    ORDER BY host_key"""


def oracle_cdx_lookup_sql(sources: tuple[str, ...]) -> str:
    """DuckDB twin of the store lookup: the fixture index restricted
    to the looked-up hosts (one subdomain per source, so the host
    restriction IS a source restriction) — bucket-free, proving the
    pruned path returns exactly what a full recompute would."""
    in_list = ", ".join(f"'{s}'" for s in sources)
    return (
        _surt_cte(sql_capture_url(), "source AS filename")
        + f"""
    SELECT urlkey, cdx_ts, url, mime,
           CAST(status AS INTEGER) AS status, digest, filename
    FROM k
    WHERE source IN ({in_list})
    ORDER BY urlkey, cdx_ts, url"""
    )


def cdx_host_stats(index: DataFrame) -> DataFrame:
    """Consume the index relationally: per reversed-host key — all of
    a registered domain's captures are ADJACENT under SURT order —
    capture count, distinct URL keys, 200-rate, latest capture
    timestamp.  One groupBy over metadata-sized input; no archive
    byte is read."""
    host = F.regexp_extract("urlkey", r"^([^)]*)", 1)
    return (
        index.groupBy(host.alias("host_key"))
        .agg(
            F.count("*").alias("n_captures"),
            F.countDistinct("urlkey").alias("n_urls"),
            F.sum(
                F.when(F.col("status") == 200, 1).otherwise(0)
            ).alias("n_ok"),
            F.max("cdx_ts").alias("latest_ts"),
        )
        .orderBy("host_key")
    )


def oracle_cdx_host_stats_sql() -> str:
    """DuckDB twin of cdx_host_stats over the fixture index."""
    return (
        _surt_cte(sql_capture_url(), "source AS filename")
        + """
    SELECT regexp_extract(urlkey, '^([^)]*)', 1) AS host_key,
           COUNT(*) AS n_captures,
           COUNT(DISTINCT urlkey) AS n_urls,
           CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ok,
           MAX(cdx_ts) AS latest_ts
    FROM k
    GROUP BY 1
    ORDER BY host_key"""
    )
