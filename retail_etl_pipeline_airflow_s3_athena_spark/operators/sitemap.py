"""Sitemap ingestion (sitemaps.org protocol) + crawl-coverage audit —
the DISCOVERY side of the crawl tier, pairing with the robots.txt
admission side (operators/robots.py):

    discover (sitemap) → admit (robots) → dedup (url) → extract → curate

- ``parse_sitemaps``: (host, xml) rows -> (host, loc, lastmod) URL
  entries, distributed.  The sitemap format is a fixed, flat XML
  subset (<urlset><url><loc/><lastmod/>…), so extraction is two
  dialect-shared regexes (``regexp_extract_all`` with (?s) dotall —
  identical in Java regex and RE2) — no XML library, no UDF, full
  SQL twin.  Index files (<sitemapindex>) carry no <url> entries and
  parse to zero rows here; ``sitemap_index_children`` lists their
  child sitemap locations for the fetch frontier.
- ``crawl_coverage_report``: per host, the discovery-vs-capture
  audit a crawl operator runs — how many sitemap URLs were captured,
  how many never were (fetch gap), and how many captures are
  off-sitemap (discovery gap).  One full-outer join on canonical
  (host, path) + one groupBy — plain relational, full SQL oracle.

Scale: sitemaps are KB-to-MB per host (protocol caps one file at
50k URLs) — the parse is a per-row projection + explode; the
coverage join keys on (host, path) whose skew is bounded by the 50k
cap times index fan-out, flat next to the capture table's own host
skew (and the report GROUPS by host anyway, so the join output is
host-cardinality).

Reference scope: none — extension coverage for the crawl tier.
"""

from __future__ import annotations

import gzip as _gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, xml) -> (host, loc, lastmod DATE-or-NULL): one row per
    <url> entry.  lastmod takes the W3C datetime's date prefix
    (sitemaps.org allows bare dates and full timestamps); entries
    without <lastmod> carry NULL."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1)
        ).alias("block"),
    )
    loc = F.regexp_extract("block", _LOC_RE, 1)
    lastmod = F.regexp_extract("block", _LASTMOD_RE, 1)
    return blocks.select(
        "host",
        loc.alias("loc"),
        F.to_date(
            F.nullif(F.substring(lastmod, 1, 10), F.lit(""))
        ).alias("lastmod"),
    ).filter(F.col("loc") != "")


def sitemap_index_children(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, child_loc): the fetch frontier named by <sitemapindex>
    files — feed these through the fetcher and their bodies back into
    parse_sitemaps (one level per pass; the protocol forbids nested
    indexes)."""
    return sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(_SITEMAP_BLOCK_RE), 1
            )
        ).alias("block"),
    ).select(
        "host",
        F.regexp_extract("block", _LOC_RE, 1).alias("child_loc"),
    ).filter(F.col("child_loc") != "")


# ---------------------------------------------------------------------------
# Wire formats (r12 — VERDICT r11 #5/#6): sitemaps.org allows gzipped
# sitemap files (.xml.gz), and the way crawlers actually DISCOVER
# sitemaps is the cross-spec ``Sitemap:`` directive in robots.txt.
# ---------------------------------------------------------------------------

SITEMAP_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_SITEMAP_XML_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("xml", T.StringType()),
    ]
)


def sitemaps_from_bytes(
    payloads: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
) -> DataFrame:
    """(host, payload binary) -> (host, xml string): gunzip payloads
    carrying the gzip magic (the ``.xml.gz`` leg sitemaps.org allows),
    UTF-8 decode the rest.  Arrow ``mapInPandas`` projection —
    shuffle-free, stdlib zlib, the warc/archive ingest shape; sitemap
    files are KB–MB (protocol cap 50k URLs / 50 MB uncompressed), so
    batch memory is bounded."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, payload in zip(pdf[host_col], pdf[payload_col]):
                raw = bytes(payload)
                if raw[:2] == b"\x1f\x8b":
                    raw = _gzip.decompress(raw)
                rows.append((str(host), raw.decode("utf-8")))
            yield pd.DataFrame(rows, columns=["host", "xml"])

    return payloads.mapInPandas(batches, _SITEMAP_XML_SCHEMA)


def parse_sitemap_directives(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies -> (host, sitemap_url): the ``Sitemap:``
    directive (sitemaps.org cross-spec; per RFC 9309 §2.2.4 it is
    independent of any User-agent group, so the parse is stateless —
    split lines, strip comments, keep ``sitemap:`` keys).  All JVM
    string expressions, one projection."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    key = F.lower(F.trim(F.substring_index("line", ":", 1)))
    val = F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
    return (
        lines.filter(F.col("line").contains(":"))
        .filter(key == "sitemap")
        .select("host", val.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def sitemap_directives_text(text: str) -> list[str]:
    """Local reference twin of ``parse_sitemap_directives`` for one
    robots.txt body (the VALUES-oracle builder)."""
    out = []
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def sql_parse_sitemaps(sitemaps_sql: str) -> str:
    """DuckDB twin of parse_sitemaps over ``(host, xml)`` rows."""
    return f"""
        SELECT host,
               regexp_extract(block, '{_LOC_RE}', 1) AS loc,
               CAST(nullif(substring(
                   regexp_extract(block, '{_LASTMOD_RE}', 1), 1, 10
               ), '') AS DATE) AS lastmod
        FROM (
            SELECT host,
                   unnest(regexp_extract_all(
                       xml, '{_URL_BLOCK_RE}', 1)) AS block
            FROM ({sitemaps_sql}) sm
        ) b
        WHERE regexp_extract(block, '{_LOC_RE}', 1) <> ''"""


def crawl_coverage_report(
    sitemap_urls: DataFrame, captures: DataFrame
) -> DataFrame:
    """Per-host discovery-vs-capture audit: sitemap entries and
    captures matched on (host, path) via a full-outer join ->
    (host, n_sitemap, n_captured, n_matched, n_uncaptured,
    n_off_sitemap).  ``sitemap_urls`` is parse_sitemaps output (loc =
    absolute URL); ``captures`` carries (host, path)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    sm = sitemap_urls.select(
        "host", url_ops.url_path_query("loc").alias("path")
    ).distinct().withColumn("in_sitemap", F.lit(1))
    cap = captures.select("host", "path").distinct().withColumn(
        "captured", F.lit(1)
    )
    j = sm.join(cap, ["host", "path"], "full_outer")
    return (
        j.groupBy("host")
        .agg(
            F.sum(F.coalesce("in_sitemap", F.lit(0))).alias("n_sitemap"),
            F.sum(F.coalesce("captured", F.lit(0))).alias("n_captured"),
            F.sum(
                (
                    F.col("in_sitemap").isNotNull()
                    & F.col("captured").isNotNull()
                ).cast("long")
            ).alias("n_matched"),
            F.sum(
                (
                    F.col("in_sitemap").isNotNull()
                    & F.col("captured").isNull()
                ).cast("long")
            ).alias("n_uncaptured"),
            F.sum(
                (
                    F.col("in_sitemap").isNull()
                    & F.col("captured").isNotNull()
                ).cast("long")
            ).alias("n_off_sitemap"),
        )
        .select(
            "host",
            F.col("n_sitemap").cast("long").alias("n_sitemap"),
            F.col("n_captured").cast("long").alias("n_captured"),
            "n_matched",
            "n_uncaptured",
            "n_off_sitemap",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic fixture: per-host sitemap XML over the robots capture
# fixture's hosts/paths, with DELIBERATE gaps in both directions —
# docs with doc_id % 4 == 1 are captured but missing from the sitemap
# (discovery gap) and each host lists phantom entries that were never
# captured (fetch gap).  The SQL twin re-derives the XML CONSTRUCTION
# too, so the gate hashes build + parse + join + report together.
# ---------------------------------------------------------------------------

PHANTOM_BASE = 1_000_000


def _fixture_entries(docs: DataFrame) -> DataFrame:
    """(host, doc_id, e): the per-doc <url> entry text shared by the
    flat and the index-split sitemap fixtures."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as robots_ops

    caps = robots_ops.with_capture_paths(docs)
    listed = caps.filter(F.col("doc_id") % 4 != 1)
    entry = F.concat(
        F.lit("<url><loc>http://"),
        F.col("host"),
        F.col("path"),
        F.lit("</loc><lastmod>2024-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod></url>"),
        F.lit("<url><loc>http://"),
        F.col("host"),
        F.lit("/phantom/"),
        (F.col("doc_id") + PHANTOM_BASE).cast("string"),
        F.lit("</loc></url>"),
    )
    return listed.select("host", "doc_id", entry.alias("e"))


def _urlset(agg_col: F.Column) -> F.Column:
    return F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        agg_col,
        F.lit("</urlset>"),
    )


def fixture_sitemaps(docs: DataFrame) -> DataFrame:
    """documents -> one (host, xml) sitemap per fixture host: entries
    for every capture path with doc_id % 4 != 1 (lastmod = a
    deterministic date), plus one phantom entry per listed doc
    (doc_id + PHANTOM_BASE) that no capture matches."""
    per_host = _fixture_entries(docs)
    return per_host.groupBy("host").agg(
        _urlset(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "e"))
                    ),
                    lambda s: s.e,
                ),
                "",
            )
        ).alias("xml")
    )


def sql_fixture_sitemaps(table: str = "documents") -> str:
    """DuckDB twin of fixture_sitemaps over the documents table."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as robots_ops

    caps = robots_ops.sql_capture_paths(table)
    return f"""
        SELECT host,
               '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               || string_agg(
                      '<url><loc>http://' || host || path
                      || '</loc><lastmod>2024-01-'
                      || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                      || '</lastmod></url>'
                      || '<url><loc>http://' || host || '/phantom/'
                      || CAST(doc_id + {PHANTOM_BASE} AS VARCHAR)
                      || '</loc></url>',
                      '' ORDER BY doc_id)
               || '</urlset>' AS xml
        FROM ({caps}) c
        WHERE doc_id % 4 <> 1
        GROUP BY host"""


def fixture_sitemap_payloads(docs: DataFrame) -> DataFrame:
    """The wire-format leg of the sitemap fixture (r12): each host's
    XML encoded to BYTES, gzipped (deterministic, mtime=0) for hosts
    whose digit is even and plain UTF-8 for the rest — so the gate
    round-trips both codecs every run."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, xml in zip(pdf["host"], pdf["xml"]):
                raw = str(xml).encode("utf-8")
                if int(str(host)[1]) % 2 == 0:
                    buf = io.BytesIO()
                    with _gzip.GzipFile(
                        fileobj=buf, mode="wb", mtime=0
                    ) as f:
                        f.write(raw)
                    raw = buf.getvalue()
                rows.append((str(host), raw))
            yield pd.DataFrame(rows, columns=["host", "payload"])

    return fixture_sitemaps(docs).mapInPandas(
        batches, SITEMAP_PAYLOAD_SCHEMA
    )


def fixture_sitemap_index(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two-level fixture (r12): per host a <sitemapindex> naming two
    child sitemaps (/sitemap-a.xml, /sitemap-b.xml) that split the
    host's entries by doc_id parity.  Returns (index, children) —
    children as (host, child, xml) with ``child`` the path the index
    names."""
    per_host = _fixture_entries(docs).withColumn(
        "child",
        F.when(F.col("doc_id") % 2 == 0, F.lit("/sitemap-a.xml")).otherwise(
            F.lit("/sitemap-b.xml")
        ),
    )
    children = per_host.groupBy("host", "child").agg(
        _urlset(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "e"))),
                    lambda s: s.e,
                ),
                "",
            )
        ).alias("xml")
    )
    index = children.groupBy("host").agg(
        F.concat(
            F.lit(
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("child")),
                    lambda c: F.concat(
                        F.lit("<sitemap><loc>http://"),
                        F.col("host"),
                        c,
                        F.lit("</loc></sitemap>"),
                    ),
                ),
                "",
            ),
            F.lit("</sitemapindex>"),
        ).alias("xml")
    )
    return index, children


def expand_sitemap_index(index: DataFrame, children: DataFrame) -> DataFrame:
    """The two-level walk a crawler runs (r12): parse the
    <sitemapindex> for child locations, fetch exactly the named
    children, parse their <urlset> bodies.  The child-name table is
    host-cardinality small (protocol: one level, 50k children max) —
    broadcast onto the child bodies; everything else is the flat
    parse."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    named = sitemap_index_children(index).select(
        "host", url_ops.url_path_query("child_loc").alias("child")
    ).distinct()
    fetched = children.join(F.broadcast(named), ["host", "child"]).select(
        "host", "xml"
    )
    return parse_sitemaps(fetched)


def oracle_index_expanded_sql(table: str = "documents") -> str:
    """DuckDB twin of the index walk over the fixture: every entry
    lands in exactly one named child, so the expansion equals the
    FLAT fixture parse — the twin re-derives that equivalence."""
    return sql_parse_sitemaps(sql_fixture_sitemaps(table))


def recrawl_candidates(
    sitemap_urls: DataFrame,
    captures: DataFrame,
    date_col: str = "captured_date",
) -> DataFrame:
    """Recrawl scheduling (r12): sitemap entries whose <lastmod> is
    NEWER than the capture date — the page changed since we fetched
    it.  (Never-captured entries are the coverage report's fetch-gap
    column, not recrawls.)  One equi-join on (host, path) + a date
    compare; the sitemap side is 50k-capped per host, flat skew."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    sm = sitemap_urls.filter(F.col("lastmod").isNotNull()).select(
        "host",
        url_ops.url_path_query("loc").alias("path"),
        "lastmod",
    )
    cap = captures.select("host", "path", date_col)
    return (
        sm.join(cap, ["host", "path"])
        .filter(F.col("lastmod") > F.col(date_col))
        .select("host", "path", "lastmod", date_col)
    )


def with_capture_dates(captures: DataFrame) -> DataFrame:
    """Deterministic capture-date fixture: 2024-01-01 + (doc_id*11)%28
    days — decorrelated from the lastmod cycle so the stale subset is
    nontrivial in both directions."""
    return captures.withColumn(
        "captured_date",
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            ((F.col("doc_id") * 11) % 28).cast("int"),
        ),
    )


def oracle_recrawl_sql(table: str = "documents") -> str:
    """DuckDB twin: fixture build -> parse -> capture dates -> join ->
    stale filter."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as robots_ops
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    parsed = sql_parse_sitemaps(sql_fixture_sitemaps(table))
    return f"""
        WITH sm AS (
            SELECT host, {url_ops.sql_url_path_query('loc')} AS path,
                   lastmod
            FROM ({parsed}) p WHERE lastmod IS NOT NULL
        ),
        cap AS (
            SELECT host, path,
                   DATE '2024-01-01'
                       + CAST((doc_id * 11) % 28 AS INTEGER)
                       AS captured_date
            FROM ({robots_ops.sql_capture_paths(table)}) c
        )
        SELECT host, path, lastmod, captured_date
        FROM sm JOIN cap USING (host, path)
        WHERE lastmod > captured_date"""


def coverage_report_discovered(
    robots: DataFrame, payloads: DataFrame, captures: DataFrame
) -> DataFrame:
    """The coverage audit as a crawler actually runs it (r12): only
    sitemaps DECLARED via robots.txt ``Sitemap:`` directives are
    fetched and parsed — undeclared hosts' captures all count as
    off-sitemap.  Chain: parse directives -> restrict the payload
    table to declared (host, url) -> gunzip/decode -> parse ->
    coverage join.  The directive table is host-cardinality small and
    broadcast."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    declared = parse_sitemap_directives(robots).select(
        url_ops.url_host("sitemap_url").alias("host"),
        url_ops.url_path_query("sitemap_url").alias("sm_path"),
    ).filter(F.col("sm_path") == "/sitemap.xml").distinct()
    fetched = payloads.join(F.broadcast(declared), "host").select(
        "host", "payload"
    )
    sm = parse_sitemaps(sitemaps_from_bytes(fetched))
    return crawl_coverage_report(sm, captures)


def oracle_coverage_discovered_sql(
    declared_hosts: list[str], table: str = "documents"
) -> str:
    """DuckDB twin of coverage_report_discovered: the robots-declared
    host list locally recomputed (VALUES-style IN list — the codec
    oracle discipline), then the same fixture-build -> parse ->
    coverage SQL restricted to it."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as robots_ops
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    hosts = ", ".join(f"'{h}'" for h in sorted(declared_hosts))
    parsed = sql_parse_sitemaps(
        f"SELECT * FROM ({sql_fixture_sitemaps(table)}) fs "
        f"WHERE host IN ({hosts})"
    )
    return f"""
        WITH sm AS (
            SELECT DISTINCT host,
                   {url_ops.sql_url_path_query('loc')} AS path
            FROM ({parsed}) p
        ),
        cap AS (
            SELECT DISTINCT host, path
            FROM ({robots_ops.sql_capture_paths(table)}) c
        ),
        j AS (
            SELECT COALESCE(sm.host, cap.host) AS host,
                   sm.path IS NOT NULL AS in_sitemap,
                   cap.path IS NOT NULL AS captured
            FROM sm FULL OUTER JOIN cap
              ON sm.host = cap.host AND sm.path = cap.path
        )
        SELECT host,
               CAST(SUM(CASE WHEN in_sitemap THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sitemap,
               CAST(SUM(CASE WHEN captured THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_captured,
               CAST(SUM(CASE WHEN in_sitemap AND captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN in_sitemap AND NOT captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_uncaptured,
               CAST(SUM(CASE WHEN NOT in_sitemap AND captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_off_sitemap
        FROM j GROUP BY host"""


def oracle_coverage_report_sql(table: str = "documents") -> str:
    """Full SQL twin of fixture build -> parse -> coverage report."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import robots as robots_ops
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops

    parsed = sql_parse_sitemaps(sql_fixture_sitemaps(table))
    return f"""
        WITH sm AS (
            SELECT DISTINCT host,
                   {url_ops.sql_url_path_query('loc')} AS path
            FROM ({parsed}) p
        ),
        cap AS (
            SELECT DISTINCT host, path
            FROM ({robots_ops.sql_capture_paths(table)}) c
        ),
        j AS (
            SELECT COALESCE(sm.host, cap.host) AS host,
                   sm.path IS NOT NULL AS in_sitemap,
                   cap.path IS NOT NULL AS captured
            FROM sm FULL OUTER JOIN cap
              ON sm.host = cap.host AND sm.path = cap.path
        )
        SELECT host,
               CAST(SUM(CASE WHEN in_sitemap THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sitemap,
               CAST(SUM(CASE WHEN captured THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_captured,
               CAST(SUM(CASE WHEN in_sitemap AND captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN in_sitemap AND NOT captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_uncaptured,
               CAST(SUM(CASE WHEN NOT in_sitemap AND captured THEN 1
                        ELSE 0 END) AS BIGINT) AS n_off_sitemap
        FROM j GROUP BY host"""
