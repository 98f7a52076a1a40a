"""The fused crawl front door: WARC shard in, training shards out, as
ONE lazy plan.

Reference scope: none (the reference ingests CSVs) — this composes the
engine's crawl-tier extensions end to end, the way a production
training-data pipeline actually runs them:

    WARC/1.0 bytes (gzip members, HTML bodies, messy capture URIs)
      → warc_ingest_uris          (shuffle-free Arrow ingest)
      → url_dedup_keep_first      (provenance dedup: one capture per
                                   canonical URL — operators/url.py)
      → html_extract              (boilerplate-dropped main text —
                                   operators/html.py)
      → build_training_set        (fingerprint dedup + quality gate +
                                   leakage-free split + first-fit pack
                                   — operators/training.py)

Correctness story: the fixture packs three capture variants of each
resource (scheme/host case, :80, tracking params, fragments — the
operators/url.py variant family) with HTML-wrapped bodies into REAL
WARC bytes, so the gate hashes WARC framing, gzip membering, URI
canonicalization (kept capture = lexicographic-min raw URI), HTML
extraction, curation, split assignment, AND packing in one value hash.
The DuckDB oracle re-derives every stage in SQL on ``documents``: the
messy-URL construction, the canonicalization rules, arg_min capture
selection, and the full build_training_set SQL over the kept docs.

Scale (100 TB): one scan of the shard table; the pack stage is the
fixture (real crawls START at WARC).  The pipeline's own cost is the
ingest projection + ONE window shuffle on the canonical URL + the
curation fingerprint exchange + the per-split packing window — no
stage materializes, no stage re-reads.  Each Arrow stage is bounded by
batch × archive size, the same contract warc_ingest documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import html as html_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import training
from retail_etl_pipeline_airflow_s3_athena_spark.operators import url as url_ops
from retail_etl_pipeline_airflow_s3_athena_spark.operators import warc as warc_ops

_RESOURCE_RE = "/doc/([0-9]+)"


def crawl_fixture_warcs(docs: DataFrame) -> DataFrame:
    """documents -> per-source WARC archives whose records are the
    three messy capture variants' HTML pages (the crawl-shard
    fixture).  Each doc becomes one capture; each resource
    (doc_id DIV 3) appears under up to three cosmetically different
    URIs with three DIFFERENT page bodies — exactly what a recrawl
    series looks like.  Bodies are HTTP content-encoded on the
    identity/gzip/deflate cycle (r12) — real crawl shards compress
    response bodies, so the whole crawl tier gates over the decode
    path."""
    messy = url_ops.with_messy_url(docs)
    pages = messy.select(
        "doc_id",
        "source",
        "url",
        html_ops.html_page_expr().alias("text"),
    )
    return warc_ops.docs_to_warc(pages, url_col="url", encode_bodies=True)


def crawl_to_training_set(docs: DataFrame) -> DataFrame:
    """(doc_id=resource id, split, n_tokens, bin_id): the full crawl →
    training pipeline over the WARC fixture, one lazy plan."""
    captures = warc_ops.warc_ingest_uris(crawl_fixture_warcs(docs))
    kept = url_ops.url_dedup_keep_first(captures)
    pages = kept.select(
        F.regexp_extract("canonical_url", _RESOURCE_RE, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("canonical_url").alias("source"),
        F.col("text").alias("html"),
    )
    recovered = html_ops.html_extract(pages).select("doc_id", "text")
    return training.build_training_set(recovered)


def oracle_crawl_to_training_set_sql(table: str = "documents") -> str:
    """DuckDB re-derivation of every stage: messy-URL construction →
    canonicalization → arg_min capture per canonical URL → (HTML
    round-trip = identity on the whitespace-normal corpus, the
    html_extract oracle's argument) → the build_training_set SQL over
    the kept docs keyed by resource id."""
    kept = f"""(
        SELECT CAST(regexp_extract(canonical_url, '{_RESOURCE_RE}', 1)
                    AS BIGINT) AS doc_id,
               arg_min(text, target_uri || chr(0) || text) AS text
        FROM (
            SELECT text, target_uri,
                   {url_ops.sql_canonical_url('target_uri')}
                       AS canonical_url
            FROM (
                SELECT text,
                       {url_ops.sql_messy_url()} AS target_uri
                FROM {table}
            ) c0
        ) c1
        GROUP BY canonical_url
    ) kept_docs"""
    return training.oracle_build_training_set_sql(table=kept)


def crawl_dedup_report(docs: DataFrame) -> DataFrame:
    """One-row crawl dedup FUNNEL over the WARC fixture — the report a
    crawl-processing run publishes: captures ingested, resources after
    URL-canonical dedup, unique documents after content-fingerprint
    dedup, survivors of the quality gate, plus exact e4-scaled drop
    rates per tier (integer arithmetic — no float in gate-checked
    values).  Demonstrates WHY the tiers run in this order at 100 TB:
    each stage's input is the previous stage's (strictly smaller)
    output, and the cheap tiers (URL string groupBy) run before any
    shingling or scoring.

    Plan: the ingest lineage feeds one count branch and one
    window+aggregate branch; the three 1-row aggregates combine via
    bounded crossJoins (the documented scalar pattern)."""
    from pyspark.sql import Window

    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        norm_expr,
        quality_score,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.training import (
        CURATION_QUALITY_CUTOFF,
    )

    captures = warc_ops.warc_ingest_uris(crawl_fixture_warcs(docs))
    kept = url_ops.url_dedup_keep_first(captures)
    pages = kept.select(
        F.regexp_extract("canonical_url", _RESOURCE_RE, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("canonical_url").alias("source"),
        F.col("text").alias("html"),
    )
    recovered = html_ops.html_extract(pages).select("doc_id", "text")
    base = recovered.select(
        "doc_id", norm_expr(F.col("text")).alias("norm_text")
    ).withColumn("fingerprint", _md5_hash(F.col("norm_text")))
    keeper = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    staged = base.withColumn("keeper", keeper)
    a = captures.agg(F.count("*").alias("n_captures"))
    b = staged.agg(
        F.count("*").alias("n_resources"),
        F.countDistinct("fingerprint").alias("n_unique_docs"),
        F.sum(
            (
                (F.col("doc_id") == F.col("keeper"))
                & (
                    quality_score(F.col("norm_text"))
                    >= CURATION_QUALITY_CUTOFF
                )
            ).cast("long")
        ).alias("n_curated"),
    )
    # SUM over zero rows is NULL; the oracle's COUNT-shaped twin gives 0
    b = b.withColumn(
        "n_curated", F.coalesce(F.col("n_curated"), F.lit(0).cast("long"))
    )

    def rate(num: str, den: str) -> F.Column:
        # empty-corpus guard: ANSI DIV throws on a zero denominator
        # (the empty-input sweep drives every query with zero rows)
        return F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(({den} - {num}) * 10000 DIV {den} AS BIGINT) END"
        )

    return a.crossJoin(b).select(
        "n_captures",
        "n_resources",
        "n_unique_docs",
        "n_curated",
        rate("n_resources", "n_captures").alias("url_dup_rate_e4"),
        rate("n_unique_docs", "n_resources").alias("content_dup_rate_e4"),
        rate("n_curated", "n_unique_docs").alias("quality_drop_rate_e4"),
    )


def oracle_crawl_dedup_report_sql(table: str = "documents") -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        _sql_punct_ratio,
        _sql_stopword_ratio,
        _sql_token_count,
        sql_dround,
        sql_norm_expr,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.training import (
        CURATION_QUALITY_CUTOFF,
    )

    nt = "norm_text"
    quality = sql_dround(
        f"LEAST(1.0, {_sql_token_count(nt)} / 50.0)"
        f" * (1.0 - {_sql_punct_ratio(nt)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(nt, 'en')} * 5.0))",
        6,
    )
    return f"""
        WITH caps AS (
            SELECT text, {url_ops.sql_messy_url()} AS target_uri
            FROM {table}
        ),
        canon AS (
            SELECT text, target_uri,
                   {url_ops.sql_canonical_url('target_uri')}
                       AS canonical_url
            FROM caps
        ),
        kept AS (
            SELECT CAST(regexp_extract(canonical_url, '{_RESOURCE_RE}', 1)
                        AS BIGINT) AS doc_id,
                   arg_min(text, target_uri || chr(0) || text) AS text
            FROM canon GROUP BY canonical_url
        ),
        base AS (
            SELECT doc_id,
                   {sql_norm_expr('text')} AS norm_text,
                   {_sql_md5_hash(sql_norm_expr('text'))} AS fingerprint
            FROM kept
        ),
        keepers AS (
            SELECT fingerprint, MIN(doc_id) AS keeper
            FROM base GROUP BY fingerprint
        ),
        counts AS (
            SELECT (SELECT COUNT(*) FROM caps) AS n_captures,
                   (SELECT COUNT(*) FROM base) AS n_resources,
                   (SELECT COUNT(DISTINCT fingerprint) FROM base)
                       AS n_unique_docs,
                   (SELECT COUNT(*) FROM base b
                    JOIN keepers k
                      ON b.fingerprint = k.fingerprint
                     AND b.doc_id = k.keeper
                    WHERE {quality} >= {CURATION_QUALITY_CUTOFF})
                       AS n_curated
        )
        SELECT CAST(n_captures AS BIGINT) AS n_captures,
               CAST(n_resources AS BIGINT) AS n_resources,
               CAST(n_unique_docs AS BIGINT) AS n_unique_docs,
               CAST(n_curated AS BIGINT) AS n_curated,
               CAST(CASE WHEN n_captures = 0 THEN 0
                    ELSE (n_captures - n_resources) * 10000 // n_captures
                    END AS BIGINT) AS url_dup_rate_e4,
               CAST(CASE WHEN n_resources = 0 THEN 0
                    ELSE (n_resources - n_unique_docs) * 10000
                         // n_resources
                    END AS BIGINT) AS content_dup_rate_e4,
               CAST(CASE WHEN n_unique_docs = 0 THEN 0
                    ELSE (n_unique_docs - n_curated) * 10000
                         // n_unique_docs
                    END AS BIGINT) AS quality_drop_rate_e4
        FROM counts"""


# ---------------------------------------------------------------------------
# r11: the ADMITTED crawl pipeline — robots.txt politeness fused in
# front of provenance dedup, the order a compliant crawl processor
# actually runs (admission is string matching, cheaper than any
# dedup tier, and content the crawler may not fetch must never reach
# training).
# ---------------------------------------------------------------------------

# The fixture crawl's single-host admission policy: resources whose id
# ends in 0 are off-limits, except the ids ending in 00 (a
# longest-match Allow override) — both rules see every capture
# variant (the trailing * spans the query string).
CRAWL_ROBOTS_TEXT = (
    "# example.com admission policy\n"
    "User-agent: *\n"
    "Disallow: /doc/*0?*\n"
    "Allow: /doc/*00?*\n"
)
CRAWL_ROBOTS_HOST = "example.com"
CRAWL_AGENT = "databot"


def crawl_admitted_training_set(docs: DataFrame) -> DataFrame:
    """crawl_to_training_set with RFC 9309 admission fused in front:
    WARC ingest → per-capture robots decision on the RAW URI's
    host + path?query (operators/robots.py; rules parsed by the
    DISTRIBUTED parser from real robots.txt bytes) → URL-canonical
    keep-first dedup → HTML extraction → curate/split/pack.  Still
    ONE lazy plan: the admission tier adds one broadcast join + one
    winner aggregation keyed by the capture URI, upstream of the
    canonical-URL window."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        robots as robots_ops,
    )

    spark = docs.sparkSession
    captures = warc_ops.warc_ingest_uris(crawl_fixture_warcs(docs))
    keyed = captures.withColumn(
        "host", url_ops.url_host("target_uri")
    ).withColumn("path", url_ops.url_path_query("target_uri"))
    robots = spark.createDataFrame(
        [(CRAWL_ROBOTS_HOST, CRAWL_ROBOTS_TEXT)],
        ["host", "robots_txt"],
    )
    rules = robots_ops.parse_robots(robots)
    admitted = robots_ops.robots_filter(
        keyed, rules, CRAWL_AGENT, id_col="target_uri"
    ).drop("host", "path")
    kept = url_ops.url_dedup_keep_first(admitted)
    pages = kept.select(
        F.regexp_extract("canonical_url", _RESOURCE_RE, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("canonical_url").alias("source"),
        F.col("text").alias("html"),
    )
    recovered = html_ops.html_extract(pages).select("doc_id", "text")
    return training.build_training_set(recovered)


def oracle_crawl_admitted_training_set_sql(table: str = "documents") -> str:
    """oracle_crawl_to_training_set_sql with the admission stage
    re-derived: the rules via the LOCAL reference parser (VALUES),
    host/path via the url twins, match + precedence via the general
    robots decision SQL — then the unchanged canon/kept/training
    chain over admitted captures only."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import (
        robots as robots_ops,
    )

    rule_rows = [
        (CRAWL_ROBOTS_HOST, agent, rule, pattern)
        for agent, rule, pattern in robots_ops.parse_robots_text(
            CRAWL_ROBOTS_TEXT
        )
    ]
    keyed_sql = f"""
        SELECT target_uri AS cap_id, text, target_uri,
               {url_ops.sql_url_host('target_uri')} AS host,
               {url_ops.sql_url_path_query('target_uri')} AS path
        FROM (
            SELECT text, {url_ops.sql_messy_url()} AS target_uri
            FROM {table}
        ) c0"""
    decisions = robots_ops.oracle_decisions_sql(
        rule_rows, keyed_sql, CRAWL_AGENT, id_col="cap_id"
    )
    kept = f"""(
        SELECT CAST(regexp_extract(canonical_url, '{_RESOURCE_RE}', 1)
                    AS BIGINT) AS doc_id,
               arg_min(text, target_uri || chr(0) || text) AS text
        FROM (
            SELECT k.text, k.target_uri,
                   {url_ops.sql_canonical_url('k.target_uri')}
                       AS canonical_url
            FROM ({keyed_sql}) k
            JOIN ({decisions}) d
              ON k.cap_id = d.cap_id AND d.allowed
        ) c1
        GROUP BY canonical_url
    ) kept_docs"""
    return training.oracle_build_training_set_sql(table=kept)
