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
    series looks like."""
    messy = url_ops.with_messy_url(docs)
    pages = messy.select(
        "doc_id",
        "source",
        "url",
        html_ops.html_page_expr().alias("text"),
    )
    return warc_ops.docs_to_warc(pages, url_col="url")


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
               arg_min(text, target_uri) AS text
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
