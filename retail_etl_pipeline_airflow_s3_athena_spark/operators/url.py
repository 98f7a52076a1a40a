"""URL canonicalization + provenance-level dedup — the step a real
crawl pipeline runs BEFORE content dedup (r9 verdict #5).

Reference scope: none (the reference ingests CSVs, not crawls) —
extension coverage for the crawl→document front door that
operators/warc.py opens.  Common Crawl-scale dedup starts at the URL:
the same resource is captured many times under cosmetically different
URIs (scheme/host case, explicit default ports, fragments, tracking
parameters), and collapsing those captures by CANONICAL URL is orders
of magnitude cheaper than fingerprinting their bodies — one string
projection and one exact groupBy, no shingling.

Canonicalization rules (the conservative, semantics-preserving set):
- scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
- explicit default port stripped (``:80`` for http, ``:443`` for
  https — RFC 3986 §6.2.3);
- fragment removed (never sent to the server);
- tracking query parameters dropped (``utm_*``, ``gclid``,
  ``fbclid``, ``ref``) while every other parameter is KEPT in its
  original order — reordering or dropping real params would merge
  genuinely different resources;
- empty path normalized to ``/`` (RFC 3986 §6.2.3).

Everything is built-in Spark column expressions (regexp_extract /
regexp_replace / filter / array_join) — JVM-side, no Python in the
hot path.  The one higher-order lambda (the tracking-param filter)
runs per-row over a handful of array elements, not over the corpus.
Each rule has a DuckDB SQL twin (``sql_canonical_url``) so the driver
oracle re-derives the canonicalization independently — the gate
hashes the RULES, not just the plumbing.

Scale (100 TB): one narrow projection + one exact-key groupBy on the
canonical URL — the same single-shuffle shape as dedup_exact
(operators/dedup.py).  Skew note: a crawl's full-URL key histogram is
far flatter than its host histogram (dedup by host would skew; by
URL does not) — the worst key holds one resource's recrawl count,
bounded by crawl policy, so no salting is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters dropped by canonicalization.  Matches the whole
# param name (utm_* wildcard), never a prefix of a real name
# ("ref=x" drops, "referrer=x" stays).
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_MAXLEN = 1 << 30


def canonical_url(url: Column | str) -> Column:
    """The canonical form of ``url`` per the module rules — a pure
    built-in column expression."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*$", "")
    base = F.regexp_replace(no_frag, r"\?.*$", "")
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    rest = F.regexp_replace(base, _SCHEME_RE, "")
    authority = F.lower(F.regexp_extract(rest, "^([^/]*)", 1))
    path_raw = F.substring(
        rest, F.length(authority) + F.lit(1), F.lit(_MAXLEN)
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    host = (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            F.substring(authority, F.lit(1), F.length(authority) - F.lit(3)),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            F.substring(authority, F.lit(1), F.length(authority) - F.lit(4)),
        )
        .otherwise(authority)
    )
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )


def url_canonical_dedup(
    captures: DataFrame, url_col: str = "target_uri"
) -> DataFrame:
    """Collapse crawl captures by canonical URL: one row per canonical
    URL with the capture count and the kept raw URI
    (lexicographically first — a deterministic tiebreak standing in
    for earliest-capture-wins).  One projection + one exact groupBy
    shuffle; n_captures is the per-URL recrawl count a crawl report
    feeds on."""
    canon = captures.select(
        F.col(url_col).alias("target_uri"),
        canonical_url(url_col).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_captures"),
        F.min("target_uri").alias("kept_uri"),
    )


def url_dedup_keep_first(
    captures: DataFrame, url_col: str = "target_uri"
) -> DataFrame:
    """Row-preserving variant of url_canonical_dedup: keep the WHOLE
    capture row (payload columns included) of the lexicographically
    first raw URI per canonical URL — the form a pipeline composes
    (the collapsed captures continue downstream, e.g. into content
    extraction).  One window shuffle on the canonical key; same flat
    skew profile as the aggregate form.

    Determinism: the raw URI alone ties when the SAME URI is captured
    twice (the common recrawl case), so every other orderable payload
    column is a secondary sort key — the kept row is then a pure
    function of the row set, never of partition order.  Rows that tie
    on ALL orderable columns are full duplicates, where any keeper is
    the same row."""
    from pyspark.sql import Window
    from pyspark.sql.types import MapType

    canon = captures.withColumn(
        "canonical_url", canonical_url(url_col)
    )
    tiebreak = [
        F.col(f.name)
        for f in captures.schema.fields
        if f.name != url_col and not isinstance(f.dataType, MapType)
    ]
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(url_col), *tiebreak
    )
    return (
        canon.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Deterministic messy-URL fixture: three capture variants per resource
# ---------------------------------------------------------------------------
#
# Resource id g = doc_id DIV 3; variant v = doc_id MOD 3:
#   v0: http://example.com/doc/{g}?page=2                    (canonical)
#   v1: HTTP://EXAMPLE.COM:80/doc/{g}?utm_campaign=retail&page=2
#   v2: http://Example.Com:80/doc/{g}?page=2&fbclid=abc123#frag-{doc_id}
# All three canonicalize to v0 — exercising every rule (scheme/host
# case, default port, tracking-param drop with real-param preserve,
# fragment) on real data volumes.  The SQL twin re-derives BOTH the
# construction and the canonicalization, so a rule drifting on either
# side flips the gate hash.


def with_messy_url(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    g = F.expr(f"{id_col} DIV 3")
    v = F.pmod(F.col(id_col), F.lit(3))
    url = (
        F.when(
            v == 0,
            F.concat(F.lit("http://example.com/doc/"), g, F.lit("?page=2")),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTP://EXAMPLE.COM:80/doc/"),
                g,
                F.lit("?utm_campaign=retail&page=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://Example.Com:80/doc/"),
                g,
                F.lit("?page=2&fbclid=abc123#frag-"),
                F.col(id_col),
            )
        )
    )
    return docs.withColumn("url", url)


def sql_messy_url(id_col: str = "doc_id") -> str:
    """DuckDB twin of with_messy_url's construction."""
    g = f"CAST({id_col} // 3 AS VARCHAR)"
    return f"""CASE {id_col} % 3
        WHEN 0 THEN 'http://example.com/doc/' || {g} || '?page=2'
        WHEN 1 THEN 'HTTP://EXAMPLE.COM:80/doc/' || {g}
                    || '?utm_campaign=retail&page=2'
        ELSE 'http://Example.Com:80/doc/' || {g}
             || '?page=2&fbclid=abc123#frag-' || CAST({id_col} AS VARCHAR)
    END"""


def url_host(url: Column | str) -> Column:
    """The URL's host key for robots.txt grouping (r11): lowercased
    authority with the scheme's default port stripped — the same host
    normalization canonical_url applies, exposed standalone so the
    robots admission tier (operators/robots.py) can key captures
    without canonicalizing them first."""
    u = F.col(url) if isinstance(url, str) else url
    base = F.regexp_replace(
        F.regexp_replace(u, "#.*$", ""), r"\?.*$", ""
    )
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    rest = F.regexp_replace(base, _SCHEME_RE, "")
    authority = F.lower(F.regexp_extract(rest, "^([^/]*)", 1))
    return (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            F.substring(authority, F.lit(1), F.length(authority) - F.lit(3)),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            F.substring(authority, F.lit(1), F.length(authority) - F.lit(4)),
        )
        .otherwise(authority)
    )


def url_path_query(url: Column | str) -> Column:
    """The URL's path plus RAW query string, fragment stripped, empty
    path normalized to ``/`` (r11) — what RFC 9309 matches robots
    rules against: the URI as fetched, BEFORE canonicalization drops
    tracking params."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*$", "")
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, "^([^/?]*)", 1)
    pq = F.substring(
        rest, F.length(authority) + F.lit(1), F.lit(_MAXLEN)
    )
    return F.when(pq == "", F.lit("/")).otherwise(
        F.when(pq.startswith("?"), F.concat(F.lit("/"), pq)).otherwise(pq)
    )


def sql_url_host(col: str) -> str:
    """DuckDB twin of url_host."""
    base = (
        f"regexp_replace(regexp_replace({col}, '#.*$', ''),"
        f" '\\?.*$', '')"
    )
    scheme = f"lower(regexp_extract({base}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({base}, '{_SCHEME_RE}', '')"
    authority = f"lower(regexp_extract({rest}, '^([^/]*)', 1))"
    return f"""CASE
        WHEN {scheme} = 'http' AND {authority} LIKE '%:80'
            THEN substring({authority}, 1, length({authority}) - 3)
        WHEN {scheme} = 'https' AND {authority} LIKE '%:443'
            THEN substring({authority}, 1, length({authority}) - 4)
        ELSE {authority} END"""


def sql_url_path_query(col: str) -> str:
    """DuckDB twin of url_path_query."""
    no_frag = f"regexp_replace({col}, '#.*$', '')"
    rest = f"regexp_replace({no_frag}, '{_SCHEME_RE}', '')"
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pq = f"substring({rest}, length({authority}) + 1)"
    return (
        f"CASE WHEN {pq} = '' THEN '/' "
        f"WHEN {pq} LIKE '?%' THEN '/' || {pq} "
        f"ELSE {pq} END"
    )


def sql_canonical_url(col: str) -> str:
    """DuckDB twin of canonical_url — every rule re-derived
    independently (RE2 + list lambdas instead of Java regex +
    Spark higher-order functions)."""
    no_frag = f"regexp_replace({col}, '#.*$', '')"
    base = f"regexp_replace({no_frag}, '\\?.*$', '')"
    query = f"regexp_extract({no_frag}, '\\?(.*)$', 1)"
    scheme = f"lower(regexp_extract({base}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({base}, '{_SCHEME_RE}', '')"
    authority = f"lower(regexp_extract({rest}, '^([^/]*)', 1))"
    path_raw = f"substring({rest}, length({authority}) + 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    host = f"""CASE
        WHEN {scheme} = 'http' AND {authority} LIKE '%:80'
            THEN substring({authority}, 1, length({authority}) - 3)
        WHEN {scheme} = 'https' AND {authority} LIKE '%:443'
            THEN substring({authority}, 1, length({authority}) - 4)
        ELSE {authority} END"""
    # coalesce: DuckDB array_to_string((empty list), sep) is NULL,
    # where Spark array_join gives '' — canonicalize to ''
    canon_q = (
        f"coalesce(array_to_string(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')), "
        "'&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {canon_q} = '' THEN '' ELSE '?' || {canon_q} END"
    )


def oracle_url_canonical_dedup_sql(
    table: str = "documents", id_col: str = "doc_id"
) -> str:
    """Full oracle for the url_canonical_dedup gate query: messy-URL
    construction + canonicalization + the dedup groupBy, all
    re-derived in DuckDB SQL over the same parquet."""
    return f"""
        WITH caps AS (
            SELECT {sql_messy_url(id_col)} AS target_uri FROM {table}
        ),
        canon AS (
            SELECT target_uri,
                   {sql_canonical_url('target_uri')} AS canonical_url
            FROM caps
        )
        SELECT canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_captures,
               MIN(target_uri) AS kept_uri
        FROM canon
        GROUP BY canonical_url
        ORDER BY canonical_url"""
