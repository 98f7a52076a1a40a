"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (it has no text ops): token counting,
quality scoring, language-ID heuristics, and document fingerprinting
over the ``documents`` table — the building blocks of an LLM-data
curation pipeline, each expressed as **native Spark column expressions**
(higher-order array functions, no Python UDFs) so they stay inside
WholeStageCodegen and scale linearly with no shuffle at all: every
operator here is a pure per-row map over the corpus.

Each operator has a DuckDB-SQL twin (``oracle_*``) built from the SAME
formula so the correctness gate can hash-compare results.  Engine
parity gotchas handled here:
- Spark ``split('', pat)`` -> [] but DuckDB -> [''] — both sides filter
  empty tokens.
- Spark size() is INT, DuckDB len() is BIGINT — Spark side casts to long.
- All ratios are rounded (6dp) on both sides so double noise can't
  flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    int_avg,
    sql_int_avg,
)

def dround(col: Column, digits: int) -> Column:
    """Deterministic cross-engine rounding: floor(x*10^d + 0.5)/10^d.

    Unlike ROUND, this uses only binary-double arithmetic, so Spark and
    DuckDB produce bit-identical results for identical inputs (ROUND
    disagrees on non-representable near-ties: Spark rounds the exact
    binary value, DuckDB the decimal rendering).  Non-negative inputs
    only.
    """
    scale = float(10 ** digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_dround(expr: str, digits: int) -> str:
    # 1eN-style literals, not "100.0": Spark SQL parses decimal-form
    # literals as DECIMAL (making FLOOR(...)/100.0 a DECIMAL result)
    # while DuckDB makes them DOUBLE; e-notation is DOUBLE in both, so
    # the same text is schema-stable when run dialect-common.
    return f"FLOOR(({expr}) * 1e{digits} + 0.5) / 1e{digits}"


# Polynomial rolling-hash modulus (2^31 - 1, Mersenne prime).
FP_MOD = 2147483647
FP_BASE = 31

# The "BPE-ish" token pattern: letter runs, digit runs, single symbols.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_PATTERN = r"[^a-zA-Z0-9\s]"

# Tiny per-language stopword lists for the lang-ID heuristic.
# Ordered dict — the CASE tie-break uses this (alphabetical) order.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "es", "un", "en", "que"],
    "fr": ["le", "la", "de", "et", "est", "un", "dans", "que"],
}


# ---------------------------------------------------------------------------
# Column-level building blocks (Spark side)
# ---------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty tokens dropped (canonical
    across engines)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column) -> Column:
    """Token count as a codegen'd regex scan: a token is a maximal run
    of non-whitespace, so counting ``\\S+`` matches ≡ size(tokens) with
    no interpreted array lambda."""
    return F.regexp_count(col, F.lit(r"\S+")).cast("long")


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish word/number/symbol pieces."""
    return F.regexp_count(col, F.lit(BPE_PATTERN)).cast("long")


def punct_ratio(col: Column) -> Column:
    """Punctuation-character share of the text.  The GREATEST(len,1)
    guard matters: empty/whitespace-only docs are routine in corpus
    curation, and under Spark 4's ANSI mode a bare len division raises
    DIVIDE_BY_ZERO and aborts the job (ratio is 0 either way — the
    regexp count is 0 when length is 0)."""
    return dround(
        F.regexp_count(col, F.lit(PUNCT_PATTERN))
        / F.greatest(F.length(col), F.lit(1)),
        6,
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Stopword hit ratio.  A whitespace token equals a stopword iff the
    word appears bounded by string-edge/whitespace on both sides, so the
    hit count is a single codegen'd regex scan (lookaround anchors) —
    equivalent to filtering the token array, without the interpreted
    lambda."""
    words = LANG_STOPWORDS[lang]
    pat = r"(?:^|(?<=\s))(?:" + "|".join(words) + r")(?=\s|$)"
    hits = F.regexp_count(col, F.lit(pat)).cast("long")
    return dround(hits / F.greatest(token_count(col), F.lit(1)), 6)


def avg_token_len(col: Column) -> Column:
    """Mean token length.  Σ token lengths ≡ count of non-whitespace
    chars (tokens are maximal ``\\S`` runs), so one regex scan replaces
    the interpreted transform+aggregate fold."""
    total = F.regexp_count(col, F.lit(r"\S")).cast("long")
    return dround(total / F.greatest(token_count(col), F.lit(1)), 4)


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: enough tokens, low symbol
    noise, natural-language stopword density.  The formula (not learned,
    just fixed) is mirrored verbatim in the oracle SQL."""
    length_term = F.least(F.lit(1.0), token_count(col) / F.lit(50.0))
    noise_term = F.lit(1.0) - punct_ratio(col)
    stop_term = F.lit(0.5) + F.lit(0.5) * F.least(
        F.lit(1.0), stopword_ratio(col) * F.lit(5.0)
    )
    return dround(length_term * noise_term * stop_term, 6)


def fingerprint_expr(col: Column) -> Column:
    """Polynomial rolling hash of the normalized text (lower+trim) mod
    2^31-1, as a pure column expression (interpreted fold — the
    formula-of-record, mirrored 1:1 in the oracle SQL).  Use
    ``fingerprint`` for the production path."""
    norm = F.lower(F.trim(col))
    chars = F.filter(F.split(norm, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
    )


# B^k mod FP_MOD power table, grown on demand and cached per worker.
_FP_POWS = np.array([1], dtype=np.uint64)


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POWS
    if len(_FP_POWS) < n:
        ext = np.empty(n, dtype=np.uint64)
        k = len(_FP_POWS)
        ext[:k] = _FP_POWS
        for i in range(k, n):
            ext[i] = (ext[i - 1] * FP_BASE) % FP_MOD
        _FP_POWS = ext
    return _FP_POWS


@F.pandas_udf(LongType())
def _fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched twin of ``fingerprint_expr``: identical modular
    arithmetic (Horner fold ≡ Σ c_i·B^(n-1-i) mod M), vectorized with
    numpy.  Per-term products are < 2^52 (codepoint < 2^21 × pow < 2^31)
    and reduced mod M before summing, so uint64 never overflows for
    docs under 2^33 chars.  ~100× faster than the interpreted fold."""
    out: list[int | None] = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        s = t.strip(" ").lower()
        if not s:
            out.append(0)
            continue
        codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        n = len(codes)
        weights = _fp_powers(n)[:n][::-1]
        terms = (codes.astype(np.uint64) * weights) % FP_MOD
        out.append(int(terms.sum() % FP_MOD))
    return pd.Series(out, dtype="Int64")


def fingerprint(col: Column) -> Column:
    """Production fingerprint: same value as ``fingerprint_expr`` (test-
    enforced), computed via the Arrow-vectorized UDF — the per-char
    Horner fold is the one text feature Spark's codegen can't express
    natively, and the interpreted lambda costs ~0.4 ms/doc."""
    return _fingerprint_udf(col)


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_ratio(col, lang) for lang in LANG_STOPWORDS}


def predicted_lang(col: Column) -> Column:
    """Argmax of per-language stopword overlap; ties resolve in
    alphabetical language order; all-zero -> 'und'."""
    scores = lang_scores(col)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.lit("und")
    # Build CASE in reverse priority so earlier langs win ties.
    for lg in reversed(langs):
        out = F.when(
            (best > 0) & (scores[lg] == best), F.lit(lg)
        ).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# DataFrame-level operators
# ---------------------------------------------------------------------------

def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document feature extraction: counts, ratios, quality score,
    fingerprint.  Pure narrow map — no shuffle."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        avg_token_len(c).alias("avg_token_len"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality_score"),
        fingerprint(c).alias("fingerprint"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document language scores + argmax prediction."""
    c = F.col(text_col)
    scores = lang_scores(c)
    return docs.select(
        "doc_id",
        *[scores[lg].alias(f"score_{lg}") for lg in LANG_STOPWORDS],
        predicted_lang(c).alias("predicted_lang"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_token_share``     most frequent token's share of all tokens
    - ``repeated_token_frac`` share of token occurrences whose token
                              appears >= 2 times in the doc
    - ``top_bigram_share``    most frequent token-bigram's share of all
                              bigrams

    High values mark boilerplate/spam (repeated nav bars, keyword
    stuffing) — standard corpus-curation filters alongside
    ``quality_score``.

    Plan shape: flat token rows (posexplode) -> two hash aggregates
    (doc+token counts, then per-doc stats) with map-side partial
    aggregation; bigrams via window lead() over the token stream (no
    arrays, fully codegen).  Shuffles on doc_id only.  Docs with zero
    tokens drop out (same as the oracle); one-token docs have no
    bigrams -> share 0.
    """
    tk = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    tok_counts = tk.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("max_tok"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("rep"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = tk.select(
        "doc_id",
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("bigram"),
        F.lead("tok", 1).over(w).isNotNull().alias("keep"),
    ).filter("keep")
    bg_stats = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg"), F.sum("c").alias("n_bigrams"))
    )
    joined = tok_stats.join(bg_stats, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        dround(F.col("max_tok") / F.col("n_tokens"), 6).alias("top_token_share"),
        dround(F.col("rep") / F.col("n_tokens"), 6).alias("repeated_token_frac"),
        dround(
            F.coalesce(F.col("max_bg") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("top_bigram_share"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB dialect), same formulas
# ---------------------------------------------------------------------------

def _sql_tokens(t: str) -> str:
    return f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"


def _sql_token_count(t: str) -> str:
    return f"len({_sql_tokens(t)})"


def _sql_punct_ratio(t: str) -> str:
    return sql_dround(
        f"len(regexp_extract_all({t}, '{PUNCT_PATTERN}'))"
        f" / GREATEST(LENGTH({t}), 1)",
        6,
    )


def _sql_stopword_ratio(t: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    hits = f"len(list_filter({_sql_tokens(t)}, x -> list_contains([{words}], x)))"
    return sql_dround(f"{hits} / GREATEST({_sql_token_count(t)}, 1)", 6)


def sql_quality_score(t: str) -> str:
    """DuckDB twin of :func:`quality_score` (same fixed formula)."""
    ntok = _sql_token_count(t)
    return sql_dround(
        f"LEAST(1.0, {ntok} / 50.0) * (1.0 - {_sql_punct_ratio(t)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(t, 'en')} * 5.0))",
        6,
    )


def oracle_text_features_sql(table: str = "documents", t: str = "text") -> str:
    toks = _sql_tokens(t)
    ntok = _sql_token_count(t)
    return f"""
        SELECT doc_id,
               CAST(LENGTH({t}) AS BIGINT) AS n_chars,
               {ntok} AS n_tokens,
               CAST(len(regexp_extract_all({t}, '{BPE_PATTERN}')) AS BIGINT)
                   AS n_bpe_tokens,
               {sql_dround(f"list_sum(list_transform({toks}, x -> CAST(LENGTH(x) AS BIGINT))) / GREATEST({ntok}, 1)", 4)} AS avg_token_len,
               {_sql_punct_ratio(t)} AS punct_ratio,
               {_sql_stopword_ratio(t, "en")} AS stopword_ratio,
               {sql_quality_score(t)} AS quality_score,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(LOWER(TRIM({t})), ''), c -> c <> ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
        FROM {table}
    """


def sql_lang_score_cols(t: str) -> str:
    """Per-language stopword-score select-list fragment (score_<lg>
    columns), the DuckDB twin of :func:`lang_scores`."""
    return ",\n               ".join(
        f"{_sql_stopword_ratio(t, lg)} AS score_{lg}"
        for lg in LANG_STOPWORDS
    )


def sql_predicted_lang_case() -> str:
    """Argmax CASE over score_<lg> columns (ties alphabetical,
    all-zero -> 'und') — twin of :func:`predicted_lang`; apply over a
    subquery that selects :func:`sql_lang_score_cols`."""
    langs = list(LANG_STOPWORDS)
    best = "GREATEST(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {best} > 0 AND score_{lg} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return case


def oracle_language_id_sql(table: str = "documents", t: str = "text") -> str:
    langs = list(LANG_STOPWORDS)
    score_cols = sql_lang_score_cols(t)
    case = sql_predicted_lang_case()
    return f"""
        SELECT doc_id, {", ".join(f"score_{lg}" for lg in langs)},
               {case} AS predicted_lang
        FROM (
            SELECT doc_id,
               {score_cols}
            FROM {table}
        )
    """


def oracle_repetition_signals_sql(
    table: str = "documents", t: str = "text"
) -> str:
    """Same repetition stats from flat unnested rows; bigrams from a
    1-based list_transform over the token list (empty for < 2 tokens),
    LEFT JOIN + COALESCE mirroring the Spark side's no-bigram case."""
    toks = _sql_tokens(t)
    return f"""
        WITH tl AS (
            SELECT doc_id, {toks} AS ts FROM {table}
        ),
        tok_counts AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(ts) AS tok FROM tl)
            GROUP BY doc_id, tok
        ),
        tok_stats AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   MAX(c) AS max_tok,
                   SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS rep
            FROM tok_counts GROUP BY doc_id
        ),
        bg_counts AS (
            SELECT doc_id, bigram, COUNT(*) AS c
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ts)),
                              i -> ts[i] || ' ' || ts[i + 1])) AS bigram
                FROM tl
            )
            GROUP BY doc_id, bigram
        ),
        bg_stats AS (
            SELECT doc_id, MAX(c) AS max_bg, SUM(c) AS n_bigrams
            FROM bg_counts GROUP BY doc_id
        )
        SELECT s.doc_id,
               s.n_tokens,
               {sql_dround("s.max_tok / s.n_tokens", 6)} AS top_token_share,
               {sql_dround("s.rep / s.n_tokens", 6)} AS repeated_token_frac,
               COALESCE({sql_dround("b.max_bg / b.n_bigrams", 6)}, 0.0)
                   AS top_bigram_share
        FROM tok_stats s LEFT JOIN bg_stats b USING (doc_id)
    """


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: no lookaround, no backrefs.  Order matters and
# is part of the contract: URLs first (so an email inside a URL is
# consumed as URL), then email, IPv4, phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask PII-shaped spans (URL/email/IPv4/phone) with typed
    placeholder tokens and report per-kind match counts.  Pure narrow
    map — sequential codegen'd regexp_replace passes, no shuffle, no
    Python.  Counts are taken on the ORIGINAL text (before any
    replacement) so kinds don't steal each other's counts; the
    replacement chain applies in PII_PATTERNS order on both engines."""
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    red = c
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return docs.select("doc_id", *counts, red.alias("redacted_text"))


def oracle_pii_redact_sql(table: str = "documents", t: str = "text") -> str:
    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all({t}, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT doc_id,
               {counts},
               {red} AS redacted_text
        FROM {table}
    """


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Corpus-composition rollup per (source, lang): doc count, total
    and average token count, total characters — the curation dashboard
    a training-data pipeline checks before and after every filter
    stage.  One map-side-combinable groupBy; token counting is the
    codegen regex scan (no arrays); output bounded by
    sources x languages."""
    ntok = token_count(F.col("text"))
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ntok).alias("total_tokens"),
            dround(int_avg(ntok), 4).alias("avg_tokens"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


def oracle_corpus_stats_sql(table: str = "documents", t: str = "text") -> str:
    ntok = _sql_token_count(t)
    return f"""
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT)      AS n_docs,
               CAST(SUM({ntok}) AS BIGINT)   AS total_tokens,
               {sql_dround(sql_int_avg(ntok), 4)} AS avg_tokens,
               CAST(SUM(LENGTH({t})) AS BIGINT) AS total_chars
        FROM {table}
        GROUP BY source, lang
        ORDER BY source, lang
    """


# ---------------------------------------------------------------------------
# Text normalization (the standard pre-dedup canonicalization pass)
# ---------------------------------------------------------------------------

def norm_expr(col: Column) -> Column:
    """The canonicalization column expression behind
    :func:`normalize_text`, exposed so composed pipelines
    (``training.curated_docs``) can inline it without a join back."""
    norm = F.lower(col)
    norm = F.regexp_replace(norm, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ")
    norm = F.regexp_replace(norm, r"\s+", " ")
    return F.trim(norm)


def sql_norm_expr(t: str) -> str:
    """DuckDB twin of :func:`norm_expr` (same regexes, same order)."""
    return (
        "TRIM(REGEXP_REPLACE(REGEXP_REPLACE("
        f"LOWER({t}), "
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', ' ', 'g'), "
        "'\\s+', ' ', 'g'))"
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Conservative text canonicalization ahead of dedup/fingerprinting:
    lowercase, control characters stripped, runs of whitespace collapsed
    to single spaces, ends trimmed.  Pure column expressions (three
    chained codegen'd regexp passes + lower) — a narrow map, no shuffle,
    trivially scan-parallel at 100 TB.  Unicode-compat folding (NFKC) is
    deliberately NOT attempted: it is locale/library-dependent and would
    break cross-engine reproducibility; pipelines needing it plug a
    pandas_udf stage in front.

    Output: (doc_id, norm_text, n_chars_norm) with the post-norm length
    for shrinkage auditing."""
    norm = norm_expr(F.col(text_col))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def oracle_normalize_text_sql(table: str = "documents", t: str = "text") -> str:
    return f"""
        SELECT doc_id,
               TRIM(REGEXP_REPLACE(REGEXP_REPLACE(
                   LOWER({t}),
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS norm_text,
               CAST(LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(
                   LOWER({t}),
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', ' ', 'g'),
                   '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
        FROM {table}
    """


# ---------------------------------------------------------------------------
# r11: compression-ratio quality signal (the CCNet/RefinedWeb-style
# low-entropy detector): boilerplate, keyword stuffing, and template
# spam compress far better than natural prose; near-random payloads
# barely compress at all.  zlib is not SQL-expressible, so the gate
# follows the codec discipline — a deterministic synthetic corpus
# spanning the entropy range, a local twin (compression_stats), and a
# VALUES-literal oracle.  The distributed operator is the codec-tier
# shape: Arrow mapInPandas projection, no shuffle, memory bounded by
# batch size.  DEFLATE output bytes are a pure function of
# (input, level) for a fixed zlib build, and both gate sides run the
# same build; the RATIO is a heuristic signal either way.
# ---------------------------------------------------------------------------

COMPRESSION_LEVEL = 6


def compression_stats(text: str) -> tuple[int, int, int]:
    """(n_raw_bytes, n_gz_bytes, ratio_e6) for one document — the
    local twin shared with the VALUES oracle.  ratio_e6 =
    compressed/raw in e6 fixed point (integer floor — no float in
    gate-checked values); empty text is defined as ratio 10^6
    (incompressible)."""
    import zlib

    raw = text.encode("utf-8")
    n_raw = len(raw)
    if n_raw == 0:
        return 0, 0, 10**6
    n_gz = len(zlib.compress(raw, COMPRESSION_LEVEL))
    return n_raw, n_gz, n_gz * 10**6 // n_raw


def compression_signals(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_raw_bytes, n_gz_bytes, ratio_e6) per document."""
    from collections.abc import Iterator

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_raw_bytes", T.LongType()),
            T.StructField("n_gz_bytes", T.LongType()),
            T.StructField("ratio_e6", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                # NULL text = empty (not the string "None")
                (
                    int(did),
                    *compression_stats("" if txt is None else str(txt)),
                )
                for did, txt in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return docs.select("doc_id", text_col).mapInPandas(batches, schema)


def make_compression_doc(i: int) -> str:
    """Deterministic fixture doc spanning the entropy range: i%3==0
    is template spam (one phrase repeated), ==1 is natural-ish prose
    (rotating sentences), ==2 is near-random (sha256 hex chain —
    ratio close to or above 10^6 once the gzip header amortizes)."""
    import hashlib

    kind = i % 3
    n = 20 + (i * 7) % 60
    if kind == 0:
        return ("click here to win big prizes now " * n).strip()
    if kind == 1:
        sents = [
            "The quarterly report shows steady growth in retail.",
            "Customers in the northern region ordered more parts.",
            "Suppliers adjusted their prices after the holidays.",
            "The committee reviewed shipping priorities on Monday.",
            "Analysts expect the trend to continue next year.",
        ]
        return " ".join(sents[(i + k) % len(sents)] for k in range(n))
    h = hashlib.sha256(str(i).encode()).hexdigest()
    parts = []
    for _ in range(n):
        parts.append(h)
        h = hashlib.sha256(h.encode()).hexdigest()
    return "".join(parts)


def synthesize_compression_corpus(spark, n: int = 60) -> DataFrame:
    rows = [(i, make_compression_doc(i)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def oracle_compression_signals_values(n: int = 60) -> str:
    rows = ", ".join(
        "({}, {}, {}, {})".format(i, *compression_stats(make_compression_doc(i)))
        for i in range(n)
    )
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(n_raw_bytes AS BIGINT) AS n_raw_bytes, "
        "CAST(n_gz_bytes AS BIGINT) AS n_gz_bytes, "
        "CAST(ratio_e6 AS BIGINT) AS ratio_e6 "
        f"FROM (VALUES {rows}) AS t(doc_id, n_raw_bytes, n_gz_bytes,"
        " ratio_e6) ORDER BY doc_id"
    )
