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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    scale = 10 ** digits
    return f"FLOOR(({expr}) * {scale}.0 + 0.5) / {scale}.0"


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
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish word/number/symbol pieces."""
    return F.regexp_count(col, F.lit(BPE_PATTERN)).cast("long")


def punct_ratio(col: Column) -> Column:
    return dround(
        F.regexp_count(col, F.lit(PUNCT_PATTERN)) / F.length(col), 6
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    hits = F.size(
        F.filter(tokens(col), lambda x: x.isin(*words))
    ).cast("long")
    return dround(hits / F.greatest(token_count(col), F.lit(1)), 6)


def avg_token_len(col: Column) -> Column:
    total = F.aggregate(
        F.transform(tokens(col), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
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


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash of the normalized text (lower+trim) mod
    2^31-1 — a deterministic document fingerprint usable as an exact-dup
    key at 100 TB (8 bytes/doc)."""
    norm = F.lower(F.trim(col))
    chars = F.filter(F.split(norm, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
    )


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


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB dialect), same formulas
# ---------------------------------------------------------------------------

def _sql_tokens(t: str) -> str:
    return f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"


def _sql_token_count(t: str) -> str:
    return f"len({_sql_tokens(t)})"


def _sql_punct_ratio(t: str) -> str:
    return sql_dround(
        f"len(regexp_extract_all({t}, '{PUNCT_PATTERN}')) / LENGTH({t})", 6
    )


def _sql_stopword_ratio(t: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    hits = f"len(list_filter({_sql_tokens(t)}, x -> list_contains([{words}], x)))"
    return sql_dround(f"{hits} / GREATEST({_sql_token_count(t)}, 1)", 6)


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
               {sql_dround(f"LEAST(1.0, {ntok} / 50.0) * (1.0 - {_sql_punct_ratio(t)}) * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(t, 'en')} * 5.0))", 6)} AS quality_score,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(LOWER(TRIM({t})), ''), c -> c <> ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
        FROM {table}
    """


def oracle_language_id_sql(table: str = "documents", t: str = "text") -> str:
    langs = list(LANG_STOPWORDS)
    score_cols = ",\n               ".join(
        f"{_sql_stopword_ratio(t, lg)} AS score_{lg}" for lg in langs
    )
    best = "GREATEST(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {best} > 0 AND score_{lg} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
        SELECT doc_id, {", ".join(f"score_{lg}" for lg in langs)},
               {case} AS predicted_lang
        FROM (
            SELECT doc_id,
               {score_cols}
            FROM {table}
        )
    """
