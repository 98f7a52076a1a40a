"""Learned quality classifier: closed-form diagonal LDA in exact
integer arithmetic — the fastText/CCNet quality-filter tier.

Production curation stacks train a CHEAP linear classifier to mimic an
expensive grader (CCNet: wiki-vs-crawl fastText; Gopher: rule
ensembles), then run the linear model over the full corpus.  The
fixture's grader is the engine's own fixed quality heuristic
(``operators/text.quality_score`` — already value-hash-gated): label =
``quality_score >= 0.5``.  The classifier never sees the heuristic's
nonlinear form, only four integer count features — holdout accuracy
(pinned in tests/test_classifier.py) measures how well the linear
model recovers the grader, exactly the production question.

Reference scope: none (the reference's data_quality.py is per-column
null/dup counts) — extension coverage for the training-data tier,
the regress.py rationale.

Model: Fisher LDA with diagonal (pooled) covariance — the closed form
needs only per-class count/sum and a pooled sum-of-squares per
feature, all exact integer aggregates:

    mu1_j = S1_j / n1          (class means, e6 fixed point)
    var_j = E[x²] − E[x]²      (pooled, e6 fixed point)
    w_j   = (mu1_j − mu0_j) / var_j          (e6 fixed point)
    predict 1  ⟺  Σ w_j·x_j ≥ Σ w_j·(mu1_j + mu0_j)/2

Every division is the exact truncating DECIMAL(38,0) remainder-
subtraction form from ``operators/regress.py`` (Spark) mirrored by
HUGEINT ``//`` (DuckDB), with signs factored out — no float enters, so
fits, margins, and predictions are value-hash-identical cross-engine.

Plan shape (100 TB notes): ONE map-side-combinable aggregation to a
4-row fit table (melt via a 4-struct explode — corpus×4 narrow rows,
partial-aggregated before the exchange), a bounded 4-row driver
collect of the model (the classic train-then-broadcast serving shape),
then scoring is a pure whole-stage-codegen projection over the corpus
— no joins, no windows, nothing corpus-sized on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.regress import (
    _DEC,
    _signed_div_e,
    _trunc_div,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    LANG_STOPWORDS,
    PUNCT_PATTERN,
    _sql_punct_ratio,
    _sql_stopword_ratio,
    _sql_token_count,
    quality_score,
    sql_dround,
    token_count,
)

E6 = 10**6
TEACHER_THRESHOLD = 0.5
# alphabetical — the fit table's row order and the score expression's
# term order (term order is irrelevant to exactness: integer sums)
FEATURES = ["n_chars", "n_punct", "n_stops", "n_tokens"]

_EN_STOP_PAT = (
    r"(?:^|(?<=\s))(?:" + "|".join(LANG_STOPWORDS["en"]) + r")(?=\s|$)"
)


def _features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, n_punct, n_stops, n_tokens, label): four exact
    integer count features + the teacher label.  Pure narrow map —
    every count is one codegen'd regex scan (the text.py discipline)."""
    c = F.col(text_col)
    return docs.filter(c.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.length(c).cast("long").alias("n_chars"),
        F.regexp_count(c, F.lit(PUNCT_PATTERN)).cast("long").alias("n_punct"),
        F.regexp_count(c, F.lit(_EN_STOP_PAT)).cast("long").alias("n_stops"),
        token_count(c).alias("n_tokens"),
        (quality_score(c) >= F.lit(TEACHER_THRESHOLD))
        .cast("int")
        .alias("label"),
    )


def _lit_dec(v: int) -> Column:
    return F.lit(v).cast(_DEC)


def quality_model_fit(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The fitted model, one row per feature: (feature, n_pos, n_neg,
    mu_pos_e6, mu_neg_e6, var_e6, w_e6).  Degenerate classes (empty
    corpus, single-class labels) produce zero means/weights via the
    GREATEST(n, 1) guards rather than dividing by zero."""
    feats = _features(docs, text_col, id_col)
    melted = feats.select(
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.col(name).alias("x"),
                    )
                    for name in FEATURES
                ]
            )
        ).alias("e"),
    ).select("label", F.col("e.feature").alias("feature"), F.col("e.x").alias("x"))
    pos = F.col("label") == 1
    agg = melted.groupBy("feature").agg(
        F.sum(pos.cast("long")).alias("n_pos"),
        F.sum((~pos).cast("long")).alias("n_neg"),
        F.sum(F.when(pos, F.col("x")).otherwise(F.lit(0))).alias("s_pos"),
        F.sum(F.when(~pos, F.col("x")).otherwise(F.lit(0))).alias("s_neg"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias("q"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    one = _lit_dec(1)
    e6 = _lit_dec(E6)
    n_all = F.greatest(d("n_pos") + d("n_neg"), one)
    mu_pos = _trunc_div(e6 * d("s_pos"), F.greatest(d("n_pos"), one))
    mu_neg = _trunc_div(e6 * d("s_neg"), F.greatest(d("n_neg"), one))
    m_e6 = _trunc_div(e6 * (d("s_pos") + d("s_neg")), n_all)
    exq_e6 = _trunc_div(e6 * d("q"), n_all)
    var_e6 = F.greatest(one, exq_e6 - _trunc_div(m_e6 * m_e6, e6))
    w_e6 = _signed_div_e(
        mu_pos.cast(_DEC) - mu_neg.cast(_DEC), var_e6.cast(_DEC), E6
    )
    return agg.select(
        "feature",
        "n_pos",
        "n_neg",
        mu_pos.cast("long").alias("mu_pos_e6"),
        mu_neg.cast("long").alias("mu_neg_e6"),
        var_e6.cast("long").alias("var_e6"),
        w_e6.cast("long").alias("w_e6"),
    ).orderBy("feature")


def quality_model_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """Score every document under the fitted model: (doc_id, label,
    margin, predicted, correct).  ``margin`` is the exact integer
    ``2e6·Σ w_j·x_j − Σ w_j·(mu_pos_j + mu_neg_j)`` — positive means
    the decision rule Σ w·x ≥ Σ w·(mu1+mu0)/2 fires (ties predict 1,
    the CAST(m >= 0) convention).

    ``train_docs`` (default: ``docs``) separates fit from scoring for
    holdout evaluation — fit on the train split, score the full/held
    set.  The model is a bounded 4-row collect baked into a codegen'd
    projection (train-then-broadcast serving)."""
    fit_rows = {
        r["feature"]: r
        for r in quality_model_fit(
            train_docs if train_docs is not None else docs,
            text_col,
            id_col,
        ).collect()
    }
    feats = _features(docs, text_col, id_col)
    score = None
    thr = 0
    for name in FEATURES:
        r = fit_rows.get(name)
        w = int(r["w_e6"]) if r is not None else 0
        thr += w * (
            (int(r["mu_pos_e6"]) + int(r["mu_neg_e6"])) if r is not None else 0
        )
        term = _lit_dec(w) * F.col(name).cast(_DEC)
        score = term if score is None else score + term
    margin = _lit_dec(2 * E6) * score - _lit_dec(thr)
    # Runtime overflow guard: under non-ANSI Spark, decimal->long cast
    # silently NULLs on overflow.  The bound is proven for the CURRENT
    # weight/feature scales (test_margin_fits_bigint); if either grows,
    # fail loudly per-row rather than serve NULL margins.
    margin = F.when(
        F.abs(margin) < _lit_dec(1 << 62), margin
    ).otherwise(
        F.raise_error(
            F.lit(
                "quality_model margin exceeds the BIGINT bound — "
                "weights or feature scales grew past the fitted range"
            )
        )
    )
    return feats.select(
        "doc_id",
        "label",
        # Gate-surface canonicalization (r9 verdict #1): the exact
        # integer margin is computed in decimal but SURFACED as
        # BIGINT — decimal(38,0) is the only gate output type whose
        # Python value (Decimal) canonicalizes differently from the
        # DuckDB twin's int.  Bound: |margin| ≤ 2e6·Σ|w|·x + |thr|
        # with w_e6 ≲ 1e9 and x ≲ 1e5 stays orders under 2^63
        # (asserted by test_margin_fits_bigint).
        margin.cast("long").alias("margin"),
        (margin >= _lit_dec(0)).cast("int").alias("predicted"),
        (
            (margin >= _lit_dec(0)).cast("int") == F.col("label")
        ).cast("int").alias("correct"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DuckDB oracle twins — pure SQL (no VALUES literals): the whole fit
# and the scoring rule re-derive inside DuckDB from the same parquet.
# ---------------------------------------------------------------------------


def _sql_feats(table: str, t: str) -> str:
    """CTE body computing the four integer features + teacher label
    (the text.py SQL twins for tokenization/punct/stopwords, the
    quality_percentile_filter oracle's quality formula)."""
    ntok = _sql_token_count(t)
    quality = sql_dround(
        f"LEAST(1.0, {ntok} / 50.0) * (1.0 - {_sql_punct_ratio(t)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(t, 'en')} * 5.0))",
        6,
    )
    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
        feats AS (
            SELECT doc_id,
                   CAST(LENGTH({t}) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all({t}, '{PUNCT_PATTERN}'))
                        AS BIGINT) AS n_punct,
                   CAST(len(list_filter({_sql_tokens_expr(t)},
                        x -> list_contains([{stops}], x))) AS BIGINT)
                       AS n_stops,
                   CAST({ntok} AS BIGINT) AS n_tokens,
                   CAST({quality} >= {TEACHER_THRESHOLD} AS INT) AS label
            FROM {table} WHERE {t} IS NOT NULL
        )"""


def _sql_tokens_expr(t: str) -> str:
    return f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"


def _sql_fit_ctes(table: str, t: str) -> str:
    melt = " UNION ALL ".join(
        f"SELECT label, '{name}' AS feature, {name} AS x FROM feats"
        for name in FEATURES
    )
    return (
        "WITH "
        + _sql_feats(table, t)
        + f""",
        melted AS ({melt}),
        agg AS (
            SELECT feature,
                   SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n_pos,
                   SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n_neg,
                   SUM(CASE WHEN label = 1 THEN x ELSE 0 END) AS s_pos,
                   SUM(CASE WHEN label = 0 THEN x ELSE 0 END) AS s_neg,
                   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
            FROM melted GROUP BY feature
        ),
        fit AS (
            SELECT feature,
                   CAST(n_pos AS BIGINT) AS n_pos,
                   CAST(n_neg AS BIGINT) AS n_neg,
                   ({E6} * s_pos) // GREATEST(n_pos, 1) AS mu_pos_e6,
                   ({E6} * s_neg) // GREATEST(n_neg, 1) AS mu_neg_e6,
                   GREATEST(1,
                       ({E6} * q) // GREATEST(n_pos + n_neg, 1)
                       - ((({E6} * (s_pos + s_neg))
                           // GREATEST(n_pos + n_neg, 1))
                          * (({E6} * (s_pos + s_neg))
                             // GREATEST(n_pos + n_neg, 1))) // {E6}
                   ) AS var_e6
            FROM agg
        ),
        model AS (
            SELECT *,
                   CAST(SIGN(mu_pos_e6 - mu_neg_e6) AS HUGEINT)
                   * (({E6} * ABS(mu_pos_e6 - mu_neg_e6)) // var_e6)
                       AS w_e6
            FROM fit
        )"""
    )


def oracle_quality_model_fit_sql(
    table: str = "documents", t: str = "text"
) -> str:
    return (
        _sql_fit_ctes(table, t)
        + """
        SELECT feature, n_pos, n_neg,
               CAST(mu_pos_e6 AS BIGINT) AS mu_pos_e6,
               CAST(mu_neg_e6 AS BIGINT) AS mu_neg_e6,
               CAST(var_e6 AS BIGINT) AS var_e6,
               CAST(w_e6 AS BIGINT) AS w_e6
        FROM model ORDER BY feature"""
    )


def oracle_quality_model_scores_sql(
    table: str = "documents", t: str = "text"
) -> str:
    wcols = ", ".join(
        f"MAX(CASE WHEN feature = '{name}' THEN w_e6 END) AS w_{name}"
        for name in FEATURES
    )
    score = " + ".join(
        f"m.w_{name} * CAST(f.{name} AS HUGEINT)" for name in FEATURES
    )
    return (
        _sql_fit_ctes(table, t)
        + f""",
        wide AS (
            SELECT {wcols},
                   SUM(w_e6 * (mu_pos_e6 + mu_neg_e6)) AS thr
            FROM model
        )
        SELECT f.doc_id, f.label,
               CAST({2 * E6} * ({score}) - m.thr AS BIGINT) AS margin,
               CAST(({2 * E6} * ({score}) - m.thr) >= 0 AS INT)
                   AS predicted,
               CAST((CAST(({2 * E6} * ({score}) - m.thr) >= 0 AS INT)
                     = f.label) AS INT) AS correct
        FROM feats f CROSS JOIN wide m
        ORDER BY f.doc_id"""
    )
