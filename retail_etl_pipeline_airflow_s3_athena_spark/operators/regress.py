"""Learned statistical quality model: exact integer least squares.

Production curation stacks (Gopher's quality heuristics, CCNet's
perplexity buckets) fit a cheap statistical model over the corpus and
flag documents that deviate from it — the reference pipeline has no
learned quality surface at all (its data_quality.py is per-column
null/dup counts), so this family is part of the training-data
extension set.

The model here is the simplest useful one: ordinary least squares of
``n_chars`` on ``n_tokens`` over the whole corpus.  Character count is
strongly linear in token count for natural text (chars ≈ a + b·tokens
with b ≈ avg token length + 1); documents far off the corpus's own
fitted line are exactly the curation outliers — minified/binary blobs
(huge chars-per-token), stub/fragment rows, whitespace-padded
boilerplate (tiny chars-per-token).

Determinism is the point of the formulation: OLS on one regressor
needs only five integer sums (n, Σx, Σy, Σx², Σxy), and Cramer's rule
turns the fit into exact integer arithmetic —

    Dx    = n·Σx² − (Σx)²          (≥ 0, the variance numerator)
    b_num = n·Σxy − Σx·Σy          (slope   = b_num / Dx)
    a_num = Σy·Σx² − Σx·Σxy        (intercept = a_num / Dx)

and the per-document residual scaled by Dx is again an exact integer:

    r_num = y·Dx − a_num − b_num·x   (residual chars = r_num / Dx)

No float enters at any step, so the gate hash is engine- and
platform-exact, and ranking documents by |r_num| is identical to
ranking by |residual| (Dx is a positive corpus constant).  Products
reach ~n²·x̄²·y per row (~1e28 at 1e9 docs): DECIMAL(38,0) on the
Spark side, HUGEINT in the DuckDB twin — both exact 128-bit-class
integer arithmetic with headroom to ~1e38, i.e. past 100 TB corpus
sizes (bound analysis in SCALE.md).

Plan shape (both operators): ONE map-side-combinable aggregation to a
single stats row, broadcast back onto the corpus via the 1-row
crossJoin scalar pattern, then a TakeOrderedAndProject for the top-k
outliers — two exchanges total, no window over the corpus, nothing
driver-side.  At 100 TB this is the same cost as any single
pass+broadcast operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import token_count

E6 = 10**6
TOP_OUTLIERS = 50

_DEC = "decimal(38,0)"


def _stats(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The five OLS sums plus the Cramer combinations, as one
    combinable aggregate returning a single row (x = token count,
    y = char count; BIGINT sums, DECIMAL(38,0) products)."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("x"),
        F.length(F.col(text_col)).cast("long").alias("y"),
    )
    s = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    return s.select(
        "n",
        "sx",
        "sy",
        (d("n") * d("sxx") - d("sx") * d("sx")).alias("dx"),
        (d("n") * d("sxy") - d("sx") * d("sy")).alias("b_num"),
        (d("sy") * d("sxx") - d("sx") * d("sxy")).alias("a_num"),
    )


def _trunc_div(num: Column, den: Column) -> Column:
    """Exact truncating division of non-negative DECIMAL(38,0)
    operands: subtract the remainder, then divide — the quotient is an
    exact integer, so Spark's HALF_UP scale-6 rounding of decimal
    ``/`` is a no-op.  NOT ``floor(num / den)`` (Spark rounds the
    quotient to scale 6 BEFORE floor — off-by-one when the true
    fraction is >= .9999995; r7 ADVICE repro: 43000000300 / 1e9+7
    gave 43, truth 42) and NOT ``num div den`` (``div`` returns
    BIGINT, silently wrapping for >18-digit quotients)."""
    return (num - num % den) / den


def _signed_div_e(num: Column, den: Column, scale: int) -> Column:
    """sign(num) · trunc(scale·|num| / den): truncating fixed-point
    division with the sign factored out, so Spark and DuckDB's ``//``
    agree exactly (both truncate; they'd differ on negatives only via
    intermediate rounding conventions we avoid)."""
    prod = F.lit(scale).cast(_DEC) * F.abs(num)
    mag = _trunc_div(prod, den).cast("long")
    return (F.signum(num).cast("long") * mag).alias("_sd")


def length_model_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row corpus fit: (n_docs, sum_tokens, sum_chars, slope_e6,
    intercept_e2) — slope in e6 fixed point (chars per token),
    intercept in e2 (chars).  Exact integer Cramer arithmetic; a
    degenerate corpus (n < 2 or zero token variance) reports zero
    slope/intercept rather than dividing by zero."""
    s = _stats(docs, text_col, id_col)
    den = F.greatest(F.col("dx"), F.lit(1).cast(_DEC))
    ok = F.col("dx") > 0
    return s.select(
        F.col("n").alias("n_docs"),
        F.coalesce(F.col("sx"), F.lit(0)).cast("long").alias("sum_tokens"),
        F.coalesce(F.col("sy"), F.lit(0)).cast("long").alias("sum_chars"),
        F.when(ok, _signed_div_e(F.col("b_num"), den, E6))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("slope_e6"),
        F.when(ok, _signed_div_e(F.col("a_num"), den, 100))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("intercept_e2"),
    )


def length_model_outliers(
    docs: DataFrame,
    k: int = TOP_OUTLIERS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by |residual| under the corpus's own
    chars~tokens fit: (doc_id, n_tokens, n_chars, resid_sign,
    resid_e2) — resid_e2 = |residual| in e2 chars, sign +1 for
    longer-than-predicted (dense/minified payloads), −1 for shorter
    (padding/fragments).  Ranking happens on the EXACT integer
    |r_num| = |y·Dx − a_num − b_num·x| (ties broken by doc_id), so
    the cutoff is deterministic; the division to e2 chars is display
    scaling only.  Plan: stats row broadcast-crossJoined onto the
    corpus, TakeOrderedAndProject for the top-k."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("x"),
        F.length(F.col(text_col)).cast("long").alias("y"),
    )
    s = _stats(docs, text_col, id_col).filter(F.col("dx") > 0)
    den = F.col("dx")
    r_num = (
        F.col("y").cast(_DEC) * F.col("dx")
        - F.col("a_num")
        - F.col("b_num") * F.col("x").cast(_DEC)
    )
    return (
        base.crossJoin(F.broadcast(s))
        .select(
            "doc_id",
            F.col("x").alias("n_tokens"),
            F.col("y").alias("n_chars"),
            F.signum(r_num).cast("long").alias("resid_sign"),
            _trunc_div(F.lit(100).cast(_DEC) * F.abs(r_num), den)
            .cast("long")
            .alias("resid_e2"),
            F.abs(r_num).alias("_r_abs"),
        )
        .orderBy(F.desc("_r_abs"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", "n_tokens", "n_chars", "resid_sign", "resid_e2")
    )


def _sql_stats_cte(table: str, t: str, id_col: str) -> str:
    """DuckDB twin of :func:`_stats` (HUGEINT products)."""
    # token count: \S+ matches, exactly Spark's regexp_count in text.py
    x = f"len(regexp_extract_all({t}, '\\S+'))"
    return f"""
        base AS (
            SELECT {id_col} AS doc_id,
                   CAST({x} AS BIGINT) AS x,
                   CAST(length({t}) AS BIGINT) AS y
            FROM {table} WHERE {t} IS NOT NULL
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM base
        ),
        stats AS (
            SELECT n, sx, sy,
                   CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                       AS dx,
                   CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                       AS b_num,
                   CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy
                       AS a_num
            FROM sums
        )"""


def oracle_length_model_fit_sql(
    table: str = "documents", t: str = "text", id_col: str = "doc_id"
) -> str:
    sd = lambda num, scale: (  # noqa: E731
        f"CAST(CASE WHEN {num} > 0 THEN 1 WHEN {num} < 0 THEN -1 ELSE 0 END"
        f" * (({scale} * abs({num})) // GREATEST(dx, 1)) AS BIGINT)"
    )
    return f"""
        WITH {_sql_stats_cte(table, t, id_col)}
        SELECT n AS n_docs,
               COALESCE(sx, 0) AS sum_tokens,
               COALESCE(sy, 0) AS sum_chars,
               CASE WHEN dx > 0 THEN {sd('b_num', E6)} ELSE 0 END
                   AS slope_e6,
               CASE WHEN dx > 0 THEN {sd('a_num', 100)} ELSE 0 END
                   AS intercept_e2
        FROM stats
    """


def oracle_length_model_outliers_sql(
    k: int = TOP_OUTLIERS,
    table: str = "documents",
    t: str = "text",
    id_col: str = "doc_id",
) -> str:
    r_num = "(CAST(y AS HUGEINT) * dx - a_num - b_num * CAST(x AS HUGEINT))"
    return f"""
        WITH {_sql_stats_cte(table, t, id_col)}
        SELECT doc_id,
               x AS n_tokens,
               y AS n_chars,
               CAST(CASE WHEN {r_num} > 0 THEN 1
                         WHEN {r_num} < 0 THEN -1 ELSE 0 END AS BIGINT)
                   AS resid_sign,
               CAST((100 * abs({r_num})) // dx AS BIGINT) AS resid_e2
        FROM base CROSS JOIN stats
        WHERE dx > 0
        ORDER BY abs({r_num}) DESC, doc_id ASC
        LIMIT {int(k)}
    """
