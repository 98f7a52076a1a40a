"""Dataset datasheet ("data card") generation.

Every published training corpus ships a per-source datasheet (Gebru
et al., "Datasheets for Datasets"; Dolma's source tables): how many
documents and tokens each source contributes, how long its documents
run, how much of it is exact-duplicate, what fraction clears the
quality bar, and which language dominates.  The reference pipeline
has a per-COLUMN data-quality report (scripts/data_quality.py —
nulls/dups per column) but no corpus-level surface; this operator is
the corpus-curation equivalent, composed entirely from the engine's
existing deterministic signals (operators/text.py quality_score and
predicted_lang, the md5 exact-dup fingerprint of dedup).

One output row per source:

- ``n_docs``, ``n_tokens``, ``n_chars`` — volume
- ``avg_doc_tokens_e2`` — mean doc length (e2 fixed point, exact
  integer div)
- ``exact_dup_docs`` — docs minus distinct normalized-text md5s (the
  exact-dedup family's fingerprint)
- ``quality_pass_e6`` — fraction of docs with quality_score ≥ 0.5
  (the dround6 score is quantized to 1e-6, so the threshold compare
  is engine-exact)
- ``top_lang``, ``top_lang_e6`` — modal predicted language and its
  share (ties alphabetical)

Scale shape: one narrow projection computes all per-doc signals in a
single pass (regex scans, codegen'd), then TWO bounded aggregations —
a per-source rollup (COUNT DISTINCT fingerprint is Spark's standard
two-phase partial-distinct aggregate) and a per-(source, lang) count
whose argmax window is partitioned by source over ≤ |langs|+1 rows.
Output cardinality = |sources|.  Nothing here grows faster than one
corpus pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    predicted_lang,
    quality_score,
    sql_lang_score_cols,
    sql_predicted_lang_case,
    sql_quality_score,
    token_count,
    _sql_token_count,
)

E6 = 10**6
QUALITY_BAR = 0.5


def data_card(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    c = F.col(text_col)
    base = docs.filter(c.isNotNull()).select(
        F.col(source_col).alias("source"),
        token_count(c).alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars"),
        quality_score(c).alias("q"),
        predicted_lang(c).alias("lang"),
        F.md5(F.encode(F.lower(F.trim(c)), "UTF-8")).alias("fp"),
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum(
            F.when(F.col("q") >= F.lit(QUALITY_BAR), 1).otherwise(0)
        ).alias("n_quality"),
        F.countDistinct("fp").alias("n_distinct"),
    )
    lang_w = Window.partitionBy("source").orderBy(
        F.desc("lc"), F.asc("lang")
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("lc"))
        .withColumn("rn", F.row_number().over(lang_w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "lc")
    )
    return (
        per_source.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.expr("100 * n_tokens div n_docs").alias("avg_doc_tokens_e2"),
            (F.col("n_docs") - F.col("n_distinct")).alias("exact_dup_docs"),
            F.expr(f"{E6} * n_quality div n_docs").alias("quality_pass_e6"),
            "top_lang",
            F.expr(f"{E6} * lc div n_docs").alias("top_lang_e6"),
        )
        .orderBy("source")
    )


def oracle_data_card_sql(table: str = "documents", t: str = "text") -> str:
    ntok = _sql_token_count(t)
    return f"""
        WITH scored AS (
            SELECT source,
                   CAST({ntok} AS BIGINT) AS n_tokens,
                   CAST(LENGTH({t}) AS BIGINT) AS n_chars,
                   {sql_quality_score(t)} AS q,
                   md5(LOWER(TRIM({t}))) AS fp,
                   {sql_lang_score_cols(t)}
            FROM {table} WHERE {t} IS NOT NULL
        ),
        base AS (
            SELECT source, n_tokens, n_chars, q, fp,
                   {sql_predicted_lang_case()} AS lang
            FROM scored
        ),
        per_source AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   CAST(SUM(CASE WHEN q >= {QUALITY_BAR} THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_quality,
                   CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct
            FROM base GROUP BY source
        ),
        top_lang AS (
            SELECT source, lang AS top_lang, lc FROM (
                SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS lc,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY COUNT(*) DESC, lang ASC) AS rn
                FROM base GROUP BY source, lang
            ) WHERE rn = 1
        )
        SELECT p.source, p.n_docs, p.n_tokens, p.n_chars,
               CAST(100 * p.n_tokens // p.n_docs AS BIGINT)
                   AS avg_doc_tokens_e2,
               CAST(p.n_docs - p.n_distinct AS BIGINT) AS exact_dup_docs,
               CAST({E6} * p.n_quality // p.n_docs AS BIGINT)
                   AS quality_pass_e6,
               l.top_lang,
               CAST({E6} * l.lc // p.n_docs AS BIGINT) AS top_lang_e6
        FROM per_source p JOIN top_lang l USING (source)
        ORDER BY p.source
    """
