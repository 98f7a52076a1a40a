"""Corpus vocabulary building: top-k n-gram counts with document
frequency.

The reference has no text surface at all (its quality checks stop at
row counts, scripts/data_quality.py); vocabulary extraction is the
canonical corpus-statistics job a training-data pipeline runs before
tokenizer training (BPE/WordPiece corpus scans) or TF-IDF weighting.

Plan shape (100 TB notes): tokens are posexploded to FLAT rows and
n-grams formed with window ``lead()`` over (doc_id, pos) — identical
to the dedup shingle path, and for the same reason: higher-order array
lambdas are interpreted, flat rows stay inside WholeStageCodegen.  The
per-doc window needs no extra shuffle beyond the doc_id hash
partitioning, the n-gram groupBy is map-side combinable (partial
counts per partition), and the global top-k is a
TakeOrderedAndProject — no full sort.  Doc-frequency uses a two-level
aggregate ((ngram, doc_id) then ngram) instead of COUNT(DISTINCT) so
both levels stay partial-aggregatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import tokens

TOP_K = 100


def ngram_vocab(
    docs: DataFrame,
    n: int = 2,
    k: int = TOP_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` lowercase whitespace-token ``n``-grams by total count
    (ties broken by n-gram text), with per-n-gram document frequency.

    Returns (ngram, n_occurrences, doc_freq) ordered by count desc.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    if n == 1:
        grams = flat.select("doc_id", F.col("tok").alias("ngram"))
    else:
        w = Window.partitionBy("doc_id").orderBy("pos")
        leads = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
        grams = (
            flat.select("doc_id", F.col("tok").alias("t0"), *leads)
            # the last n-1 positions of each doc have no full n-gram
            .filter(F.col(f"t{n - 1}").isNotNull())
            .select(
                "doc_id",
                F.concat_ws(
                    " ", *[F.col(f"t{i}") for i in range(n)]
                ).alias("ngram"),
            )
        )
    per_doc = grams.groupBy("ngram", "doc_id").agg(
        F.count("*").alias("n_in_doc")
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("n_in_doc").alias("n_occurrences"),
            F.count("*").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def oracle_ngram_vocab_sql(
    table: str = "documents",
    n: int = 2,
    k: int = TOP_K,
    t: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = f"list_filter(string_split_regex(lower({t}), '\\s+'), x -> x <> '')"
    if n == 1:
        gram_cte = f"""
            grams AS (
                SELECT {id_col} AS doc_id, unnest({toks}) AS ngram
                FROM {table}
            )"""
    else:
        concat = " || ' ' || ".join(
            "tok" if i == 0 else f"LEAD(tok, {i}) OVER w" for i in range(n)
        )
        gram_cte = f"""
            toks AS (
                SELECT {id_col} AS doc_id,
                       unnest({toks}) AS tok,
                       generate_subscripts({toks}, 1) AS pos
                FROM {table}
            ),
            grams AS (
                SELECT doc_id, {concat} AS ngram
                FROM toks
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            )"""
    return f"""
        WITH {gram_cte}
        SELECT ngram,
               CAST(COUNT(*) AS BIGINT)               AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM grams
        WHERE ngram IS NOT NULL
        GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram ASC
        LIMIT {k}
    """
