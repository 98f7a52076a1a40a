"""DSIR-style importance weighting for domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) scores every raw document by how much more likely
its hashed n-gram features are under a TARGET distribution (the
domain you want more of) than under the raw SOURCE distribution, then
keeps the highest-weight documents.  It is the standard
quality/domain-mixing step between crawling and training — a gap in
the reference's pipeline (the reference has no curation operators at
all; this module extends the engine's curation family alongside
quality_filter_docs / decontaminate_docs).

Spark-first shape, 100 TB story:

- features are md5-hashed unigrams folded into ``N_BUCKETS`` (=4096)
  buckets — the SAME cross-engine hash the dedup family uses
  (operators/dedup.py::_md5_hash).  The feature space is FIXED-SIZE,
  so every statistics table below is bounded by construction.
- bucket statistics (target count, source count) are ONE map-side
  combinable groupBy over the token stream → ≤4096 rows.
- the log-ratio score per bucket needs log2 — computed with the
  transcendental-free join-based fixed-point log2 (functions/
  detmath.py: 51-row msb table + shared 4096-entry mantissa table),
  so the weights are 64-bit INTEGERS (e20 fixed point), bit-identical
  on any engine/platform: no libm in the hash-checked output.  The
  log joins run on the 4096-row stats table and two 1-row totals,
  never on the corpus.
- per-document weights are one broadcast join (bucket → score, ~64 KB)
  against the token stream plus one combinable groupBy(doc) — the
  corpus is touched exactly twice (count pass, score pass), both
  embarrassingly parallel, no unbounded shuffle.
- selection is a global top-k → TakeOrderedAndProject (per-partition
  partial top-k, no full sort, no single-partition window).

Importance weight (add-one smoothing over the bucket space, B =
``N_BUCKETS``, L = fixed-point log2):

    w(doc) = Σ_tokens [L(ct_b + 1) − L(cs_b + 1)] − n_tokens · norm
    norm   = L(Nt + B) − L(Ns + B)

which is the e20-scaled ``Σ log2 p_target(b)/p_source(b)`` of the
paper with hashed unigram features.  Zero-token documents carry no
evidence and are absent from the output (same in the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
    carried_deps,
)
from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
    attach_det_log2_e20,
    log2_table_df,
    pow2_table_df,
    sql_det_log2_joins,
    sql_log2_table_cte,
    sql_pow2_table_cte,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import FP_MOD, tokens

N_BUCKETS = 4096


def _flat_buckets(
    docs: DataFrame, is_target: Column, text_col: str, id_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select(
        "doc_id", "tgt", (_md5_hash(F.col("tok")) % N_BUCKETS).alias("bucket")
    )


def bucket_stats(flat: DataFrame) -> DataFrame:
    """(bucket, cs, ct) counts — ONE map-side combinable groupBy to
    ≤``N_BUCKETS`` rows.  Counts are additive, which is what makes the
    streaming maintenance path (streaming/incremental.dsir_stat_stream)
    exactly equal to this one-pass batch rollup."""
    return flat.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cs"),
        F.count_if(F.col("tgt")).alias("ct"),
    )


def scores_from_stats(
    stats: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bucket → score_e20 table ≤4096 rows, 1-row norm table, and the
    PERSISTED stats handle whose release the caller owns) from a
    (bucket, cs, ct) statistics table — batch-built or stream-merged.
    The stats rollup feeds both the score and the totals branches;
    without the persist each branch re-runs the upstream pass (the
    measured 4x-re-execution failure mode documented in
    functions/caching.py)."""
    spark = stats.sparkSession
    logt, powt = log2_table_df(spark), pow2_table_df(spark)
    stats0 = stats.persist()
    stats = attach_det_log2_e20(
        stats0.withColumn("ct1", F.col("ct") + 1), "ct1", "l_ct", logt, powt
    )
    stats = attach_det_log2_e20(
        stats.withColumn("cs1", F.col("cs") + 1), "cs1", "l_cs", logt, powt
    )
    scores = stats.select(
        "bucket", (F.col("l_ct") - F.col("l_cs")).alias("score_e20")
    )
    totals = stats.agg(
        F.sum("ct").alias("nt"), F.sum("cs").alias("ns")
    )
    totals = attach_det_log2_e20(
        totals.withColumn("ntb", F.col("nt") + N_BUCKETS),
        "ntb", "l_nt", logt, powt,
    )
    totals = attach_det_log2_e20(
        totals.withColumn("nsb", F.col("ns") + N_BUCKETS),
        "nsb", "l_ns", logt, powt,
    )
    norm = totals.select((F.col("l_nt") - F.col("l_ns")).alias("norm_e20"))
    # stats0 is the PERSISTED handle (the later rebindings are derived
    # DataFrames whose unpersist would be a no-op)
    return scores, norm, stats0


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, importance_e20) — e20-fixed-point DSIR
    importance weight of every document with ≥1 token.  Positive means
    "looks more like the target corpus than the raw source"."""
    flat = _flat_buckets(docs, is_target, text_col, id_col)
    return importance_from_stats(
        docs, bucket_stats(flat), text_col=text_col, id_col=id_col
    )


def importance_from_stats(
    docs: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance against a PRE-BUILT (bucket, cs, ct)
    statistics table — the scoring half shared by the batch operator
    and the streaming-maintained stats
    (streaming/incremental.dsir_stream_importance)."""
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select(
        "doc_id", (_md5_hash(F.col("tok")) % N_BUCKETS).alias("bucket")
    )
    scores, norm, stats = scores_from_stats(stats)
    perdoc = (
        flat.join(F.broadcast(scores), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("score_e20").alias("s"),
        )
    )
    out = perdoc.join(F.broadcast(norm)).select(
        "doc_id",
        "n_tokens",
        (F.col("s") - F.col("n_tokens") * F.col("norm_e20")).alias(
            "importance_e20"
        ),
    )
    return attach_cached_deps(out, stats)


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by importance (tie-broken by doc_id) with
    their lang/source labels — the selection step of DSIR, determinized
    to top-k (the paper resamples with Gumbel noise; a seeded variant
    belongs to the caller).  Global top-k = TakeOrderedAndProject."""
    imp = dsir_importance(docs, is_target, text_col, id_col)
    out = (
        imp.join(docs.select(id_col, "lang", "source"), "doc_id")
        .orderBy(F.desc("importance_e20"), F.asc("doc_id"))
        .limit(k)
    )
    return attach_cached_deps(out, *carried_deps(imp))


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB)
# ---------------------------------------------------------------------------

def _sql_flat(table: str, t: str, target_pred: str) -> str:
    toks = (
        f"list_filter(string_split_regex(LOWER({t}), '\\s+'), x -> x <> '')"
    )
    md5 = (
        f"(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {FP_MOD})"
    )
    return f"""
        flat AS (
            SELECT doc_id, {target_pred} AS tgt, unnest({toks}) AS tok
            FROM {table}
        ),
        fb AS (
            SELECT doc_id, tgt, {md5} % {N_BUCKETS} AS bucket
            FROM flat
        )"""


def _sql_scores() -> str:
    frm_ct, l_ct = sql_det_log2_joins("ct + 1", "a")
    frm_cs, l_cs = sql_det_log2_joins("cs + 1", "b")
    frm_nt, l_nt = sql_det_log2_joins(f"nt + {N_BUCKETS}", "c")
    frm_ns, l_ns = sql_det_log2_joins(f"ns + {N_BUCKETS}", "d")
    return f"""
        stats AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cs,
                   CAST(COUNT(*) FILTER (WHERE tgt) AS BIGINT) AS ct
            FROM fb GROUP BY bucket
        ),
        scores AS (
            SELECT bucket, {l_ct} - {l_cs} AS score_e20
            FROM stats {frm_ct} {frm_cs}
        ),
        tot AS (
            SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                   CAST(SUM(cs) AS BIGINT) AS ns
            FROM stats
        ),
        norm AS (
            SELECT {l_nt} - {l_ns} AS norm_e20
            FROM tot {frm_nt} {frm_ns}
        ),
        perdoc AS (
            SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(score_e20) AS BIGINT) AS s
            FROM fb JOIN scores USING (bucket)
            GROUP BY fb.doc_id
        ),
        imp AS (
            SELECT doc_id, n_tokens,
                   CAST(s - n_tokens * norm_e20 AS BIGINT) AS importance_e20
            FROM perdoc, norm
        )"""


def oracle_dsir_importance_sql(
    table: str = "documents",
    t: str = "text",
    target_pred: str = "lang = 'en'",
) -> str:
    return f"""
        WITH {sql_log2_table_cte()},
        {sql_pow2_table_cte()},
        {_sql_flat(table, t, target_pred)},
        {_sql_scores()}
        SELECT doc_id, n_tokens, importance_e20 FROM imp ORDER BY doc_id
    """


def oracle_dsir_select_sql(
    table: str = "documents",
    t: str = "text",
    target_pred: str = "lang = 'en'",
    k: int = 100,
) -> str:
    return f"""
        WITH {sql_log2_table_cte()},
        {sql_pow2_table_cte()},
        {_sql_flat(table, t, target_pred)},
        {_sql_scores()}
        SELECT i.doc_id, i.n_tokens, i.importance_e20, d.lang, d.source
        FROM imp i JOIN {table} d USING (doc_id)
        ORDER BY i.importance_e20 DESC, i.doc_id ASC
        LIMIT {k}
    """
