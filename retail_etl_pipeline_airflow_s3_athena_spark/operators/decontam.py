"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation/benchmark corpus.

Standard LLM-data hygiene: any training doc that textually overlaps a
held-out benchmark must be dropped (or at least flagged) before
training, or downstream eval numbers are contaminated.  The check is
n-gram collision: a training doc is contaminated iff it shares at
least one token shingle with any benchmark doc.

Built on the SAME flat-shingle machinery as ``operators/dedup.py``
(posexplode -> md5 -> window lead -> distinct): both engines compute
the identical shingle-hash space, so "shared n-gram" means the same
thing to the operator and its oracle.

Plan shape / 100 TB notes:
- The benchmark shingle set is DISTINCT and tiny relative to the
  corpus (benchmarks are thousands of docs, corpora are billions) —
  it broadcasts, so the corpus side never shuffles for the probe:
  one broadcast-hash semi-probe per corpus shingle row, then a
  doc_id-partial-aggregated count.
- The corpus-side shingle explosion is a narrow map off the scan; the
  only shuffle is the per-doc overlap count on doc_id.
- Zero-overlap docs never appear in the join output; they come back
  via a LEFT join from the (doc_id-only) corpus spine with overlap 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
    SH_C1,
    SH_C2,
    _flat_shingles,
    _sql_token_hashes,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import FP_MOD


def decontaminate(
    docs: DataFrame,
    bench_filter: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc contamination report: (doc_id, n_overlap,
    contaminated).  ``bench_filter`` is a boolean SQL expression that
    selects the benchmark rows (e.g. ``"source = 'src0'"``); all other
    rows are the training corpus."""
    bench_docs = docs.filter(bench_filter)
    train_docs = docs.filter(f"NOT ({bench_filter})")
    bench_sh = (
        _flat_shingles(bench_docs, text_col).select("s").distinct()
    )
    train_sh = _flat_shingles(train_docs, text_col)
    overlap = (
        train_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    spine = train_docs.select("doc_id")
    return spine.join(overlap, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
    )


def oracle_decontaminate_sql(
    bench_filter: str, table: str = "documents", t: str = "text"
) -> str:
    """DuckDB twin: same shingle space (3-token rolling hash with the
    dedup module's constants, <3-token docs fall back to token hashes),
    same LEFT-join spine semantics."""
    return f"""
        WITH th_t AS (
            SELECT doc_id, ({bench_filter}) AS is_bench,
                   {_sql_token_hashes(t)} AS th
            FROM {table}
        ),
        sh AS (
            SELECT doc_id, is_bench,
                   unnest(list_distinct(
                       CASE WHEN len(th) >= 3 THEN
                           list_transform(range(1, len(th) - 1),
                               i -> (th[i] * {SH_C1} + th[i + 1] * {SH_C2}
                                     + th[i + 2]) % {FP_MOD})
                       ELSE th END)) AS s
            FROM th_t
        ),
        bench AS (SELECT DISTINCT s FROM sh WHERE is_bench),
        ov AS (
            SELECT sh.doc_id, COUNT(*) AS n_overlap
            FROM sh JOIN bench USING (s)
            WHERE NOT sh.is_bench
            GROUP BY sh.doc_id
        )
        SELECT d.doc_id,
               COALESCE(o.n_overlap, 0) AS n_overlap,
               COALESCE(o.n_overlap, 0) > 0 AS contaminated
        FROM (SELECT doc_id FROM th_t WHERE NOT is_bench) d
        LEFT JOIN ov o USING (doc_id)
    """
