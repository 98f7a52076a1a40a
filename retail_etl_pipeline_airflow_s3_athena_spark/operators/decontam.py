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


# ---------------------------------------------------------------------------
# Bloom-filter pre-filter (Bloom 1970): the shuffle-free scale path for
# contamination probing.
#
# The exact probe above broadcasts the full distinct benchmark shingle
# set.  At 100 TB that set can reach tens of GB — past any broadcast
# budget — while a Bloom filter over it is CONSTANT-size: 2^18 bits
# packed into <=8192 32-bit words (64 KB), built with one bounded
# aggregate and broadcast everywhere.  The corpus side then probes the
# bitmap with k=3 integer hashes per shingle: zero shuffle, zero join
# against the real benchmark set; only bloom-POSITIVE shingles (a tiny,
# FP-bounded superset of true overlaps) ever proceed to the exact
# verification join.
#
# Determinism: positions come from literal affine coefficients over the
# shared shingle-hash space; the bitmap and the probe replicate
# bit-for-bit in DuckDB (32-bit word packing keeps every mask positive
# in BIGINT — no sign-bit portability trap at shift 63).
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 18   # m = 262144 bits
BLOOM_K = 3            # hashes per key
_BL_WORD_BITS = 32     # pack into 32-bit words: masks stay positive
BL_A = [((2 * i + 1) * 2654435761) % FP_MOD for i in range(BLOOM_K)]
BL_B = [((i + 1) * 104729 + 7919) % FP_MOD for i in range(BLOOM_K)]


def _bloom_pos(s, i: int):
    return ((s * BL_A[i] + BL_B[i]) % FP_MOD) % BLOOM_BITS


def bloom_decontaminate(
    docs: DataFrame, bench_filter: str, text_col: str = "text"
) -> DataFrame:
    """Bloom-prefiltered contamination probe: (doc_id, n_bloom_hits,
    n_exact_hits) for every training doc at least one of whose shingles
    the Bloom filter flags.

    n_exact_hits counts how many of the flagged shingles are REAL
    benchmark shingles — emitted here so the filter's false-positive
    behavior is inspectable (and gate-checkable); the production plan
    keeps only the bitmap probe and feeds the flagged remnant to the
    exact join.
    """
    bench = docs.filter(bench_filter)
    train = docs.filter(f"NOT ({bench_filter})")
    bench_sh = _flat_shingles(bench, text_col).select("s").distinct()

    def positions(src: DataFrame, keep: tuple[str, ...]) -> DataFrame:
        return src.select(
            *keep,
            F.explode(
                F.array(*[_bloom_pos(F.col("s"), i) for i in range(BLOOM_K)])
            ).alias("p"),
        ).select(
            *keep,
            F.shiftright(F.col("p"), 5).alias("word"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(p % 32 AS INT)) AS BIGINT)"
            ).alias("mask"),
        )

    bitmap = (
        positions(bench_sh, ())
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    train_sh = _flat_shingles(train, text_col)
    probed = (
        positions(train_sh, ("doc_id", "s"))
        .join(F.broadcast(bitmap), "word", "left")
        .select(
            "doc_id",
            "s",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "s")
        .agg((F.sum("hit") == BLOOM_K).alias("bloom_hit"))
        .filter("bloom_hit")
    )
    exact = probed.join(
        F.broadcast(bench_sh.withColumn("exact", F.lit(1))), "s", "left"
    )
    return (
        exact.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("exact"), F.lit(0)))
            .cast("long")
            .alias("n_exact_hits"),
        )
    )


def oracle_bloom_decontaminate_sql(
    bench_filter: str, table: str = "documents", t: str = "text"
) -> str:
    pos_selects = "\n            UNION ALL\n".join(
        f"            SELECT doc_id, is_bench, s, "
        f"((s * {BL_A[i]} + {BL_B[i]}) % {FP_MOD}) % {BLOOM_BITS} AS p "
        f"FROM sh"
        for i in range(BLOOM_K)
    )
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
        pos AS (
        {pos_selects}
        ),
        bench_pos AS (
            SELECT DISTINCT p FROM pos WHERE is_bench
        ),
        bitmap AS (
            SELECT p >> 5 AS word,
                   CAST(bit_or(CAST(1 AS BIGINT) << (p % 32)) AS BIGINT)
                       AS bits
            FROM bench_pos GROUP BY word
        ),
        probed AS (
            SELECT pos.doc_id, pos.s,
                   CASE WHEN b.bits IS NOT NULL
                             AND (b.bits & (CAST(1 AS BIGINT) << (pos.p % 32)))
                                 <> 0
                        THEN 1 ELSE 0 END AS hit
            FROM pos LEFT JOIN bitmap b ON (pos.p >> 5) = b.word
            WHERE NOT pos.is_bench
        ),
        flagged AS (
            SELECT doc_id, s FROM probed
            GROUP BY doc_id, s HAVING SUM(hit) = {BLOOM_K}
        ),
        bench_sh AS (SELECT DISTINCT s FROM sh WHERE is_bench)
        SELECT f.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_hits
        FROM flagged f LEFT JOIN bench_sh b USING (s)
        GROUP BY f.doc_id
    """


# ---------------------------------------------------------------------------
# Fuzzy decontamination: near-duplicate (not just shared-n-gram)
# matching against the benchmark corpus — catches light paraphrases /
# formatting drift that still leak eval content.  Reuses the asymmetric
# minhash-band machinery from incremental_near_dups with the roles
# train=new / bench=old, so per-run cost scales with the training batch
# and bench-bench pairs are never generated.
# ---------------------------------------------------------------------------

def fuzzy_decontaminate(
    docs: DataFrame,
    bench_filter: str,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, bench_doc_id, jaccard): training docs whose exact
    3-shingle Jaccard against some benchmark doc is >= threshold."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        attach_cached_deps,
        carried_deps,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        incremental_near_dups,
    )

    pairs = incremental_near_dups(
        docs, f"NOT ({bench_filter})", text_col, threshold
    )
    renamed = pairs.select(
        F.col("new_doc_id").alias("doc_id"),
        F.col("old_doc_id").alias("bench_doc_id"),
        "jaccard",
    )
    # select() drops the cache-ownership tag; carry the persisted deps
    return attach_cached_deps(renamed, *carried_deps(pairs))


def oracle_fuzzy_decontaminate_sql(
    bench_filter: str,
    table: str = "documents",
    t: str = "text",
    threshold: float = 0.5,
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        oracle_incremental_near_dups_sql,
    )

    inner = oracle_incremental_near_dups_sql(
        f"NOT ({bench_filter})", table, t, threshold
    )
    return f"""
        SELECT new_doc_id AS doc_id, old_doc_id AS bench_doc_id, jaccard
        FROM ({inner}) fz
    """
