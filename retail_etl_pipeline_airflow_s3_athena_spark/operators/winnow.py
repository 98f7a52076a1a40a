"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm).

The reference has no fingerprinting surface at all (its only dedup
check is the full-row duplicate count, scripts/data_quality.py:22);
a training-data pipeline needs position-aware local fingerprints for
exact-substring overlap detection: any shared token run of at least
``W + K - 1`` tokens between two documents is GUARANTEED to produce at
least one shared selected fingerprint — a recall property minhash (a
whole-document sketch) cannot give.

Operators:

- winnow_fingerprints  : per-doc selected (gram_pos, fp) set
- winnow_shared_pairs  : doc pairs sharing >= min_shared fingerprints

Determinism: gram hashes reuse dedup's md5 -> mod-FP_MOD pipeline and
the 3-token shingle combination, so the DuckDB oracle reproduces them
bit-for-bit.  Window selection ("min of each window of W consecutive
gram hashes, rightmost position on ties" — robust winnowing's
tie-break) is encoded as a single BIGINT ``enc = s * POS_ENC +
(POS_ENC - 1 - gram_pos)`` so a plain integer MIN over a row frame
implements the lexicographic (hash asc, position desc) choice in both
engines with no floats anywhere.

Plan shape (100 TB notes):
- Everything before the final distinct is a NARROW pipeline over flat
  token rows: posexplode -> codegen'd md5 -> lead() shingles -> one
  running MIN over a W-row frame — a single shuffle on doc_id (the
  sort for the window), which the shingle window already needed.
- The fingerprint table is ~|tokens| / ((W+1)/2) rows (winnowing's
  expected density 2/(W+1)), i.e. a fraction of the shingle table the
  minhash path already materializes.
- winnow_shared_pairs joins on the fingerprint value with the same
  stop-fingerprint document-frequency cap as the Jaccard inverted
  index (dedup.MAX_SHINGLE_DF rationale): a fingerprint appearing in f
  docs contributes O(f^2) pair rows, so boilerplate/stop-phrase
  fingerprints are excluded from BOTH sides before the self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
    FP_MOD,
    MAX_SHINGLE_DF,
    SH_C1,
    SH_C2,
    _flat_tokens,
    _sql_token_hashes,
)

# Winnowing window: W consecutive k-grams per selection window.  With
# K = 3 (dedup's shingle width) the guarantee threshold is any shared
# run of W + K - 1 = 6 tokens.
W_WINDOW = 4

# Position encoder for the (hash asc, pos desc) lexicographic min.
# s < FP_MOD < 2^31 and gram positions < 2^20 (docs are token-bounded
# far below 1M by the chunking stage), so enc < 2^51 — safe BIGINT
# arithmetic in both engines.
POS_ENC = 1 << 20

# Pairs sharing fewer than this many distinct fingerprints are noise.
MIN_SHARED_FP = 2


def _flat_grams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, gpos, s, n_grams): one row per positional 3-token gram.

    Same gram math as dedup's ``_flat_shingles`` but POSITIONAL (no
    distinct): winnowing needs every occurrence, in order.  Docs under
    3 tokens fall back to their token hashes, mirroring the shingle
    convention and the oracle SQL.
    """
    tk = _flat_tokens(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    wn = Window.partitionBy("doc_id")
    h1 = F.lead("h", 1).over(w)
    h2 = F.lead("h", 2).over(w)
    nt = F.count(F.lit(1)).over(wn)
    s = F.when(
        nt >= 3, (F.col("h") * SH_C1 + h1 * SH_C2 + h2) % FP_MOD
    ).otherwise(F.col("h"))
    keep = (nt < 3) | h2.isNotNull()
    grams = (
        tk.select(
            "doc_id",
            F.col("pos").alias("gpos"),
            s.alias("s"),
            keep.alias("keep"),
        )
        .filter("keep")
        .drop("keep")
    )
    return grams.withColumn("n_grams", F.count(F.lit(1)).over(wn))


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", w: int = W_WINDOW
) -> DataFrame:
    """(doc_id, gram_pos, fp): robust-winnowing selected fingerprints.

    Every window of ``w`` consecutive gram hashes selects its minimum
    (rightmost on ties); the distinct selections are the document's
    fingerprint.  Documents with fewer than ``w`` grams contribute one
    window spanning all their grams.
    """
    grams = _flat_grams(docs, text_col)
    # Loud guard (not silent corruption): gpos >= POS_ENC would alias
    # into the hash bits of the packed (hash, pos) min and yield wrong
    # fingerprints in BOTH engines.  A >1M-token document should have
    # been chunked upstream (operators/training.doc_chunks); fail with
    # the doc id instead of fingerprinting incorrectly.
    gpos_ok = F.when(F.col("gpos") < POS_ENC, F.col("gpos")).otherwise(
        F.raise_error(
            F.format_string(
                "winnow_fingerprints: doc %s has >= %d grams; "
                "chunk oversized docs before fingerprinting",
                F.col("doc_id").cast("string"),
                F.lit(POS_ENC),
            )
        )
    )
    enc = (F.col("s") * POS_ENC + (POS_ENC - 1 - gpos_ok)).cast("long")
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("gpos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    starts_window = (F.col("gpos") <= F.col("n_grams") - w) | (
        (F.col("n_grams") < w) & (F.col("gpos") == 0)
    )
    picked = (
        grams.select(
            "doc_id",
            "gpos",
            "n_grams",
            F.min(enc).over(frame).alias("wmin"),
        )
        .filter(starts_window)
        .select("doc_id", "wmin")
        .distinct()
    )
    # POS_ENC is 2^20, so decode is exact bit arithmetic (no float div)
    return picked.select(
        "doc_id",
        (POS_ENC - 1 - F.col("wmin").bitwiseAND(POS_ENC - 1))
        .cast("long")
        .alias("gram_pos"),
        F.shiftright("wmin", 20).cast("long").alias("fp"),
    )


def winnow_shared_pairs(
    docs: DataFrame,
    text_col: str = "text",
    w: int = W_WINDOW,
    min_shared: int = MIN_SHARED_FP,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps): pairs sharing >= min_shared DISTINCT
    winnowed fingerprints — the MOSS candidate report.

    One fingerprint inverted index feeds both sides of the self-join;
    fingerprints in more than ``max_df`` docs (boilerplate) are dropped
    before pairing, bounding the O(df^2) fanout exactly as the Jaccard
    verifier does for shingles.
    """
    fps = (
        winnow_fingerprints(docs, text_col, w)
        .select("doc_id", "fp")
        .distinct()
    )
    over_cap = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("fp")
    )
    kept = fps.join(F.broadcast(over_cap), "fp", "left_anti")
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _sql_flat_grams(table: str, t: str) -> str:
    """CTEs th_t -> g_t -> flat: positional gram rows, zipped unnest."""
    return f"""
th_t AS (
    SELECT doc_id, {_sql_token_hashes(t)} AS th FROM {table}
),
g_t AS (
    SELECT doc_id,
           CASE WHEN len(th) >= 3 THEN
               list_transform(range(1, len(th) - 1),
                   i -> (th[i] * {SH_C1} + th[i + 1] * {SH_C2} + th[i + 2])
                        % {FP_MOD})
           ELSE th END AS gs
    FROM th_t
),
flat AS (
    SELECT doc_id,
           unnest(gs) AS s,
           unnest(range(len(gs))) AS gpos,
           len(gs) AS n_grams
    FROM g_t
)
"""


def _sql_picked(w: int) -> str:
    return f"""
sel AS (
    SELECT doc_id, gpos, n_grams,
           MIN(s * {POS_ENC} + ({POS_ENC} - 1 - gpos)) OVER (
               PARTITION BY doc_id ORDER BY gpos
               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
           ) AS wmin
    FROM flat
),
picked AS (
    SELECT DISTINCT doc_id, wmin FROM sel
    WHERE gpos <= n_grams - {w}
       OR (n_grams < {w} AND gpos = 0)
)
"""


def oracle_winnow_fingerprints_sql(
    table: str = "documents", t: str = "text", w: int = W_WINDOW
) -> str:
    return f"""
        WITH {_sql_flat_grams(table, t).strip()},
        {_sql_picked(w).strip()}
        SELECT doc_id,
               CAST({POS_ENC} - 1 - (wmin % {POS_ENC}) AS BIGINT) AS gram_pos,
               CAST(wmin // {POS_ENC} AS BIGINT) AS fp
        FROM picked
    """


def oracle_winnow_shared_pairs_sql(
    table: str = "documents",
    t: str = "text",
    w: int = W_WINDOW,
    min_shared: int = MIN_SHARED_FP,
    max_df: int = MAX_SHINGLE_DF,
) -> str:
    return f"""
        WITH {_sql_flat_grams(table, t).strip()},
        {_sql_picked(w).strip()},
        fps AS (
            SELECT DISTINCT doc_id,
                   CAST(wmin // {POS_ENC} AS BIGINT) AS fp
            FROM picked
        ),
        kept AS (
            SELECT doc_id, fp FROM fps
            WHERE fp NOT IN (
                SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > {max_df}
            )
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS shared_fps
        FROM kept a JOIN kept b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
        HAVING COUNT(*) >= {min_shared}
    """


def dup_span_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document duplication LOCALIZATION: (doc_id, n_grams,
    n_dup_positions, dup_fraction) — how much of each document's token
    stream is covered by 3-grams that also occur in at least one OTHER
    document.

    Pair detection says WHICH docs overlap; this says HOW MUCH of each
    doc is non-original — the signal for partial-copy filtering
    policies ("drop docs more than 60% boilerplate") that pairwise
    reports can't drive directly.

    Plan: positional grams (the winnowing builder, narrow pipeline) +
    a per-gram cross-document document-frequency from a two-level
    partial aggregate; one equi-join on the gram hash brings df back
    to the positions, then a per-doc aggregate.  Every aggregate is
    map-side combinable; the only shuffles are the gram-hash groupBy
    and the doc_id window the gram builder already pays."""
    grams = _flat_grams(docs, text_col)
    df_tab = (
        grams.select("doc_id", "s")
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    joined = grams.join(df_tab, "s").select(
        "doc_id", (F.col("df") > 1).cast("long").alias("dup")
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("dup").alias("n_dup_positions"),
        F.floor(F.sum("dup") / F.count(F.lit(1)) * 1e6 + F.lit(0.5))
        .cast("double")
        .alias("_sc"),
    ).withColumn("dup_fraction", F.col("_sc") / 1e6).drop("_sc")


def oracle_dup_span_stats_sql(
    table: str = "documents", t: str = "text"
) -> str:
    return f"""
        WITH {_sql_flat_grams(table, t).strip()},
        df_tab AS (
            SELECT s, COUNT(*) AS df FROM (
                SELECT DISTINCT doc_id, s FROM flat
            ) GROUP BY s
        ),
        joined AS (
            SELECT f.doc_id,
                   CASE WHEN d.df > 1 THEN 1 ELSE 0 END AS dup
            FROM flat f JOIN df_tab d USING (s)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(dup) AS BIGINT) AS n_dup_positions,
               FLOOR(CAST(SUM(dup) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
                   AS dup_fraction
        FROM joined GROUP BY doc_id
    """


def ngram_novelty(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): per-document NOVELTY in
    doc_id (ingest) order — the fraction of the doc's distinct 3-grams
    whose FIRST corpus occurrence is this document.

    The corpus-level novelty curve is the standard diminishing-returns
    diagnostic for crawl scheduling ("are new batches still adding new
    content?"); per-doc novelty is the row-level filter form (drop docs
    under a novelty floor — they are re-hashes of what the corpus
    already holds).

    Plan: distinct (doc_id, gram) rows -> one groupBy(gram) MIN to find
    each gram's first-owner doc -> an enrich join back (1:1, no fanout)
    -> per-doc combinable counts.  Two shuffles, both on the uniform
    gram hash / doc_id keys."""
    grams = (
        _flat_grams(docs, text_col)
        .select("doc_id", "s")
        .distinct()
    )
    first_owner = grams.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    joined = grams.join(first_owner, "s").select(
        "doc_id", (F.col("doc_id") == F.col("first_doc")).cast("long").alias("novel")
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("novel").alias("n_novel"),
        F.floor(F.sum("novel") / F.count(F.lit(1)) * 1e6 + F.lit(0.5))
        .cast("double")
        .alias("_sc"),
    ).withColumn("novelty", F.col("_sc") / 1e6).drop("_sc")


def oracle_ngram_novelty_sql(table: str = "documents", t: str = "text") -> str:
    return f"""
        WITH {_sql_flat_grams(table, t).strip()},
        g AS (SELECT DISTINCT doc_id, s FROM flat),
        first_owner AS (
            SELECT s, MIN(doc_id) AS first_doc FROM g GROUP BY s
        ),
        joined AS (
            SELECT g.doc_id,
                   CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END AS novel
            FROM g JOIN first_owner f USING (s)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(novel) AS BIGINT) AS n_novel,
               FLOOR(CAST(SUM(novel) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
                   AS novelty
        FROM joined GROUP BY doc_id
    """
