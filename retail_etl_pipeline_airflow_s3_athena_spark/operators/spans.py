"""Exact-substring duplicate-span detection and removal (the
ExactSubstr dedup of Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499 — re-expressed for
Spark).

The reference has no span-level surface at all (its only duplication
check is the full-row duplicate count, scripts/data_quality.py:22);
winnow.dup_span_stats already reports HOW MUCH of a doc is duplicated
— these operators report WHERE (merged token extents) and produce the
curated corpus with those extents cut out, keeping exactly one
occurrence of every duplicated run corpus-wide.

Semantics (keep-first): an L-token window is *duplicated* when its
hash occurs >= 2 times in the corpus (across documents or within one);
the occurrence with the smallest (doc_id, pos) is the KEPT copy, every
other occurrence is removable.  Overlapping/adjacent removable windows
merge into maximal extents, exactly like the suffix-array spans of the
paper: a run of tokens repeated verbatim anywhere else in the corpus
survives in exactly one place.

Lee et al. build a suffix array over the concatenated corpus — an
inherently sequential, memory-resident structure.  The Spark-first
equivalent is the fixed-L rolling-hash window table: any duplicated
run of >= L tokens is guaranteed to produce >= 1 duplicated L-window
at every alignment inside it (same recall guarantee the paper gets
from suffix-array LCP >= L), while the table itself is a flat
~|tokens| row stream that partitions trivially.

Operators:

- dup_spans       : (doc_id, span_start, span_end, n_windows) merged
                    removable extents, token coordinates
- strip_dup_spans : the curated corpus — per doc, tokens not covered
                    by a removable extent, reassembled in order

Plan shape (100 TB notes):
- Window hashing is a NARROW per-doc pipeline: posexplode -> codegen'd
  md5 -> an (L-1)-lead rolling polynomial over the doc_id window — the
  one shuffle is the doc_id sort the winnowing/shingle family already
  pays.
- The occurrence rollup (count + min position-code per hash) is ONE
  map-side-combinable groupBy on the window hash; uniform md5 keys, no
  skew.  Joining it back is one equi-join on the same key, so each
  position row is touched O(1) times — LINEAR in corpus size, never
  O(f^2) per duplicated window (contrast pair-enumeration, which the
  near-dup family bounds with df caps instead).
- Extent merging and text reassembly are per-doc windows/aggregates
  (doc_id partitions, bounded by doc length).  The cover explode is a
  constant L x |removable positions|.
- Determinism: hashes are dedup's md5 -> mod-FP_MOD pipeline folded
  with FP_BASE (text.py's rolling-fingerprint constants); the kept
  occurrence is chosen by an integer MIN over doc_id * POS_ENC + pos.
  Everything is exact BIGINT arithmetic — the DuckDB oracles reproduce
  results bit-for-bit.

Bounds: pos < POS_ENC = 2^20 (docs are token-bounded far below 1M by
the chunking stage) and doc_id < 2^43 keep the position code inside
BIGINT; both mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
    FP_MOD,
    _flat_tokens,
    _sql_token_hashes,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    FP_BASE,
    tokens,
)

# Exact-substring window width in TOKENS.  Lee et al. use 50 BPE
# tokens; the synthetic corpus' docs are ~50 whitespace tokens, so the
# default here is 8 (any verbatim run of >= 8 tokens is deduplicated).
WINDOW_TOKENS = 8

# Position encoder for the keep-first (doc_id, pos) integer MIN.
POS_ENC = 1 << 20


def _flat_windows(
    docs: DataFrame, text_col: str, window: int
) -> DataFrame:
    """(doc_id, pos, s): one row per positional L-token window, s =
    rolling polynomial of the L token hashes.  Docs shorter than L
    tokens emit no rows (they cannot contain an L-token duplicate)."""
    tk = _flat_tokens(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    acc = F.col("h")
    for k in range(1, window):
        acc = (acc * FP_BASE + F.lead("h", k).over(w)) % FP_MOD
    # lead(h, window-1) NULL <=> the window runs off the doc end; NULL
    # propagates through the fold, so acc itself is the completeness
    # test.
    return (
        tk.select("doc_id", "pos", acc.alias("s"))
        .filter(F.col("s").isNotNull())
    )


def _removable_positions(
    docs: DataFrame, text_col: str, window: int
) -> DataFrame:
    """(doc_id, pos) of every NON-FIRST occurrence of a duplicated
    window.  One groupBy(s) rollup + one equi-join back — linear."""
    wins = _flat_windows(docs, text_col, window)
    code = F.col("doc_id") * POS_ENC + F.col("pos")
    occ = wins.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(code).alias("keep_code"),
    )
    return (
        wins.join(occ, "s")
        .filter((F.col("cnt") >= 2) & (code != F.col("keep_code")))
        .select("doc_id", "pos")
    )


def dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    window: int = WINDOW_TOKENS,
) -> DataFrame:
    """Merged removable extents: (doc_id, span_start, span_end,
    n_windows) in token coordinates, span_end exclusive.  A span is a
    maximal run of overlapping-or-adjacent removable L-windows — the
    text a keep-first exact-substring dedup would cut."""
    pos = _removable_positions(docs, text_col, window)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_extent = (
        prev.isNull() | (F.col("pos") > prev + F.lit(window))
    ).cast("long")
    ext = F.sum(new_extent).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pos.select("doc_id", "pos", ext.alias("ext"))
        .groupBy("doc_id", "ext")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(window)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
        .orderBy("doc_id", "span_start")
    )


def strip_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    window: int = WINDOW_TOKENS,
) -> DataFrame:
    """The curated corpus: (doc_id, n_tokens, kept_tokens, kept_text)
    — every token covered by a removable window removed, survivors
    reassembled in order (single-space joined; tokens() semantics make
    that whitespace-normalizing, mirrored in the oracle).  Docs whose
    every token is removable keep an empty string — downstream length
    filters drop them, the dedup itself never loses the doc row."""
    covered = (
        _removable_positions(docs, text_col, window)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pos"), F.col("pos") + F.lit(window - 1)
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("kept_text"),
    )
    base = docs.select(
        "doc_id", F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("kept_tokens", F.lit(0).cast("long")).alias(
                "kept_tokens"
            ),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB)
# ---------------------------------------------------------------------------

def _sql_flat_windows(table: str, t: str, window: int) -> str:
    """CTEs th_t -> wins: positional L-window rows with the same
    rolling polynomial (list_reduce seeds acc with the first element —
    identical to Spark's 0-seeded fold because 0*B + x1 = x1)."""
    return f"""
th_t AS (
    SELECT doc_id, {_sql_token_hashes(t)} AS th FROM {table}
),
wins AS (
    SELECT doc_id,
           unnest(range(len(th) - {window} + 1)) AS pos,
           unnest(list_transform(range(len(th) - {window} + 1),
               i -> list_reduce(th[i + 1 : i + {window}],
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}))) AS s
    FROM th_t
    WHERE len(th) >= {window}
),
occ AS (
    SELECT s, COUNT(*) AS cnt,
           MIN(doc_id * {POS_ENC} + pos) AS keep_code
    FROM wins GROUP BY s
),
removable AS (
    SELECT w.doc_id, w.pos
    FROM wins w JOIN occ USING (s)
    WHERE occ.cnt >= 2
      AND w.doc_id * {POS_ENC} + w.pos <> occ.keep_code
)
"""


def oracle_dup_spans_sql(
    table: str = "documents",
    t: str = "text",
    window: int = WINDOW_TOKENS,
) -> str:
    return f"""
        WITH {_sql_flat_windows(table, t, window).strip()},
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN LAG(pos) OVER w IS NULL
                          OR pos > LAG(pos) OVER w + {window}
                        THEN 1 ELSE 0 END AS new_extent
            FROM removable
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        exts AS (
            SELECT doc_id, pos,
                   SUM(new_extent) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING
                   ) AS ext
            FROM flagged
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT)            AS span_start,
               CAST(MAX(pos) + {window} AS BIGINT) AS span_end,
               CAST(COUNT(*) AS BIGINT)            AS n_windows
        FROM exts
        GROUP BY doc_id, ext
        ORDER BY doc_id, span_start
    """


def oracle_strip_dup_spans_sql(
    table: str = "documents",
    t: str = "text",
    window: int = WINDOW_TOKENS,
) -> str:
    toks = f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"
    return f"""
        WITH {_sql_flat_windows(table, t, window).strip()},
        covered AS (
            SELECT DISTINCT doc_id,
                   unnest(range(pos, pos + {window})) AS pos
            FROM removable
        ),
        toks AS (
            SELECT doc_id,
                   unnest(range(len({toks}))) AS pos,
                   unnest({toks}) AS tok
            FROM {table}
        ),
        kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok
            FROM toks tk
            WHERE NOT EXISTS (
                SELECT 1 FROM covered c
                WHERE c.doc_id = tk.doc_id AND c.pos = tk.pos
            )
        ),
        rebuilt AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS kept_tokens,
                   string_agg(tok, ' ' ORDER BY pos) AS kept_text
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len({toks}) AS BIGINT)      AS n_tokens,
               COALESCE(r.kept_tokens, 0)       AS kept_tokens,
               COALESCE(r.kept_text, '')        AS kept_text
        FROM {table} d LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY d.doc_id
    """
