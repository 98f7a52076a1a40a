"""Training-data preparation operators over the ``documents`` table:
context-window chunking and sequence packing.

The reference has no text surface at all (it is a retail ETL pipeline —
SURVEY.md §2.7 "no array/map/json/regex functions"); these are the
LLM-pipeline extensions the engine adds on top: before tokens reach a
trainer they are (1) CHUNKED into max-length pieces and (2) PACKED into
dense bins so short documents don't waste context-window slots.

- doc_chunks     : split each doc into fixed-size token chunks,
                   preserving token order
- pack_sequences : assign docs to ~max_tokens bins (streaming first-fit
                   by running token count, per source partition)
- bin_stats      : per-bin utilization summary over a packing

Scale notes:
- doc_chunks is flat-row end to end: posexplode -> chunk_id arithmetic
  -> one (doc_id, chunk_id) shuffle.  The per-chunk reassembly sorts a
  bounded array (<= max_tokens elements), so the interpreted-lambda
  cost is capped per row and the hot path (explode + hash grouping)
  stays codegen.
- pack_sequences is one window pass per source partition (running sum
  ordered by doc_id).  At 100 TB the partition column bounds the sort:
  each source's docs sort independently — the same shape as any
  cumulative metric.  The cumsum/div formulation is the STREAMING
  first-fit pack: deterministic, one pass, no driver state, at the cost
  of bins straddling the boundary by at most one doc (standard
  trainer-side packing; exact bin-packing is NP-hard and inherently
  sequential).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    token_count,
    tokens,
)

CHUNK_TOKENS = 32
PACK_TOKENS = 256


def doc_chunks(
    docs: DataFrame, text_col: str = "text", max_tokens: int = CHUNK_TOKENS
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): each document split
    into consecutive ``max_tokens``-token chunks, token order preserved.
    """
    tk = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    chunked = tk.withColumn(
        "chunk_id", F.floor(F.col("pos") / F.lit(max_tokens)).cast("long")
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("chunk_text"),
        )
        .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    max_tokens: int = PACK_TOKENS,
    part_col: str = "source",
) -> DataFrame:
    """(doc_id, source, n_tokens, bin_id): streaming first-fit packing —
    docs are taken in doc_id order within each ``part_col`` partition
    and assigned to bin floor(exclusive_running_tokens / max_tokens).

    A bin may exceed max_tokens by at most its last doc (the trainer
    truncates or overflows); bins are otherwise dense.  Deterministic
    given the (part_col, doc_id) order."""
    sized = docs.select(
        "doc_id",
        F.col(part_col).alias("source"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return sized.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(float(max_tokens))).cast("long")
    )


def bin_stats(packed: DataFrame, max_tokens: int = PACK_TOKENS) -> DataFrame:
    """Per-bin utilization of a ``pack_sequences`` output: docs per bin,
    token fill, and fill ratio against the target size."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround

    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn(
            "fill_ratio",
            dround(F.col("bin_tokens") / F.lit(float(max_tokens)), 6),
        )
    )


def quality_percentile_filter(
    docs: DataFrame,
    text_col: str = "text",
    stratum_col: str = "lang",
    min_pct: float = 0.5,
) -> DataFrame:
    """Keep documents at or above the ``min_pct`` quality percentile of
    their stratum — corpus curation with a PER-LANGUAGE bar, so a
    high-resource language's score distribution doesn't starve the
    tail languages (absolute thresholds do).

    percent_rank over (stratum / quality, doc_id) — deterministic
    tie-break; one shuffle on the stratum.  At 100 TB swap the exact
    window for approx quantile cutoffs computed per stratum and joined
    back (same filter, bounded memory)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        dround,
        quality_score,
    )

    scored = docs.select(
        "doc_id",
        F.col(stratum_col).alias("stratum"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    w = Window.partitionBy("stratum").orderBy("quality", "doc_id")
    return (
        scored.withColumn("pct", dround(F.percent_rank().over(w), 6))
        .filter(F.col("pct") >= min_pct)
        .select("doc_id", "stratum", "quality", "pct")
    )


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB)
# ---------------------------------------------------------------------------

_SQL_TOKENS = "list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"


def oracle_doc_chunks_sql(
    table: str = "documents", max_tokens: int = CHUNK_TOKENS
) -> str:
    toks = _SQL_TOKENS.format(t="text")
    return f"""
        WITH t AS (
            SELECT doc_id, {toks} AS toks FROM {table}
        ),
        tk AS (
            SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks
            FROM t
        ),
        flat AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
            FROM tk
        )
        SELECT doc_id,
               CAST((pos - pos % {max_tokens}) / {max_tokens} AS BIGINT)
                   AS chunk_id,
               COUNT(*) AS n_tokens,
               string_agg(tok, ' ' ORDER BY pos) AS chunk_text
        FROM flat
        GROUP BY doc_id, chunk_id
    """


def oracle_pack_sequences_sql(
    table: str = "documents",
    max_tokens: int = PACK_TOKENS,
    part_col: str = "source",
) -> str:
    toks = _SQL_TOKENS.format(t="text")
    return f"""
        WITH sized AS (
            SELECT doc_id, {part_col} AS source,
                   CAST(len({toks}) AS BIGINT) AS n_tokens
            FROM {table}
        )
        SELECT doc_id, source, n_tokens,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) / CAST({max_tokens} AS DOUBLE)) AS BIGINT) AS bin_id
        FROM sized
    """


def oracle_quality_percentile_sql(
    table: str = "documents",
    t: str = "text",
    stratum_col: str = "lang",
    min_pct: float = 0.5,
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        _sql_punct_ratio,
        _sql_stopword_ratio,
        _sql_token_count,
        sql_dround,
    )

    ntok = _sql_token_count(t)
    quality = sql_dround(
        f"LEAST(1.0, {ntok} / 50.0) * (1.0 - {_sql_punct_ratio(t)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(t, 'en')} * 5.0))",
        6,
    )
    pct = sql_dround(
        "PERCENT_RANK() OVER (PARTITION BY stratum ORDER BY quality, doc_id)",
        6,
    )
    return f"""
        WITH scored AS (
            SELECT doc_id, {stratum_col} AS stratum, {quality} AS quality
            FROM {table}
        ),
        ranked AS (
            SELECT doc_id, stratum, quality, {pct} AS pct FROM scored
        )
        SELECT doc_id, stratum, quality, pct
        FROM ranked WHERE pct >= {min_pct}
    """


def oracle_pack_bins_sql(
    table: str = "documents",
    max_tokens: int = PACK_TOKENS,
    part_col: str = "source",
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import sql_dround

    packed = oracle_pack_sequences_sql(table, max_tokens, part_col)
    fill = sql_dround(
        f"CAST(SUM(n_tokens) AS BIGINT) / CAST({max_tokens} AS DOUBLE)", 6
    )
    return f"""
        WITH packed AS ({packed})
        SELECT source, bin_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               {fill} AS fill_ratio
        FROM packed
        GROUP BY source, bin_id
    """


# ---------------------------------------------------------------------------
# End-to-end curation snapshot: normalize -> exact dedup -> quality gate
# ---------------------------------------------------------------------------

CURATION_QUALITY_CUTOFF = 0.35


def curated_docs(docs: DataFrame) -> DataFrame:
    """The whole pre-training curation pass as ONE lazy plan:

    1. canonicalize text (``text.norm_expr`` — narrow map, no shuffle);
    2. exact-dedup on the 8-byte fingerprint of the canonical text,
       keeping the lowest doc_id per group (one shuffle on the
       fingerprint — never on the text itself);
    3. gate on the deterministic quality score
       (>= ``CURATION_QUALITY_CUTOFF``).

    Output: (doc_id, source, n_chars_norm, quality) for every kept doc.

    Scale notes: stage 1 rides the scan; stage 2 is a min-over-window
    on the fingerprint — ONE scan and ONE shuffle total (the
    alternative agg-then-join formulation scans the corpus twice and
    shuffles the text through the join anyway, since the keeper set is
    data-scaling and can't broadcast); stage 3 is a projection+filter
    on the survivor set.  The 60-bit fingerprint key is uniform by
    construction, so the single exchange has no skew.  The composition
    is what the standalone operators (normalize_text, dedup_exact,
    quality_filter_docs) do separately; fused here so a user runs
    curation with one action."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        norm_expr,
        quality_score,
    )

    base = docs.select(
        "doc_id", "source", norm_expr(F.col("text")).alias("norm_text")
    ).withColumn("fingerprint", _md5_hash(F.col("norm_text")))
    w = Window.partitionBy("fingerprint")
    kept = (
        base.withColumn("keeper_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper_id"))
    )
    return (
        kept.withColumn("quality", quality_score(F.col("norm_text")))
        .filter(F.col("quality") >= CURATION_QUALITY_CUTOFF)
        .select(
            "doc_id",
            "source",
            F.length("norm_text").cast("long").alias("n_chars_norm"),
            "quality",
        )
        .orderBy("doc_id")
    )


def oracle_curated_docs_sql(table: str = "documents", t: str = "text") -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        _sql_punct_ratio,
        _sql_stopword_ratio,
        _sql_token_count,
        sql_dround,
        sql_norm_expr,
    )

    nt = "norm_text"
    quality = sql_dround(
        f"LEAST(1.0, {_sql_token_count(nt)} / 50.0)"
        f" * (1.0 - {_sql_punct_ratio(nt)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(nt, 'en')} * 5.0))",
        6,
    )
    return f"""
        WITH base AS (
            SELECT doc_id, source,
                   {sql_norm_expr(t)} AS norm_text,
                   {_sql_md5_hash(sql_norm_expr(t))} AS fingerprint
            FROM {table}
        ),
        keepers AS (
            SELECT fingerprint, MIN(doc_id) AS doc_id
            FROM base GROUP BY fingerprint
        ),
        kept AS (
            SELECT b.* FROM base b
            JOIN keepers k
              ON b.fingerprint = k.fingerprint AND b.doc_id = k.doc_id
        )
        SELECT doc_id, source,
               CAST(LENGTH(norm_text) AS BIGINT) AS n_chars_norm,
               {quality} AS quality
        FROM kept
        WHERE {quality} >= {CURATION_QUALITY_CUTOFF}
        ORDER BY doc_id
    """


def build_training_set(docs: DataFrame) -> DataFrame:
    """The END-TO-END corpus -> training-shards pass as ONE lazy plan:
    (doc_id, split, n_tokens, bin_id).

    1. curation — canonicalize, fingerprint exact-dedup (keep lowest
       doc_id), quality gate (the ``curated_docs`` stages, inlined so
       norm_text survives for token counting);
    2. leakage-free split assignment — ``sampling.dataset_split`` on
       the doc_id hash (pure function: re-runs and late shards land in
       the same split);
    3. per-split sequence packing — the ``pack_sequences``
       running-cumsum first-fit, partitioned by split so bins never
       straddle a split boundary.

    Plan cost: one scan + the fingerprint exchange (curation) + the
    per-split ordered window (packing) — the split column adds NO
    shuffle (hash projection), so the fused pass pays exactly the same
    two exchanges the curation and packing operators pay separately,
    once."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.sampling import (
        dataset_split,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        norm_expr,
        quality_score,
        token_count,
    )

    base = docs.select(
        "doc_id", norm_expr(F.col("text")).alias("norm_text")
    ).withColumn("fingerprint", _md5_hash(F.col("norm_text")))
    w = Window.partitionBy("fingerprint")
    kept = (
        base.withColumn("keeper_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper_id"))
        .withColumn("quality", quality_score(F.col("norm_text")))
        .filter(F.col("quality") >= CURATION_QUALITY_CUTOFF)
    )
    sized = dataset_split(kept, ["doc_id"]).select(
        "doc_id",
        "split",
        token_count(F.col("norm_text")).alias("n_tokens"),
    )
    pw = (
        Window.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(pw), F.lit(0).cast("long"))
    return sized.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(float(PACK_TOKENS))).cast("long")
    )


def oracle_build_training_set_sql(
    table: str = "documents", t: str = "text"
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.sampling import (
        RES,
        _sql_md5_hash as _samp_hash,
        _sql_sample_key,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        _sql_punct_ratio,
        _sql_stopword_ratio,
        _sql_token_count,
        sql_dround,
        sql_norm_expr,
    )

    nt = "norm_text"
    quality = sql_dround(
        f"LEAST(1.0, {_sql_token_count(nt)} / 50.0)"
        f" * (1.0 - {_sql_punct_ratio(nt)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(nt, 'en')} * 5.0))",
        6,
    )
    bucket = f"({_samp_hash(_sql_sample_key(['doc_id'], 'split'))} % {RES})"
    v = int(0.1 * RES)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   {sql_norm_expr(t)} AS norm_text,
                   {_sql_md5_hash(sql_norm_expr(t))} AS fingerprint
            FROM {table}
        ),
        keepers AS (
            SELECT fingerprint, MIN(doc_id) AS doc_id
            FROM base GROUP BY fingerprint
        ),
        kept AS (
            SELECT b.* FROM base b
            JOIN keepers k
              ON b.fingerprint = k.fingerprint AND b.doc_id = k.doc_id
        ),
        gated AS (
            SELECT doc_id, norm_text FROM kept
            WHERE {quality} >= {CURATION_QUALITY_CUTOFF}
        ),
        sized AS (
            SELECT doc_id,
                   CASE WHEN {bucket} < {v} THEN 'validation'
                        WHEN {bucket} < {2 * v} THEN 'test'
                        ELSE 'train' END AS split,
                   CAST({_sql_token_count(nt)} AS BIGINT) AS n_tokens
            FROM gated
        )
        SELECT doc_id, split, n_tokens,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY split ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) / CAST({PACK_TOKENS} AS DOUBLE)) AS BIGINT) AS bin_id
        FROM sized
    """


CHECKSUM_MOD = (1 << 61) - 1


def training_manifest(docs: DataFrame) -> DataFrame:
    """(split, bin_id, n_docs, shard_tokens, checksum): the
    reproducibility MANIFEST of :func:`build_training_set` — one row
    per training shard with its document count, token total, and an
    order-independent exact membership checksum (SUM of each member's
    60-bit doc_id hash, DECIMAL(38,0)-accumulated, mod 2^61-1).

    Two independently built corpora (different cluster, different
    partitioning, a re-run after a backfill) can be proven
    shard-identical by comparing manifests alone — the provenance
    check a data card cites without re-reading 100 TB.  SUM is the
    right combiner: commutative/associative (partitioning-independent)
    and exact in decimal, unlike float or concat-order schemes.

    Plan: build_training_set's two exchanges + one combinable groupBy
    onto the shard key — output cardinality = #shards, trivially
    collectable at any corpus size."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash

    ts = build_training_set(docs).withColumn(
        "h", _md5_hash(F.col("doc_id").cast("string"))
    )
    return (
        ts.groupBy("split", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.expr(
                f"CAST(SUM(CAST(h AS DECIMAL(38,0))) % {CHECKSUM_MOD}"
                " AS BIGINT)"
            ).alias("checksum"),
        )
        .orderBy("split", "bin_id")
    )


def oracle_training_manifest_sql(
    table: str = "documents", t: str = "text"
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )

    inner = oracle_build_training_set_sql(table, t)
    h = _sql_md5_hash("CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT split, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(SUM(CAST({h} AS HUGEINT)) % {CHECKSUM_MOD}
                    AS BIGINT) AS checksum
        FROM ({inner}) ts
        GROUP BY 1, 2
        ORDER BY split, bin_id
    """


def manifest_diff(docs_old: DataFrame, docs_new: DataFrame) -> DataFrame:
    """(split, bin_id, status, n_docs_old, n_docs_new, tokens_old,
    tokens_new): shard-level diff of two corpus builds via their
    :func:`training_manifest` rows — ``unchanged`` (checksum, counts
    and tokens all equal), ``changed``, ``added`` or ``removed``.

    This is the incremental-rebuild audit: after a backfill or a
    late-arriving source lands, the diff names exactly which training
    shards must be re-emitted and proves the rest byte-identical —
    without reading either corpus again.  Because the packing prefix
    is deterministic (content-hash split + doc_id-ordered first-fit),
    shards upstream of the first membership change stay ``unchanged``
    by construction, so the re-emit set is the true blast radius.

    Plan: two manifest builds (each: two exchanges + a combinable
    groupBy) and one full outer join on the #shards-row key space —
    diff arithmetic never touches corpus-sized data."""
    a = training_manifest(docs_old).withColumnsRenamed(
        {
            "n_docs": "n_docs_old",
            "shard_tokens": "tokens_old",
            "checksum": "ck_old",
        }
    )
    b = training_manifest(docs_new).withColumnsRenamed(
        {
            "n_docs": "n_docs_new",
            "shard_tokens": "tokens_new",
            "checksum": "ck_new",
        }
    )
    j = a.join(b, ["split", "bin_id"], "full_outer")
    status = (
        F.when(F.col("ck_old").isNull(), F.lit("added"))
        .when(F.col("ck_new").isNull(), F.lit("removed"))
        .when(
            (F.col("ck_old") == F.col("ck_new"))
            & (F.col("n_docs_old") == F.col("n_docs_new"))
            & (F.col("tokens_old") == F.col("tokens_new")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "split",
        "bin_id",
        status.alias("status"),
        F.coalesce("n_docs_old", F.lit(0)).alias("n_docs_old"),
        F.coalesce("n_docs_new", F.lit(0)).alias("n_docs_new"),
        F.coalesce("tokens_old", F.lit(0)).alias("tokens_old"),
        F.coalesce("tokens_new", F.lit(0)).alias("tokens_new"),
    ).orderBy("split", "bin_id")


def oracle_manifest_diff_sql(
    old_filter: str, table: str = "documents", t: str = "text"
) -> str:
    """DuckDB twin: the old corpus is ``{table}`` filtered by
    ``old_filter`` (a boolean SQL expression over the documents
    columns), the new corpus is the full table."""
    mani_old = oracle_training_manifest_sql(
        f"(SELECT * FROM {table} WHERE {old_filter})", t
    )
    mani_new = oracle_training_manifest_sql(table, t)
    return f"""
        WITH mo AS ({mani_old}), mn AS ({mani_new})
        SELECT COALESCE(mo.split, mn.split) AS split,
               COALESCE(mo.bin_id, mn.bin_id) AS bin_id,
               CASE WHEN mo.checksum IS NULL THEN 'added'
                    WHEN mn.checksum IS NULL THEN 'removed'
                    WHEN mo.checksum = mn.checksum
                         AND mo.n_docs = mn.n_docs
                         AND mo.shard_tokens = mn.shard_tokens
                         THEN 'unchanged'
                    ELSE 'changed' END AS status,
               CAST(COALESCE(mo.n_docs, 0) AS BIGINT) AS n_docs_old,
               CAST(COALESCE(mn.n_docs, 0) AS BIGINT) AS n_docs_new,
               CAST(COALESCE(mo.shard_tokens, 0) AS BIGINT) AS tokens_old,
               CAST(COALESCE(mn.shard_tokens, 0) AS BIGINT) AS tokens_new
        FROM mo FULL OUTER JOIN mn
          ON mo.split = mn.split AND mo.bin_id = mn.bin_id
        ORDER BY split, bin_id
    """


# ---------------------------------------------------------------------------
# Multimodal training-set assembly (r9 verdict #3): documents + decoded
# media interleaved into packed sequences with a leakage-free split
# ---------------------------------------------------------------------------

# Media "token block" sizing: decoded atomic units (pixels / samples /
# pixel-frames, router.decode_any's ``units``) per trainer token.
# Images tokenize as 8x8 patches (64 px/token, the ViT discipline),
# audio as 160-sample hops (10 ms @ 16 kHz), video as 16x16
# spatiotemporal patches (256 px-frame/token).  Exact integers:
# n_tokens = ceil(units / divisor).
MEDIA_TOKEN_DIVISORS = {
    "raw_image": 64,
    "png": 64,
    "jpeg_baseline": 64,
    "jpeg_progressive": 64,
    "gif": 64,
    "raw_video": 256,
    "avi_mjpeg": 256,
    "raw_audio": 160,
    "wav": 160,
}


def media_token_blocks(routed: DataFrame) -> DataFrame:
    """route_media output -> (modality, item_id, n_tokens) token
    blocks: one row per decodable media item, its trainer-token cost
    derived from the DECODED unit count (so a truncated payload that
    decodes short costs fewer tokens — the router already loud-fails
    corrupt streams).  ``unknown`` payloads are excluded: undecodable
    bytes never reach a training sequence.  Pure projection on the
    routed rows — the decode cost was already paid by route_media's
    single pass."""
    divisor = None
    for kind, d in sorted(MEDIA_TOKEN_DIVISORS.items()):
        cond = F.col("media_type") == kind
        divisor = (
            F.when(cond, F.lit(d))
            if divisor is None
            else divisor.when(cond, F.lit(d))
        )
    return (
        routed.filter(
            F.col("media_type").isin(list(MEDIA_TOKEN_DIVISORS))
        )
        .withColumn("divisor", divisor)
        .select(
            F.col("media_type").alias("modality"),
            F.col("media_id").alias("item_id"),
            F.expr(
                "CAST((units + divisor - 1) DIV divisor AS BIGINT)"
            ).alias("n_tokens"),
        )
    )


def multimodal_training_set(
    docs: DataFrame, routed: DataFrame
) -> DataFrame:
    """The build_training_set discipline extended across modalities:
    (modality, item_id, split, n_tokens, bin_id).

    1. text — the full curation tier (canonicalize, fingerprint
       exact-dedup keeping the lowest doc_id, quality gate), token
       count on the canonical text;
    2. media — route_media's decoded features mapped to token blocks
       (media_token_blocks); undecodable payloads excluded;
    3. leakage-free split — dataset_split on the ``modality:item_id``
       key: a pure hash function, so re-runs, late shards, and
       incremental ingests land every item in the SAME split
       regardless of which modalities shipped together;
    4. packing — the streaming first-fit cumsum per split, ordered by
       item_key, so every bin interleaves text and media blocks
       deterministically and bins never straddle a split boundary.

    Plan: ONE scan per modality (docs pays the fingerprint exchange,
    media is a routed projection), one union, one window exchange on
    the split — the media leg adds zero extra scans or shuffles beyond
    the union."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.sampling import (
        dataset_split,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        norm_expr,
        quality_score,
        token_count,
    )

    base = docs.select(
        "doc_id", norm_expr(F.col("text")).alias("norm_text")
    ).withColumn("fingerprint", _md5_hash(F.col("norm_text")))
    w = Window.partitionBy("fingerprint")
    kept = (
        base.withColumn("keeper_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper_id"))
        .withColumn("quality", quality_score(F.col("norm_text")))
        .filter(F.col("quality") >= CURATION_QUALITY_CUTOFF)
    )
    text_items = kept.select(
        F.lit("text").alias("modality"),
        F.col("doc_id").alias("item_id"),
        token_count(F.col("norm_text")).alias("n_tokens"),
    )
    items = text_items.unionByName(media_token_blocks(routed)).withColumn(
        "item_key",
        F.concat_ws(":", "modality", F.col("item_id").cast("string")),
    )
    split_items = dataset_split(items, ["item_key"])
    pw = (
        Window.partitionBy("split")
        .orderBy("item_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(pw), F.lit(0).cast("long"))
    return split_items.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(float(PACK_TOKENS))).cast("long")
    ).select("modality", "item_id", "split", "n_tokens", "bin_id")


def multimodal_manifest(docs: DataFrame, routed: DataFrame) -> DataFrame:
    """Per-shard manifest of the multimodal set: item/text/media
    counts, token fill, and the order-independent exact membership
    checksum (training_manifest's SUM-mod discipline over the
    item_key hash) — two independently assembled multimodal corpora
    prove shard-identity by comparing manifests alone."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import _md5_hash

    ts = multimodal_training_set(docs, routed).withColumn(
        "h",
        _md5_hash(
            F.concat_ws(":", "modality", F.col("item_id").cast("string"))
        ),
    )
    return (
        ts.groupBy("split", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("modality") == "text").cast("long")
            ).alias("n_text"),
            F.sum(
                (F.col("modality") != "text").cast("long")
            ).alias("n_media"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.expr(
                f"CAST(SUM(CAST(h AS DECIMAL(38,0))) % {CHECKSUM_MOD}"
                " AS BIGINT)"
            ).alias("checksum"),
        )
        .orderBy("split", "bin_id")
    )


def _oracle_multimodal_items_ctes(
    media_rows: list[tuple[int, str, int]],
    table: str,
    t: str,
) -> str:
    """Shared CTE chain: text curation (the build_training_set SQL) +
    media token blocks from a locally-recomputed VALUES literal (the
    router-oracle composition) + the split/packing columns."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.sampling import (
        RES,
        _sql_md5_hash as _samp_hash,
        _sql_sample_key,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        _sql_punct_ratio,
        _sql_stopword_ratio,
        _sql_token_count,
        sql_dround,
        sql_norm_expr,
    )

    nt = "norm_text"
    quality = sql_dround(
        f"LEAST(1.0, {_sql_token_count(nt)} / 50.0)"
        f" * (1.0 - {_sql_punct_ratio(nt)})"
        f" * (0.5 + 0.5 * LEAST(1.0, {_sql_stopword_ratio(nt, 'en')} * 5.0))",
        6,
    )
    media_vals = ", ".join(
        f"({mid}, '{kind}', "
        f"{(units + MEDIA_TOKEN_DIVISORS[kind] - 1) // MEDIA_TOKEN_DIVISORS[kind]})"
        for mid, kind, units in media_rows
        if kind in MEDIA_TOKEN_DIVISORS
    )
    bucket = f"({_samp_hash(_sql_sample_key(['item_key'], 'split'))} % {RES})"
    v = int(0.1 * RES)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   {sql_norm_expr(t)} AS norm_text,
                   {_sql_md5_hash(sql_norm_expr(t))} AS fingerprint
            FROM {table}
        ),
        keepers AS (
            SELECT fingerprint, MIN(doc_id) AS doc_id
            FROM base GROUP BY fingerprint
        ),
        kept AS (
            SELECT b.* FROM base b
            JOIN keepers k
              ON b.fingerprint = k.fingerprint AND b.doc_id = k.doc_id
        ),
        gated AS (
            SELECT doc_id, norm_text FROM kept
            WHERE {quality} >= {CURATION_QUALITY_CUTOFF}
        ),
        text_items AS (
            SELECT 'text' AS modality, doc_id AS item_id,
                   CAST({_sql_token_count(nt)} AS BIGINT) AS n_tokens
            FROM gated
        ),
        media_items AS (
            SELECT modality, CAST(item_id AS BIGINT) AS item_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens
            FROM (VALUES {media_vals}) m(item_id, modality, n_tokens)
        ),
        items AS (
            SELECT *,
                   modality || ':' || CAST(item_id AS VARCHAR) AS item_key
            FROM (SELECT * FROM text_items
                  UNION ALL SELECT * FROM media_items)
        ),
        split_items AS (
            SELECT modality, item_id, item_key, n_tokens,
                   CASE WHEN {bucket} < {v} THEN 'validation'
                        WHEN {bucket} < {2 * v} THEN 'test'
                        ELSE 'train' END AS split
            FROM items
        ),
        packed AS (
            SELECT modality, item_id, item_key, split, n_tokens,
                   CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                            PARTITION BY split ORDER BY item_key
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                        0) / CAST({PACK_TOKENS} AS DOUBLE)) AS BIGINT)
                       AS bin_id
            FROM split_items
        )"""


def oracle_multimodal_training_set_sql(
    media_rows: list[tuple[int, str, int]],
    table: str = "documents",
    t: str = "text",
) -> str:
    return (
        _oracle_multimodal_items_ctes(media_rows, table, t)
        + """
        SELECT modality, item_id, split, n_tokens, bin_id
        FROM packed ORDER BY modality, item_id"""
    )


def oracle_multimodal_manifest_sql(
    media_rows: list[tuple[int, str, int]],
    table: str = "documents",
    t: str = "text",
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
        _sql_md5_hash,
    )

    h = _sql_md5_hash("item_key")
    return (
        _oracle_multimodal_items_ctes(media_rows, table, t)
        + f"""
        SELECT split, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN modality = 'text' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_text,
               CAST(SUM(CASE WHEN modality <> 'text' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_media,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(SUM(CAST({h} AS HUGEINT)) % {CHECKSUM_MOD}
                    AS BIGINT) AS checksum
        FROM packed
        GROUP BY 1, 2
        ORDER BY split, bin_id"""
    )


def multimodal_manifest_diff(
    docs_old: DataFrame,
    routed_old: DataFrame,
    docs_new: DataFrame,
    routed_new: DataFrame,
) -> DataFrame:
    """Shard-level diff of two multimodal builds via their
    :func:`multimodal_manifest` rows — the manifest_diff discipline
    extended across modalities.  The incremental scenario it audits:
    a late media shard (or a document backfill) lands, and the diff
    names exactly which interleaved training shards must re-emit
    while proving the rest identical by checksum, without re-decoding
    a single payload.  Same plan shape as manifest_diff: two manifest
    builds + one full outer join on the #shards-row key space."""
    a = multimodal_manifest(docs_old, routed_old).withColumnsRenamed(
        {
            "n_items": "n_items_old",
            "shard_tokens": "tokens_old",
            "checksum": "ck_old",
        }
    ).drop("n_text", "n_media")
    b = multimodal_manifest(docs_new, routed_new).withColumnsRenamed(
        {
            "n_items": "n_items_new",
            "shard_tokens": "tokens_new",
            "checksum": "ck_new",
        }
    ).drop("n_text", "n_media")
    j = a.join(b, ["split", "bin_id"], "full_outer")
    status = (
        F.when(F.col("ck_old").isNull(), F.lit("added"))
        .when(F.col("ck_new").isNull(), F.lit("removed"))
        .when(
            (F.col("ck_old") == F.col("ck_new"))
            & (F.col("n_items_old") == F.col("n_items_new"))
            & (F.col("tokens_old") == F.col("tokens_new")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "split",
        "bin_id",
        status.alias("status"),
        F.coalesce("n_items_old", F.lit(0)).alias("n_items_old"),
        F.coalesce("n_items_new", F.lit(0)).alias("n_items_new"),
        F.coalesce("tokens_old", F.lit(0)).alias("tokens_old"),
        F.coalesce("tokens_new", F.lit(0)).alias("tokens_new"),
    ).orderBy("split", "bin_id")


def oracle_multimodal_manifest_diff_sql(
    media_rows_old: list[tuple[int, str, int]],
    media_rows_new: list[tuple[int, str, int]],
    old_filter: str,
    table: str = "documents",
    t: str = "text",
) -> str:
    a = oracle_multimodal_manifest_sql(
        media_rows_old,
        table=f"(SELECT * FROM {table} WHERE {old_filter}) old_docs",
        t=t,
    )
    b = oracle_multimodal_manifest_sql(media_rows_new, table, t)
    return f"""
        SELECT COALESCE(a.split, b.split) AS split,
               COALESCE(a.bin_id, b.bin_id) AS bin_id,
               CASE WHEN a.checksum IS NULL THEN 'added'
                    WHEN b.checksum IS NULL THEN 'removed'
                    WHEN a.checksum = b.checksum
                         AND a.n_items = b.n_items
                         AND a.shard_tokens = b.shard_tokens
                        THEN 'unchanged'
                    ELSE 'changed' END AS status,
               CAST(COALESCE(a.n_items, 0) AS BIGINT) AS n_items_old,
               CAST(COALESCE(b.n_items, 0) AS BIGINT) AS n_items_new,
               CAST(COALESCE(a.shard_tokens, 0) AS BIGINT) AS tokens_old,
               CAST(COALESCE(b.shard_tokens, 0) AS BIGINT) AS tokens_new
        FROM ({a}) a
        FULL OUTER JOIN ({b}) b
          ON a.split = b.split AND a.bin_id = b.bin_id
        ORDER BY split, bin_id"""
