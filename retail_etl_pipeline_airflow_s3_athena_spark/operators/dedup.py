"""Deduplication operators for large-scale corpora.

The reference's only dedup surface is the full-row duplicate *check*
(scripts/data_quality.py:22, Q2); a training-data pipeline needs actual
dedup.  This module provides, over the ``documents`` table:

- exact dedup        : normalized-text fingerprint -> hash groupBy
- MinHash signatures : k=16 deterministic minhashes over 3-token shingles
- LSH candidates     : band(4x4) bucketing -> self-join -> pair estimate
- near-dup pairs     : LSH candidates verified by exact shingle Jaccard
- SimHash            : 32-bit bag-of-words simhash signature
- blocked Jaccard    : exact n-gram Jaccard within a blocking key

Everything is native Spark expressions (nested higher-order functions,
no Python UDFs).  Determinism is a design requirement: MinHash uses
explicit literal coefficients (not MLlib's seeded-random MinHashLSH) so
results are reproducible across engines and runs — the DuckDB oracle
implements the identical arithmetic.

Scale notes (100 TB):
- Signatures are narrow per-row maps: no shuffle, ~200 B/doc of state.
- The ONLY shuffle in LSH dedup is the band-bucket self-join: keys are
  (band_idx, band_hash), uniformly distributed by construction, so no
  skew; bucket sizes are bounded by collision probability, not corpus
  size.  This is the standard web-scale near-dup architecture.
- Exact pairwise Jaccard is only ever computed on LSH candidates (or
  within an explicit blocking key) — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    FP_BASE,
    FP_MOD,
    dround,
    sql_dround,
    tokens,
)

# Shingle-combination constants (fixed, mirrored in oracle SQL).
SH_C1 = 1000003
SH_C2 = 10007

# MinHash coefficients: k=16 deterministic (a, b) pairs, derived from
# fixed multipliers — literal values, identical in Spark and SQL.
NUM_HASHES = 16
A_COEF = [((2 * j + 1) * 1103515245) % FP_MOD for j in range(NUM_HASHES)]
B_COEF = [((j + 1) * 12345 + 67890) % FP_MOD for j in range(NUM_HASHES)]

# LSH banding: 4 bands x 4 rows.
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

SIMHASH_BITS = 32


# ---------------------------------------------------------------------------
# Column-level builders (Spark)
# ---------------------------------------------------------------------------

def _char_hash(s: Column) -> Column:
    """Polynomial rolling hash over the characters of a string column."""
    chars = F.filter(F.split(s, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * FP_BASE + x) % FP_MOD
    )


def token_hashes(col: Column) -> Column:
    """array<long>: polynomial hash of each whitespace token."""
    return F.transform(tokens(col), _char_hash)


def shingle_hashes(col: Column) -> Column:
    """array<long>: hashes of 3-token shingles (falls back to token
    hashes for texts shorter than 3 tokens)."""
    th = token_hashes(col)
    n = F.size(th)
    shingled = F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: (
            F.element_at(th, i + F.lit(1)) * SH_C1
            + F.element_at(th, i + F.lit(2)) * SH_C2
            + F.element_at(th, i + F.lit(3))
        )
        % FP_MOD,
    )
    return F.when(n >= 3, shingled).otherwise(th)


def minhash_col(sh: Column, j: int) -> Column:
    """j-th minhash of a shingle-hash array: min((a_j*s + b_j) mod p)."""
    return F.array_min(
        F.transform(sh, lambda s: (s * A_COEF[j] + B_COEF[j]) % FP_MOD)
    )


def simhash_col(col: Column) -> Column:
    """32-bit SimHash over (bag-of-words) token hashes."""
    th = token_hashes(col)
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda b: F.when(
            F.aggregate(
                th,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(
                    h.bitwiseAND(F.element_at(powers, b + F.lit(1))) > 0,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            > 0,
            F.element_at(powers, b + F.lit(1)),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# DataFrame-level operators
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: every doc gets its
    group's keeper (min doc_id) and a duplicate flag.  One shuffle on the
    8-byte fingerprint — the cheapest possible exact-dedup key."""
    from pyspark.sql import Window

    fp = _char_hash(F.lower(F.trim(F.col(text_col))))
    w = Window.partitionBy("fingerprint")
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("is_duplicate", F.col("doc_id") != F.col("keeper_id"))
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + mh_0..mh_15 minhash signature columns."""
    sh = shingle_hashes(F.col(text_col))
    d = docs.select("doc_id", sh.alias("sh"))
    return d.select(
        "doc_id",
        *[minhash_col(F.col("sh"), j).alias(f"mh_{j}") for j in range(NUM_HASHES)],
    )


def _band_hash_expr(band: int) -> Column:
    """Combine one band's minhashes into a single bucket key."""
    acc = F.lit(0).cast("long")
    for r in range(ROWS_PER_BAND):
        acc = (acc * FP_BASE + F.col(f"mh_{band * ROWS_PER_BAND + r}")) % FP_MOD
    return acc


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band bucket, with
    the signature-estimated Jaccard (fraction of equal minhashes).

    Plan shape: signatures (narrow) -> explode to 4 band rows -> self-
    join on (band, band_hash) -> distinct pairs -> rejoin signatures for
    the estimate.  The self-join is the one shuffle; its key space is
    uniform hashes so AQE never sees skew."""
    sig = minhash_signatures(docs, text_col)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _band_hash_expr(b).alias("bh")
                    )
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh_{j}") == F.col(f"sb.mh_{j}"), 1).otherwise(0)
        for j in range(NUM_HASHES)
    )
    return (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(sb, pairs.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (matches / F.lit(float(NUM_HASHES))).alias("est_jaccard"),
        )
    )


def near_dup_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified with exact
    3-shingle Jaccard >= threshold."""
    cands = lsh_candidate_pairs(docs, text_col).select("doc_a", "doc_b")
    sh = docs.select(
        "doc_id", F.array_distinct(shingle_hashes(F.col(text_col))).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = dround(inter / union, 6)
    return (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, cands.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + 32-bit simhash (as BIGINT)."""
    return docs.select(
        "doc_id", simhash_col(F.col(text_col)).alias("simhash")
    )


def blocked_jaccard_pairs(
    docs: DataFrame,
    block_col: str = "source",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard over pairs sharing a blocking
    key — the classic blocked-dedup pattern.  The equi-join on the block
    key keeps the pair space at sum(block_size^2), not corpus^2."""
    sh = docs.select(
        F.col("doc_id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(shingle_hashes(F.col(text_col))).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = dround(inter / union, 6)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB)
# ---------------------------------------------------------------------------

def _sql_char_hash(s: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split({s}, ''), c -> c <> ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})"
    )


def _sql_token_hashes(t: str) -> str:
    toks = f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"
    return f"list_transform({toks}, tk -> {_sql_char_hash('tk')})"


_SQL_SHINGLES = f"""
CASE WHEN len(th) >= 3 THEN
    list_transform(range(1, len(th) - 1),
        i -> (th[i] * {SH_C1} + th[i + 1] * {SH_C2} + th[i + 2]) % {FP_MOD})
ELSE th END
"""


def _sql_signature_cte(table: str = "documents", t: str = "text") -> str:
    """CTEs: th (token hashes) -> sh (shingles) -> sig (mh_0..15)."""
    mh_cols = ",\n           ".join(
        f"list_min(list_transform(sh, s -> (s * {A_COEF[j]} + {B_COEF[j]}) % {FP_MOD}))"
        f" AS mh_{j}"
        for j in range(NUM_HASHES)
    )
    return f"""
th_t AS (
    SELECT doc_id, {_sql_token_hashes(t)} AS th FROM {table}
),
sh_t AS (
    SELECT doc_id, {_SQL_SHINGLES.strip()} AS sh FROM th_t
),
sig AS (
    SELECT doc_id,
           {mh_cols}
    FROM sh_t
)
"""


def _sql_band_hash(band: int) -> str:
    expr = "CAST(0 AS BIGINT)"
    for r in range(ROWS_PER_BAND):
        expr = f"(({expr}) * {FP_BASE} + mh_{band * ROWS_PER_BAND + r}) % {FP_MOD}"
    return expr


def oracle_exact_dedup_sql(table: str = "documents", t: str = "text") -> str:
    fp = _sql_char_hash(f"LOWER(TRIM({t}))")
    return f"""
        WITH f AS (SELECT doc_id, {fp} AS fingerprint FROM {table})
        SELECT doc_id, fingerprint,
               MIN(doc_id) OVER (PARTITION BY fingerprint) AS keeper_id,
               doc_id <> MIN(doc_id) OVER (PARTITION BY fingerprint)
                   AS is_duplicate
        FROM f
    """


def oracle_minhash_signatures_sql(table: str = "documents", t: str = "text") -> str:
    return f"WITH {_sql_signature_cte(table, t).strip()}\nSELECT * FROM sig"


def oracle_lsh_candidate_pairs_sql(table: str = "documents", t: str = "text") -> str:
    band_selects = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, {_sql_band_hash(b)} AS bh FROM sig"
        for b in range(NUM_BANDS)
    )
    matches = " + ".join(
        f"CASE WHEN sa.mh_{j} = sb.mh_{j} THEN 1 ELSE 0 END"
        for j in range(NUM_HASHES)
    )
    return f"""
        WITH {_sql_signature_cte(table, t).strip()},
        bands AS (
        {band_selects}
        ),
        pairs AS (
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
            FROM bands l JOIN bands r
              ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               ({matches}) / {float(NUM_HASHES)} AS est_jaccard
        FROM pairs p
        JOIN sig sa ON p.doc_a = sa.doc_id
        JOIN sig sb ON p.doc_b = sb.doc_id
    """


def oracle_near_dup_pairs_sql(
    table: str = "documents", t: str = "text", threshold: float = 0.5
) -> str:
    band_selects = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, {_sql_band_hash(b)} AS bh FROM sig"
        for b in range(NUM_BANDS)
    )
    jac = sql_dround(
        "len(list_intersect(a.sh, b.sh)) / "
        "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))",
        6,
    )
    return f"""
        WITH {_sql_signature_cte(table, t).strip()},
        bands AS (
        {band_selects}
        ),
        pairs AS (
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
            FROM bands l JOIN bands r
              ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
        ),
        dsh AS (SELECT doc_id, list_distinct(sh) AS sh FROM sh_t)
        SELECT p.doc_a, p.doc_b, {jac} AS jaccard
        FROM pairs p
        JOIN dsh a ON p.doc_a = a.doc_id
        JOIN dsh b ON p.doc_b = b.doc_id
        WHERE {jac} >= {threshold}
    """


def oracle_simhash_sql(table: str = "documents", t: str = "text") -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(th, "
        f"h -> CASE WHEN (h & {1 << b}) > 0 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH th_t AS (SELECT doc_id, {_sql_token_hashes(t)} AS th FROM {table})
        SELECT doc_id, {bit_terms} AS simhash FROM th_t
    """


def oracle_blocked_jaccard_sql(
    table: str = "documents",
    block_col: str = "source",
    t: str = "text",
    threshold: float = 0.5,
) -> str:
    jac = sql_dround(
        "len(list_intersect(a.sh, b.sh)) / "
        "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))",
        6,
    )
    return f"""
        WITH th_t AS (
            SELECT doc_id, {block_col} AS blk, {_sql_token_hashes(t)} AS th
            FROM {table}
        ),
        dsh AS (
            SELECT doc_id, blk,
                   list_distinct({_SQL_SHINGLES.strip()}) AS sh
            FROM th_t
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {jac} AS jaccard
        FROM dsh a JOIN dsh b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE {jac} >= {threshold}
    """
