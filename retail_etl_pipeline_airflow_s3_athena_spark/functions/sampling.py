"""Deterministic hash-based sampling.

``df.sample()`` is seed-dependent AND partitioning-dependent (Bernoulli
per split) — re-running after a repartition changes the sample, which
is unacceptable in a training-data pipeline (no reproducibility, no
oracle).  These operators sample by CONTENT: a row is kept iff the md5
of its key falls under the rate threshold, so the decision is a pure
function of the row — stable across runs, partitionings, engines, and
incremental re-processing (a new batch samples consistently with every
prior batch).

- hash_sample            : uniform rate over a key
- stratified_hash_sample : per-stratum rates (e.g. downsample dominant
  languages, keep the tail) — THE core curation knob for corpus mixing

Scale notes: both are pure per-row filters — no shuffle, no state, and
the md5 path is the same codegen'd expression the dedup family uses.
Pushed below any downstream shuffle, they cut the data volume first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
    _md5_hash,
    _sql_md5_hash,
)

# Sampling resolution: rates are quantized to 1/RES.
RES = 1_000_000
_SEP = "\x1f"  # unit separator — cannot appear in numeric/plain keys


def _sample_key(key_cols: list[str], salt: str) -> Column:
    return F.concat_ws(
        _SEP, *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )


def _sql_sample_key(key_cols: list[str], salt: str) -> str:
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_cols)
    return f"concat_ws(chr(31), {cols}, '{salt}')"


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key-hash bucket (uniform in [0, RES)) falls under
    ``rate``.  ``salt`` decorrelates independent samples over the same
    keys (e.g. train/validation splits use different salts)."""
    bucket = _md5_hash(_sample_key(key_cols, salt)) % RES
    return df.filter(bucket < int(rate * RES))


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates; strata not listed get
    ``default_rate``.  One codegen'd CASE — no per-stratum passes."""
    bucket = _md5_hash(_sample_key(key_cols, salt)) % RES
    thresh: Column = F.lit(int(default_rate * RES))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * RES))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB)
# ---------------------------------------------------------------------------

def oracle_hash_sample_sql(
    table: str,
    key_cols: list[str],
    rate: float,
    salt: str = "",
    select: str = "*",
) -> str:
    bucket = f"({_sql_md5_hash(_sql_sample_key(key_cols, salt))} % {RES})"
    return f"""
        SELECT {select} FROM {table}
        WHERE {bucket} < {int(rate * RES)}
    """


def oracle_stratified_sample_sql(
    table: str,
    stratum_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "",
    select: str = "*",
) -> str:
    bucket = f"({_sql_md5_hash(_sql_sample_key(key_cols, salt))} % {RES})"
    # mirror the Spark when-chain: later dict entries take precedence,
    # so emit CASE branches in REVERSE sorted order
    branches = "\n            ".join(
        f"WHEN {stratum_col} = '{v}' THEN {int(r * RES)}"
        for v, r in sorted(rates.items(), reverse=True)
    )
    return f"""
        SELECT {select} FROM {table}
        WHERE {bucket} < (CASE
            {branches}
            ELSE {int(default_rate * RES)} END)
    """


def group_cap(
    df: DataFrame,
    group_col: str,
    k: int,
    order_by: list[tuple[str, bool]],
    tiebreak_col: str,
) -> DataFrame:
    """Frequency capping: keep at most ``k`` rows per ``group_col``
    value, by deterministic priority (``order_by`` = [(col, ascending)],
    with ``tiebreak_col`` pinned ascending last so rank order is total).

    The standard per-domain / per-source cap of web-corpus curation —
    one over-represented domain can't dominate the training mix.

    Scale notes: the rank-filter compiles to a WindowGroupLimit
    (Spark >= 3.5) — each map task keeps only its local top-k per group
    BEFORE the shuffle, so shuffle volume is bounded by groups x k,
    not corpus size; a single hot group never materializes beyond k
    rows per task.  Priority must be deterministic (no F.rand) or the
    kept set changes across retries/engines."""
    cols = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]
    w = Window.partitionBy(group_col).orderBy(*cols, F.col(tiebreak_col).asc())
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def source_cap_docs(docs: DataFrame, k: int = 10) -> DataFrame:
    """Cap the corpus at k docs per source, preferring longer documents
    (a crude quality prior) — deterministic via the doc_id tiebreak."""
    capped = group_cap(
        docs, "source", k, order_by=[("n_chars", False)], tiebreak_col="doc_id"
    )
    return capped.select("doc_id", "source", "n_chars", "rank_in_group")


def oracle_source_cap_sql(table: str = "documents", k: int = 10) -> str:
    return f"""
        SELECT doc_id, source, n_chars, rank_in_group
        FROM (
            SELECT doc_id, source, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC
                   ) AS rank_in_group
            FROM {table}
        )
        WHERE rank_in_group <= {k}
    """


def corpus_shuffle(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int = 64,
    salt: str = "epoch0",
) -> DataFrame:
    """Deterministic global training-order shuffle: each row gets a
    content-hash ``shuffle_key`` and a ``shard`` assignment.  Writing
    partitioned by shard, sorted by shuffle_key, yields a reproducible
    pseudo-random order; a new ``salt`` (epoch) re-shuffles with zero
    correlation to the previous order.

    This replaces orderBy(rand()) — which is neither reproducible nor
    retry-safe (a recomputed partition would re-roll its randoms).
    Pure narrow map + hash: no global sort; the per-shard sort happens
    in the writer (sortWithinPartitions), parallel across shards."""
    key = _md5_hash(_sample_key(key_cols, salt))
    return df.withColumn("shuffle_key", key).withColumn(
        "shard", (F.col("shuffle_key") % n_shards).cast("int")
    )


def oracle_corpus_shuffle_sql(
    table: str,
    key_cols: list[str],
    n_shards: int = 64,
    salt: str = "epoch0",
    select: str = "*",
) -> str:
    key = _sql_md5_hash(_sql_sample_key(key_cols, salt))
    return f"""
        SELECT {select},
               {key} AS shuffle_key,
               CAST({key} % {n_shards} AS INT) AS shard
        FROM {table}
    """


def dataset_split(
    df: DataFrame,
    key_cols: list[str],
    val_rate: float = 0.1,
    test_rate: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment: the standard
    final step of a training-data pipeline.  One hash bucket per row
    (uniform in [0, RES)) cut at the val/test boundaries — assignment
    is a pure function of the key, so re-runs, late-arriving shards,
    and incremental ingests land rows in the SAME split (no leakage
    between splits across pipeline runs).  Narrow map, no shuffle."""
    bucket = _md5_hash(_sample_key(key_cols, salt)) % RES
    v = int(val_rate * RES)
    t = int(test_rate * RES)
    return df.withColumn(
        "split",
        F.when(bucket < v, "validation")
        .when(bucket < v + t, "test")
        .otherwise("train"),
    )


def oracle_dataset_split_sql(
    table: str,
    key_cols: list[str],
    val_rate: float = 0.1,
    test_rate: float = 0.1,
    salt: str = "split",
    select: str = "*",
) -> str:
    bucket = f"({_sql_md5_hash(_sql_sample_key(key_cols, salt))} % {RES})"
    v = int(val_rate * RES)
    t = int(test_rate * RES)
    return f"""
        SELECT {select},
               CASE WHEN {bucket} < {v} THEN 'validation'
                    WHEN {bucket} < {v + t} THEN 'test'
                    ELSE 'train' END AS split
        FROM {table}
    """
