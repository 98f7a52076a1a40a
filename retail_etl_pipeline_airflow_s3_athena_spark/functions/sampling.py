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

from pyspark.sql import Column, DataFrame
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
