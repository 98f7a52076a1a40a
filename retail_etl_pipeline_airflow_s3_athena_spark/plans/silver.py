"""Silver-layer cleaning (reference scripts/transform.py:9-70).

The reference reads bronze CSV, coerces a hard-coded candidate list of
date columns with ``errors='coerce'`` (unparseable -> NULL), fills NaN
in all numeric columns with 0, and writes date-partitioned snappy
Parquet.  Spark equivalents:

- ``to_timestamp`` returns NULL on parse failure — same semantics as
  pandas ``errors='coerce'`` (transform.py:35).
- ``df.na.fill(0, numeric_cols)`` with numeric_cols taken from the
  *schema* (we pin schemas rather than re-inferring per file, freezing
  the reference's inference-dependent behavior — SURVEY.md §7.3).
- Partitioned write lives in sources/writers.py.

All ops are native Column expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference scripts/transform.py:32 — the hard-coded candidate list.
DATE_COLUMN_CANDIDATES = [
    "created_at",
    "updated_at",
    "order_date",
    "signup_date",
    "last_restocked",
]

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    """Columns with a numeric schema type (the pinned-schema analog of
    pandas' inferred-numeric selection, reference transform.py:39-43)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)]


def coerce_dates(
    df: DataFrame, candidates: list[str] | None = None
) -> DataFrame:
    """Parse candidate date columns to timestamp; unparseable -> NULL.

    Reference scripts/transform.py:32-35 (pd.to_datetime errors='coerce').
    String columns get ``to_timestamp``; already-temporal columns pass
    through untouched.
    """
    candidates = DATE_COLUMN_CANDIDATES if candidates is None else candidates
    by_name = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for c in candidates:
        dt = by_name.get(c)
        if dt is None or isinstance(dt, (T.TimestampType, T.DateType)):
            continue
        # try_to_timestamp, not to_timestamp: under Spark 4's default
        # ANSI mode the latter THROWS on malformed input; the reference's
        # errors='coerce' semantics require malformed -> NULL.
        out = out.withColumn(c, F.try_to_timestamp(F.col(c)))
    return out


def fill_numeric_nulls(df: DataFrame, value: float = 0) -> DataFrame:
    """Fill NULL in every numeric column (reference transform.py:39-43)."""
    cols = numeric_columns(df)
    return df.na.fill(value, cols) if cols else df


def clean(df: DataFrame, date_candidates: list[str] | None = None) -> DataFrame:
    """The full silver cleaning pass: date coercion then numeric null-fill
    (reference csv_to_parquet, transform.py:9-70, minus the write)."""
    return fill_numeric_nulls(coerce_dates(df, date_candidates))


def pick_date_column(df: DataFrame) -> str | None:
    """First column whose name contains date/created/time — the
    reference's heuristic date pick (scripts/load.py:141-147).
    Driver-side metadata logic; no data scan."""
    for c in df.columns:
        lc = c.lower()
        if "date" in lc or "created" in lc or "time" in lc:
            return c
    return None
