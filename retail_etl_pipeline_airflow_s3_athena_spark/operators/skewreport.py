"""Join-key skew diagnostic.

Skewed keys are the #1 cause of straggler tasks at 100 TB: one
reducer gets a hot key's entire partition while the rest idle.  The
engine's mitigations exist (AQE skew-join splitting on by default in
session.py; `functions/skew.py` salting for the cases AQE can't fix)
— this operator is the MEASUREMENT that tells you which keys need
them, as a first-class gate-checked query rather than a notebook
one-off.

``key_skew_report`` profiles a key column in one map-side-combinable
aggregation: the top-k keys by row count, each with its corpus share
and its multiple of the mean key load (skew_x_e2 — "this key is 40x
the average").  ``n_rows * n_keys`` against the mean is exact integer
arithmetic (no division ordering hazards); share_e6 = 1e6·n div
total.  A key with skew_x_e2 above ~400 (4x mean) in a join input is
the candidate for salting; above AQE's skewedPartitionFactor it will
already be split at runtime.

Plan: one groupBy on the key (the same shuffle any join on that key
pays), a 1-row total/keys broadcast, TakeOrderedAndProject for the
top-k.  Output cardinality = k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 10**6
TOP_KEYS = 20


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = TOP_KEYS
) -> DataFrame:
    """(key, n_rows, share_e6, skew_x_e2): the ``top_k`` heaviest keys
    of ``key_col`` (count desc, key asc — pinned tie-break).
    skew_x_e2 = 100·n_rows·n_distinct_keys div total_rows — the key's
    load as a multiple of the mean key load, exact integers."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(int(top_k))
        .select(
            "key",
            "n_rows",
            # DECIMAL(38,0) products: 100·n_rows·n_keys passes 2^63
            # once n_rows·n_keys > ~9e16 — inside the 100 TB /
            # billions-of-keys contract — and non-ANSI Spark would
            # wrap silently while the DuckDB twin (HUGEINT) errors
            # (r7 ADVICE).  The decimal product is exact to 38 digits
            # and div truncates back to a small BIGINT.
            F.expr(
                f"CAST({E6} AS DECIMAL(38,0)) * n_rows div _total"
            ).alias("share_e6"),
            F.expr(
                "100 * CAST(n_rows AS DECIMAL(38,0)) * _nkeys div _total"
            ).alias("skew_x_e2"),
        )
    )


def oracle_key_skew_report_sql(
    table: str, key_col: str, top_k: int = TOP_KEYS
) -> str:
    return f"""
        WITH counts AS (
            SELECT {key_col} AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM {table} WHERE {key_col} IS NOT NULL GROUP BY 1
        ),
        totals AS (
            SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS nkeys
            FROM counts
        )
        SELECT key, n_rows,
               CAST(CAST({E6} AS HUGEINT) * n_rows // total
                    AS BIGINT) AS share_e6,
               CAST(100 * CAST(n_rows AS HUGEINT) * nkeys // total
                    AS BIGINT) AS skew_x_e2
        FROM counts CROSS JOIN totals
        ORDER BY n_rows DESC, key ASC
        LIMIT {int(top_k)}
    """
