"""Slowly-changing-dimension (SCD type 2) merge — batch MERGE/upsert
semantics as a pure DataFrame program.

The reference overwrites its dimension extracts every DAG run
(scripts/extract.py + load.py re-land customers/products wholesale);
a warehouse that wants history needs the MERGE pattern instead: close
the old version of a changed row, insert the new version, keep
everything else.  Spark has no table-format MERGE without Delta/
Iceberg, but the SCD2 state transition is a deterministic relational
expression — computed here with joins and unions, so it runs on plain
parquet and is oracle-checkable.

Given a current dimension (one row per key version, ``is_current``
marking the live one) and an updates snapshot at ``effective_date``:

- changed keys  : live row differs from the update on tracked cols ->
                  live row closes (effective_to = date, is_current
                  false) + new live row inserted
- new keys      : insert as live row
- unchanged/old : pass through untouched

Plan shape / scale notes:
- One join of updates against live rows (AQE picks broadcast when the
  update batch is small — the common daily-delta case), two anti-join
  passes for the untouched remainder, one union. No window, no global
  sort; everything partitions on the merge key.
- History rows (is_current = false) pass through WITHOUT entering any
  join: the dimension's full history can be arbitrarily large while
  the merge only touches live rows x update batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply one SCD2 merge step.

    ``current`` columns: key, *tracked, effective_from, effective_to,
    is_current.  ``updates`` columns: key, *tracked.  Returns the new
    dimension state with the same schema.

    The LIVE slice and the update⋈live join are PERSISTED: live feeds
    three consumers (the join, the close pass, the untouched anti-join)
    and the join feeds two (fresh rows, changed keys) — without the
    persists the current dimension is re-scanned up to 8 times.  Both
    persists are bounded by the live dimension / update batch (the
    history slice — the unbounded part — is never persisted and never
    joined).  Cache ownership transfers to the caller
    (``functions.caching.release_cached``).
    """
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        attach_cached_deps,
    )

    live = current.filter("is_current").persist()
    history = current.filter("NOT is_current")
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(f"u.{c}").eqNullSafe(F.col(f"l.{c}"))

    joined = updates.alias("u").join(
        live.alias("l"), F.col(f"u.{key}") == F.col(f"l.{key}"), "left"
    ).persist()
    # new keys (no live row) or changed keys -> fresh live version
    fresh = joined.filter(F.col(f"l.{key}").isNull() | diff).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{c}").alias(c) for c in tracked],
        F.lit(effective_date).cast("date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    changed_keys = joined.filter(F.col(f"l.{key}").isNotNull() & diff).select(
        F.col(f"u.{key}").alias(key)
    )
    closed = live.join(changed_keys, key).select(
        key,
        *tracked,
        "effective_from",
        F.lit(effective_date).cast("date").alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    untouched = live.join(changed_keys, key, "left_anti").select(
        key, *tracked, "effective_from", "effective_to", "is_current"
    )
    out = (
        history.select(key, *tracked, "effective_from", "effective_to", "is_current")
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(fresh)
    )
    return attach_cached_deps(out, live, joined)


def oracle_scd2_sql(
    current_cte: str,
    updates_cte: str,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> str:
    """DuckDB twin: the same state transition over two CTE bodies."""
    tcols = ", ".join(tracked)
    diff = " OR ".join(
        f"(u.{c} IS DISTINCT FROM l.{c})" for c in tracked
    )
    u_tcols = ", ".join(f"u.{c}" for c in tracked)
    return f"""
        WITH current_dim AS ({current_cte}),
        updates AS ({updates_cte}),
        live AS (SELECT * FROM current_dim WHERE is_current),
        history AS (SELECT * FROM current_dim WHERE NOT is_current),
        joined AS (
            SELECT u.{key} AS u_key, {u_tcols},
                   l.{key} AS l_key, ({diff}) AS changed
            FROM updates u LEFT JOIN live l ON u.{key} = l.{key}
        ),
        fresh AS (
            SELECT u_key AS {key}, {tcols},
                   DATE '{effective_date}' AS effective_from,
                   CAST(NULL AS DATE) AS effective_to,
                   TRUE AS is_current
            FROM joined WHERE l_key IS NULL OR changed
        ),
        changed_keys AS (
            SELECT u_key AS {key} FROM joined WHERE l_key IS NOT NULL AND changed
        ),
        closed AS (
            SELECT l.{key}, {", ".join(f"l.{c}" for c in tracked)},
                   l.effective_from,
                   DATE '{effective_date}' AS effective_to,
                   FALSE AS is_current
            FROM live l JOIN changed_keys c ON l.{key} = c.{key}
        ),
        untouched AS (
            SELECT l.* FROM live l ANTI JOIN changed_keys c ON l.{key} = c.{key}
        )
        SELECT {key}, {tcols}, effective_from, effective_to, is_current FROM history
        UNION ALL SELECT * FROM untouched
        UNION ALL SELECT * FROM closed
        UNION ALL SELECT * FROM fresh
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compared: list[str],
) -> DataFrame:
    """Row-level table diff between two snapshots of the same entity:
    (key, status) for every key present in either side, with status in
    {added, removed, changed, unchanged} — the validation primitive the
    reference's count-based quality checks (scripts/data_quality.py:
    18-24 row counts, :22 duplicate flags) cannot express.

    Null-safe comparison on the ``compared`` columns (NULL == NULL is
    a match, NULL vs value is a change — eqNullSafe semantics, mirrored
    with IS NOT DISTINCT FROM in the oracle).

    Plan shape: one full-outer join on the key — both sides shuffle
    once on the key (or AQE broadcasts the smaller snapshot); status
    derivation is a pure projection.  Output is key-cardinality-
    bounded."""
    o = old.select(key, *compared).alias("o")
    n = new.select(key, *compared).alias("n")
    same = None
    for c in compared:
        t = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = t if same is None else same & t
    status = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
        .select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            status.alias("status"),
        )
    )


def oracle_snapshot_diff_sql(
    old_cte: str,
    new_cte: str,
    key: str,
    compared: list[str],
) -> str:
    """DuckDB twin: FULL OUTER JOIN with IS NOT DISTINCT FROM compare."""
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compared
    )
    return f"""
        WITH old_snap AS ({old_cte}),
        new_snap AS ({new_cte})
        SELECT COALESCE(o.{key}, n.{key}) AS {key},
               CASE WHEN o.{key} IS NULL THEN 'added'
                    WHEN n.{key} IS NULL THEN 'removed'
                    WHEN {same} THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.{key} = n.{key}
    """
