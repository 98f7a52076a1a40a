"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key.  Implemented as the
scalable union+window formulation rather than a range join:

    tag both sides -> union -> one shuffle on the key -> sort by
    (ts, side, id) -> running LAST_VALUE(right attrs IGNORE NULLS)

One shuffle + one sort total, independent of how many right rows
precede each left row — the standard formulation for billions of rows
(a per-group ``pd.merge_asof`` via applyInPandas is the fallback when
the sides can't be unioned; this version never leaves the JVM).

Right-side rows are pre-deduplicated to one per (key, ts) — max id wins
— so ties are deterministic; DuckDB's native ASOF JOIN (the oracle)
would otherwise pick an arbitrary row among equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_events(events: DataFrame) -> DataFrame:
    """Fixture-shaped as-of join: each 'purchase' event gets the most
    recent prior-or-equal 'view' event of the same user, plus the gap
    in (floored) seconds.  Purchases with no prior view keep NULLs."""
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            "view_event_id",
            F.lit(0).alias("side"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_event_id"),
        F.lit(1).alias("side"),
    )
    unioned = views.select(
        "user_id",
        F.col("view_ts").alias("ts"),
        "side",
        "view_event_id",
        F.col("view_ts"),
        F.lit(None).cast("long").alias("purchase_event_id"),
    ).unionByName(
        purchases.select(
            "user_id",
            F.col("p_ts").alias("ts"),
            "side",
            F.lit(None).cast("long").alias("view_event_id"),
            F.lit(None).cast("timestamp").alias("view_ts"),
            "purchase_event_id",
        )
    )
    # views sort before purchases at equal ts => "prior-or-equal"
    w = Window.partitionBy("user_id").orderBy("ts", "side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        unioned.withColumn(
            "last_view_id", F.last("view_event_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
        .select(
            "purchase_event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_view_id").alias("view_event_id"),
            F.col("last_view_ts").alias("view_ts"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts")
            ).alias("gap_sec"),
        )
    )


def oracle_asof_join_sql(table: str = "events") -> str:
    """DuckDB twin via native ASOF JOIN (same pre-dedup of view rows)."""
    return f"""
        WITH views AS (
            SELECT user_id, ts AS view_ts, MAX(event_id) AS view_event_id
            FROM {table} WHERE event_type = 'view'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts
            FROM {table} WHERE event_type = 'purchase'
        )
        SELECT p.purchase_event_id, p.user_id,
               CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts,
               v.view_event_id,
               CAST(v.view_ts AS TIMESTAMP) AS view_ts,
               CAST(FLOOR(epoch(p.purchase_ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(v.view_ts)) AS BIGINT) AS gap_sec
        FROM purchases p
        ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND p.purchase_ts >= v.view_ts
    """
