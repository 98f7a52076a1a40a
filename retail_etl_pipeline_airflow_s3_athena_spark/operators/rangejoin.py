"""Range (interval-containment) join.

Spark has no native range-join optimization: ``a JOIN b ON a.ts BETWEEN
b.lo AND b.hi`` plans as BroadcastNestedLoopJoin (or worse, a cartesian
product) — O(|probe| x |intervals|) comparisons.  The standard scale
strategy is BIN BUCKETING: quantize time into fixed bins, expand each
interval to the bins it covers, tag each probe row with its single bin,
and equi-join on the bin — Spark then plans a plain shuffle/broadcast
hash join and the comparison space collapses to pairs that share a bin.
Each (probe, interval) match is found exactly once (in the probe row's
own bin), so no post-join dedup is needed.

Bin width is the throughput dial: wider bins -> fewer exploded interval
rows but more false pairs filtered by the exact predicate; narrower ->
the reverse.  Set it near the median interval length so intervals
explode to O(1) bins.

``concurrent_session_activity`` is the packaged query: gap-sessions
(operators/events.sessionize) as the interval side, the raw event
stream as the probe side, counting OTHER users' events that fall inside
each session — a classic "what else was happening" analytics join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.events import (
    SESSION_GAP_SECONDS,
    sessionize,
)

BIN_SECONDS = 3600


def range_join_binned(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = BIN_SECONDS,
    extra_pred: Column | None = None,
) -> DataFrame:
    """Inner-join probe rows to every interval containing them
    (``start <= ts <= end``, closed on both ends) via bin-bucket
    equi-join.  Column names must be disjoint across the two inputs
    (pre-alias).  ``extra_pred`` adds a residual predicate (e.g. a
    user-mismatch condition) evaluated with the containment filter."""
    p = probe.withColumn(
        "_bin",
        F.floor(F.unix_timestamp(probe_ts) / F.lit(bin_seconds)).cast("long"),
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start_col) / F.lit(bin_seconds)).cast(
                    "long"
                ),
                F.floor(F.unix_timestamp(end_col) / F.lit(bin_seconds)).cast(
                    "long"
                ),
            )
        ),
    )
    cond = (F.col(probe_ts) >= F.col(start_col)) & (
        F.col(probe_ts) <= F.col(end_col)
    )
    if extra_pred is not None:
        cond = cond & extra_pred
    return p.join(iv, "_bin").filter(cond).drop("_bin")


def concurrent_session_activity(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Per session: how many events from OTHER users fell inside it.
    (user_id, session_start, n_concurrent); sessions with zero
    concurrent activity drop (inner join)."""
    sessions = sessionize(events, gap_seconds).select(
        F.col("user_id").alias("s_user"),
        "session_start",
        "session_end",
    )
    probe = events.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    joined = range_join_binned(
        probe,
        sessions,
        probe_ts="e_ts",
        start_col="session_start",
        end_col="session_end",
        extra_pred=F.col("e_user") != F.col("s_user"),
    )
    return (
        joined.groupBy(
            F.col("s_user").alias("user_id"), "session_start"
        )
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )


# ---------------------------------------------------------------------------
# Oracle SQL twin (DuckDB) — the naive inequality join (DuckDB's IEJoin
# handles it); binning is Spark's physical strategy, not the semantics.
# ---------------------------------------------------------------------------

def oracle_concurrent_sessions_sql(
    table: str = "events", gap_seconds: int = SESSION_GAP_SECONDS
) -> str:
    return f"""
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
            FROM {table}
        ),
        g AS (
            SELECT *,
                   CASE WHEN sec - LAG(sec) OVER w > {gap_seconds}
                        THEN 1 ELSE 0 END AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM g
        ),
        sessions AS (
            SELECT user_id AS s_user,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end
            FROM s GROUP BY user_id, session_seq
        )
        SELECT ss.s_user AS user_id,
               CAST(ss.session_start AS TIMESTAMP) AS session_start,
               COUNT(*) AS n_concurrent
        FROM sessions ss
        JOIN {table} ev
          ON ev.ts >= ss.session_start
         AND ev.ts <= ss.session_end
         AND ev.user_id <> ss.s_user
        GROUP BY ss.s_user, ss.session_start
    """
