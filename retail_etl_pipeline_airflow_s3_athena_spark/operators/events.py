"""Event-stream operators (the ``events`` table: event_id, ts, user_id,
event_type, value, props-JSON).

The reference's only "streaming" is a daily Airflow schedule
(dags/etl_retail_pipeline.py:97) — no windows, sessions, or late-data
handling.  This module supplies the batch forms of the standard
event-analytics operators; ``streaming/`` reuses the same window
semantics under Structured Streaming.

- windowed_event_stats : tumbling-window aggregate per event_type
- sessionize           : gap-based sessionization (lag + cumulative sum)
- topk_events_per_type : per-group top-k via row_number window
- user_event_pivot     : event-type counts pivoted to columns per user
- extract_props        : JSON field extraction from the props column

Scale notes:
- The tumbling-window agg groups on (window, type): partial aggregation
  map-side, one shuffle; window count is bounded by time range, not rows.
- Sessionization shuffles once on user_id, then both window functions
  (lag, running sum) reuse the same sort — Catalyst plans a single
  Exchange+Sort for the whole chain.
- Pivot uses an explicit value list (no discovery pass) — at scale an
  unbounded pivot is a driver OOM; bounding it is part of the operator
  contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround, sql_dround

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
SESSION_GAP_SECONDS = 1800


def windowed_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window stats per event_type.  Uses F.window (the same
    operator Structured Streaming uses), emitting the window start."""
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
            dround(money_avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum-of-boundaries; second resolution
    (floored epoch) defines the gap, matching the oracle exactly."""
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    with_gap = events.select(
        "user_id", "ts", "event_id", "value", sec.alias("sec")
    ).withColumn(
        "new_session",
        F.when(
            (F.col("sec") - F.lag("sec").over(order_w)) > gap_seconds, 1
        )
        .otherwise(0)
        .cast("long"),
    )
    with_id = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            order_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max("sec") - F.min("sec")).alias("duration_sec"),
            money_sum("value").alias("session_value"),
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window (merging
    windows in the aggregate, no window-function sort) — same session
    boundaries as ``sessionize``; window end is last_event + gap by
    session_window's definition.  This is also the streaming-compatible
    form (works under a watermark)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "session_value",
        )
    )


def topk_events_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k: highest-value events per type (row_number window,
    deterministic tie-break on event_id)."""
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        events.select("event_type", "event_id", "value", "user_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def user_event_pivot(events: DataFrame) -> DataFrame:
    """Event-type counts pivoted to one column per type, per user.
    The pivot value list is explicit (EVENT_TYPES) — no discovery scan."""
    out = (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # un-pivoted users with no events of a type get 0, not NULL
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def event_value_quantiles(events: DataFrame) -> DataFrame:
    """Exact continuous quantiles per event_type (Spark ``percentile``;
    at 100 TB swap for ``percentile_approx`` — same call shape, bounded
    memory, but no longer oracle-exact)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.min("value"), 6).alias("v_min"),
        dround(F.percentile("value", 0.5), 6).alias("p50"),
        dround(F.percentile("value", 0.9), 6).alias("p90"),
        dround(F.percentile("value", 0.99), 6).alias("p99"),
        dround(F.max("value"), 6).alias("v_max"),
    )


def extract_props(events: DataFrame) -> DataFrame:
    """JSON field extraction from the props string column."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL twins (DuckDB).  These read the raw `events` view, whose ts
# is TIMESTAMP_NS in DuckDB — arithmetic matches the Spark side's
# micros-normalized NTZ timestamps at second/hour granularity.
# ---------------------------------------------------------------------------

def oracle_windowed_stats_sql(table: str = "events") -> str:
    return f"""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {sql_money_sum("value")} AS sum_value,
               {sql_dround(sql_money_avg("value"), 6)} AS avg_value
        FROM {table}
        GROUP BY 1, 2
    """


def oracle_sessionize_sql(
    table: str = "events", gap_seconds: int = SESSION_GAP_SECONDS
) -> str:
    return f"""
        WITH e AS (
            SELECT user_id, ts, event_id, value,
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
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM g
        )
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) AS TIMESTAMP) AS session_end,
               MAX(sec) - MIN(sec) AS duration_sec,
               {sql_money_sum("value")} AS session_value
        FROM s GROUP BY user_id, session_seq
    """


def oracle_session_window_sql(
    table: str = "events", gap_seconds: int = 1800
) -> str:
    """Same sessions as oracle_sessionize_sql; window_end follows
    session_window's last_event + gap convention.  Gap comparison uses
    raw timestamps (session_window's semantics), not floored seconds."""
    return f"""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w)
                             > {gap_seconds}
                        THEN 1 ELSE 0 END AS new_session
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *, SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM g
        )
        SELECT user_id,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) AS TIMESTAMP) + INTERVAL {gap_seconds} SECOND
                   AS window_end,
               COUNT(*) AS n_events,
               {sql_money_sum("value")} AS session_value
        FROM s GROUP BY user_id, session_seq
    """


def oracle_topk_events_sql(table: str = "events", k: int = 3) -> str:
    return f"""
        SELECT event_type, event_id, value, user_id, CAST(rank AS INT) AS rank
        FROM (
            SELECT event_type, event_id, value, user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS rank
            FROM {table}
        ) WHERE rank <= {k}
    """


def oracle_user_pivot_sql(table: str = "events") -> str:
    cols = ",\n               ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
        SELECT user_id,
               {cols}
        FROM {table}
        GROUP BY user_id
    """


def oracle_event_quantiles_sql(table: str = "events") -> str:
    return f"""
        SELECT event_type,
               COUNT(*) AS n,
               {sql_dround("MIN(value)", 6)} AS v_min,
               {sql_dround("quantile_cont(value, 0.5)", 6)} AS p50,
               {sql_dround("quantile_cont(value, 0.9)", 6)} AS p90,
               {sql_dround("quantile_cont(value, 0.99)", 6)} AS p99,
               {sql_dround("MAX(value)", 6)} AS v_max
        FROM {table}
        GROUP BY event_type
    """


def oracle_extract_props_sql(table: str = "events") -> str:
    return f"""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM {table}
    """


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered-funnel conversion: how many users did view -> click ->
    purchase IN THAT ORDER (each later stage strictly after the
    earliest qualifying time of the previous one).

    Plan shape: three chained per-user conditional MIN aggregates —
    each stage is a map-side-combinable groupBy on user_id joined back
    to the (user-partitioned) event stream; stage tables are
    user-cardinality-bounded.  No window sort over raw events, no UDF.

    LAZY and single-job (like every other operator here): the stage
    tables left-join into one per-user funnel row counted by a single
    aggregate, cross-joined with the 1-row distinct-user count —
    clicked/purchased are subsets of viewed by construction, so the
    left joins lose nothing.  Spark's ReuseExchange dedupes the
    repeated viewed/clicked sub-aggregates within the one job, so the
    event stream is scanned twice (distinct users + stage chain)
    instead of the previous four eager ``.count()`` actions."""
    ev = events.select("user_id", "event_type", "ts").filter(
        F.col("user_id").isNotNull()
    )
    viewed = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicked = (
        ev.filter(F.col("event_type") == "click")
        .join(viewed, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchased = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicked, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage_counts = (
        viewed.join(clicked.select("user_id", "t_click"), "user_id", "left")
        .join(purchased.select("user_id", "t_purchase"), "user_id", "left")
        .agg(
            F.count("t_view").alias("n_viewed"),
            F.count("t_click").alias("n_clicked"),
            F.count("t_purchase").alias("n_purchased"),
        )
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return n_users.crossJoin(stage_counts).select(
        "n_users", "n_viewed", "n_clicked", "n_purchased"
    )


def oracle_funnel_sql(table: str = "events") -> str:
    return f"""
        WITH ev AS (
            SELECT user_id, event_type, ts FROM {table}
            WHERE user_id IS NOT NULL
        ),
        viewed AS (
            SELECT user_id, MIN(ts) AS t_view FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ),
        clicked AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM ev e JOIN viewed v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        purchased AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM ev e JOIN clicked c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(DISTINCT user_id) FROM ev) AS n_users,
               (SELECT COUNT(*) FROM viewed)    AS n_viewed,
               (SELECT COUNT(*) FROM clicked)   AS n_clicked,
               (SELECT COUNT(*) FROM purchased) AS n_purchased
    """


def weekly_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later activity week as an offset — the classic retention
    triangle, (cohort_week, week_offset, n_users).

    Plan shape: first-seen is one user_id groupBy; the activity grid is
    a distinct over (user_id, week) — both map-side combinable; the
    join key is user_id and the output is bounded by weeks^2, not by
    events."""
    ev = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).filter(F.col("user_id").isNotNull())
    first_seen = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.to_date("cohort_week").alias("cohort_week"),
            (
                F.datediff(F.to_date("week"), F.to_date("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def oracle_weekly_retention_sql(table: str = "events") -> str:
    return f"""
        WITH ev AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM {table} WHERE user_id IS NOT NULL
        ),
        first_seen AS (
            SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
        )
        SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
               CAST(datediff('day', CAST(f.cohort_week AS DATE),
                             CAST(e.week AS DATE)) // 7 AS BIGINT)
                   AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ev e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 20


def value_histogram(
    events: DataFrame,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Fixed-bound histogram of event values per event type — one
    map-side-combinable groupBy on (event_type, bucket); output bounded
    by types x (bins + 2) (bucket 0 = below range, bins + 1 = above).
    Fixed literal bounds keep the bucketing identical across engines —
    a data-derived range would need a separate (and order-stable)
    min/max pass first.  The bucket arithmetic is written out
    explicitly (width_bucket semantics) with the SAME expression text
    as the oracle, since DuckDB has no width_bucket and two different
    formulations could floor boundary values differently."""
    v = F.col("value")
    bucket = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(bins + 1))
        .otherwise(
            (F.floor((v - F.lit(lo)) / F.lit(hi - lo) * bins) + 1).cast("int")
        )
        .cast("long")
    )
    return (
        events.filter(v.isNotNull())
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


def oracle_value_histogram_sql(
    table: str = "events",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> str:
    return f"""
        SELECT event_type,
               CAST(CASE WHEN value < {lo} THEN 0
                         WHEN value >= {hi} THEN {bins + 1}
                         ELSE FLOOR((value - {lo}) / {hi - lo} * {bins}) + 1
                    END AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {table}
        WHERE value IS NOT NULL
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order event-type transition counts: (prev_type, next_type,
    n_transitions) over each user's time-ordered event sequence — the
    Markov matrix behind funnels, next-action prediction features, and
    journey sankeys.

    Plan: one window lag over (user_id; ts, event_id — the pinned
    deterministic order every sequence operator here uses) then a
    map-side-combinable count on a |types|^2-bounded key space.  The
    only shuffle is the user_id partitioning the sequence operators
    already share."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def oracle_event_transitions_sql(table: str = "events") -> str:
    return f"""
        WITH seq AS (
            SELECT user_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type AS next_type
            FROM {table}
            WHERE user_id IS NOT NULL
        )
        SELECT prev_type, next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """
