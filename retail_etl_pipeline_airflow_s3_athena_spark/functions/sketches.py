"""Deterministic HyperLogLog distinct-count sketch.

``approx_count_distinct`` is engine-specific (Spark's HLL++ and
DuckDB's HLL hash differently — results can't be cross-checked).  This
module implements classic HLL (Flajolet et al. 2007) from first
principles with a DETERMINISTIC md5-derived hash and integer-exact
register combination, so Spark and the DuckDB oracle produce the SAME
estimate and the correctness gate can hash-compare an *approximate*
operator — the sketch itself becomes testable.

Construction (m = 2^B registers, B=8):
- h      = 60-bit md5 prefix of the key (integer, no float anywhere)
- bucket = h & (m-1)               (low B bits)
- rest   = h >> B                  (52 bits)
- rank   = index of lowest set bit of rest, 1-based, capped at RANK_CAP
           (rest == 0 -> RANK_CAP); arithmetic CASE chain — no
           engine-specific ctz/clz builtins
- register M_j = max(rank) per bucket
- SUM(2^-M_j) is computed as the INTEGER sum of 2^(RANK_CAP - M_j)
  (scaled by 2^RANK_CAP) — integer addition is order-independent, so
  Spark's partial aggregation and DuckDB's serial sum agree exactly;
  a float sum here would be accumulation-order-dependent and flip the
  value hash.
- estimate = alpha_m * m^2 * 2^RANK_CAP / scaled_sum, with the standard
  small-range linear-counting correction (E <= 2.5m and empty registers
  exist -> m * ln(m/V)).

Scale notes: the sketch is ONE hash-aggregate pass — (group, bucket)
partial max map-side (at most groups x 256 rows shuffle), then a
256-row combine per group.  This is the mergeable-sketch pattern:
registers from independent partitions/days combine by MAX, so daily
sketches roll up without rescanning (the same property HLL++ sinks rely
on).  Exact countDistinct is emitted alongside for error inspection —
drop it at 100 TB (it's the expensive column; the sketch is the cheap
one).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

B_BITS = 8
M_REGISTERS = 1 << B_BITS  # 256
RANK_CAP = 30
_ALPHA = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
# linear-counting threshold: 2.5 * m
_LC_THRESHOLD = 2.5 * M_REGISTERS


def _md5_60(s: Column) -> Column:
    """60-bit integer from the md5 hex prefix — full width, NOT reduced
    mod a prime (HLL needs uniform low bits AND uniform trailing-zero
    geometry in the high bits)."""
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def _rank_expr(rest: Column) -> Column:
    """1-based index of the lowest set bit via an arithmetic CASE chain
    (portable: no ctz builtin in either engine's shared surface)."""
    expr = F.lit(RANK_CAP)
    for i in range(RANK_CAP - 1, 0, -1):
        # bit (i-1) is the lowest set bit iff rest mod 2^i == 2^(i-1)
        expr = F.when(
            rest % F.lit(1 << i) == F.lit(1 << (i - 1)), F.lit(i)
        ).otherwise(expr)
    return expr


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(group_cols..., bucket, m_j): the per-group register table.

    Registers are the MERGEABLE form of the sketch: register tables
    from independent partitions/batches/days combine by
    ``groupBy(group, bucket).max(m_j)`` with no rescan of the raw data
    — the streaming maintenance path builds on exactly this."""
    key = F.col(key_col).cast("string")
    h = _md5_60(key)
    hashed = df.select(
        *group_cols,
        (h % F.lit(M_REGISTERS)).alias("bucket"),
        F.shiftright(h, B_BITS).alias("rest"),
    )
    return hashed.groupBy(*group_cols, "bucket").agg(
        F.max(_rank_expr(F.col("rest"))).alias("m_j")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """group_cols + est_distinct (double, 2dp) from a register table."""
    # integer-exact register sum: sum(2^(CAP - M_j)) + empty * 2^CAP
    scaled = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"CAST(shiftleft(1L, {RANK_CAP} - m_j) AS BIGINT)")
        ).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    empty = F.lit(M_REGISTERS) - F.col("n_present")
    total = F.col("present_sum") + empty * F.lit(1 << RANK_CAP).cast("long")
    e_raw = F.lit(_ALPHA * M_REGISTERS * M_REGISTERS * float(1 << RANK_CAP)) / total
    est = F.when(
        (e_raw <= F.lit(_LC_THRESHOLD)) & (empty > 0),
        F.lit(float(M_REGISTERS)) * F.log(F.lit(float(M_REGISTERS)) / empty),
    ).otherwise(e_raw)
    return scaled.select(
        *group_cols,
        F.floor(est * 100 + F.lit(0.5)).cast("double").alias("est_scaled"),
    ).withColumn("est_distinct", F.col("est_scaled") / 100).drop("est_scaled")


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL distinct estimate next to the exact count.

    Output: group_cols + est_distinct (double, 2dp) + exact_distinct."""
    sketched = hll_estimate(hll_registers(df, key_col, group_cols), group_cols)
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    return sketched.join(exact, group_cols)


# ---------------------------------------------------------------------------
# Oracle SQL twin (DuckDB) — identical arithmetic
# ---------------------------------------------------------------------------

def _sql_rank(rest: str) -> str:
    branches = "\n                ".join(
        f"WHEN {rest} % {1 << i} = {1 << (i - 1)} THEN {i}"
        for i in range(1, RANK_CAP)
    )
    return f"(CASE\n                {branches}\n                ELSE {RANK_CAP} END)"


def oracle_hll_distinct_sql(
    table: str, key_col: str, group_cols: list[str]
) -> str:
    groups = ", ".join(group_cols)
    h = (
        f"CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT)"
    )
    return f"""
        WITH hashed AS (
            SELECT {groups},
                   {h} % {M_REGISTERS} AS bucket,
                   {h} >> {B_BITS} AS rest
            FROM {table}
        ),
        registers AS (
            SELECT {groups}, bucket, MAX({_sql_rank("rest")}) AS m_j
            FROM hashed GROUP BY {groups}, bucket
        ),
        scaled AS (
            SELECT {groups},
                   CAST(SUM(CAST(1 AS BIGINT) << ({RANK_CAP} - m_j))
                        AS BIGINT) AS present_sum,
                   COUNT(*) AS n_present
            FROM registers GROUP BY {groups}
        ),
        est AS (
            SELECT {groups},
                   present_sum + ({M_REGISTERS} - n_present)
                       * CAST({1 << RANK_CAP} AS BIGINT) AS total,
                   {M_REGISTERS} - n_present AS empty
            FROM scaled
        ),
        raw AS (
            -- CAST AS DOUBLE: bare float literals parse as DECIMAL in
            -- DuckDB (Spark parses them as DOUBLE) — the arithmetic
            -- must run in binary doubles on both engines
            SELECT {groups}, empty,
                   CAST({_ALPHA!r} AS DOUBLE) * {M_REGISTERS} * {M_REGISTERS}
                       * CAST({float(1 << RANK_CAP)!r} AS DOUBLE) / total
                       AS e_raw
            FROM est
        ),
        corrected AS (
            SELECT {groups},
                   CASE WHEN e_raw <= CAST({_LC_THRESHOLD!r} AS DOUBLE)
                             AND empty > 0
                        THEN CAST({float(M_REGISTERS)!r} AS DOUBLE)
                             * ln(CAST({float(M_REGISTERS)!r} AS DOUBLE)
                                  / empty)
                        ELSE e_raw END AS est
            FROM raw
        )
        SELECT c.{', c.'.join(group_cols)},
               FLOOR(c.est * 100 + 0.5) / 100 AS est_distinct,
               x.exact_distinct
        FROM corrected c
        JOIN (
            SELECT {groups},
                   CAST(COUNT(DISTINCT {key_col}) AS BIGINT)
                       AS exact_distinct
            FROM {table} GROUP BY {groups}
        ) x USING ({groups})
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimation from a fixed-size mergeable summary.
#
# Same design goals as the HLL above: deterministic md5-derived hashes
# with literal coefficients and integer-only arithmetic, so the DuckDB
# oracle reproduces the sketch cell-for-cell and the gate can
# hash-compare an approximate operator.
#
# Scale notes: the sketch build is one map-side-combinable aggregate —
# each token row expands to CMS_D (row, cell) pairs and partial
# aggregation collapses them to at most CMS_D * CMS_W = 4096 cells
# BEFORE the shuffle, so summarizing a 100 TB token stream shuffles a
# constant ~4096 rows per partition.  Cells from independent
# partitions/days merge by SUM (the CMS merge law), giving the same
# rollup-without-rescan property as the HLL registers.  The estimate
# (min over rows) never undercounts; overcount is bounded by
# eps = e/CMS_W of the stream length per the standard analysis.
# ---------------------------------------------------------------------------

CMS_D = 4        # hash rows
CMS_W = 1024     # cells per row
_CMS_MOD = 2147483647  # 2^31 - 1, same prime as the dedup pipeline
CMS_A = [((2 * j + 1) * 2654435761) % _CMS_MOD for j in range(CMS_D)]
CMS_B = [((j + 1) * 40503 + 1299709) % _CMS_MOD for j in range(CMS_D)]
CMS_TOP_K = 20


def _cms_cell(h: Column, j: int) -> Column:
    """Row-j cell index for a (already mod-prime) token hash."""
    return ((h * CMS_A[j] + CMS_B[j]) % _CMS_MOD) % CMS_W


def cms_hashed_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, h): exploded token stream with its mod-prime md5 hash —
    the shared front end of the sketch build and the probe."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import tokens

    tok = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    )
    h = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("token"), "UTF-8")), 1, 15),
            16,
            10,
        ).cast("long")
        % _CMS_MOD
    )
    return tok.select("token", h.alias("h"))


def cms_sketch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(j, c, cnt): the count-min table for one corpus (or one
    micro-batch — counts are SUM-mergeable, so the sketch of a union
    is the cell-wise sum of the parts' sketches).  At most
    CMS_D x CMS_W = 4096 rows regardless of input size."""
    hashed = cms_hashed_tokens(docs, text_col)
    cells = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_cell(F.col("h"), j).alias("c")
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("rc")
    ).select("rc.j", "rc.c")
    return cells.groupBy("j", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_probe_topk(
    docs: DataFrame,
    sketch: DataFrame,
    text_col: str = "text",
    top_k: int = CMS_TOP_K,
) -> DataFrame:
    """Probe a (j, c, cnt) sketch with the corpus's exact top-``top_k``
    tokens: (token, true_cnt, cms_est)."""
    hashed = cms_hashed_tokens(docs, text_col)
    true_counts = hashed.groupBy("token").agg(
        F.count(F.lit(1)).alias("true_cnt"),
        F.first("h").alias("h"),
    )
    # sort+limit compiles to TakeOrderedAndProject: per-partition
    # partial top-k then a k-row merge — never a single-partition
    # window over the full vocabulary
    top = true_counts.orderBy(
        F.col("true_cnt").desc(), F.col("token").asc()
    ).limit(top_k)
    probe = top.select(
        "token",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_cell(F.col("h"), j).alias("c")
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select("token", "true_cnt", "rc.j", "rc.c")
    # the sketch is <= 4096 rows by construction: broadcast it
    return (
        probe.join(F.broadcast(sketch), ["j", "c"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters(
    docs: DataFrame, text_col: str = "text", top_k: int = CMS_TOP_K
) -> DataFrame:
    """(token, true_cnt, cms_est): the corpus's top_k tokens by exact
    frequency (count desc, token asc — pinned tie-break) with their
    count-min estimate alongside; cms_est >= true_cnt always.

    The exact count exists for error inspection (same convention as
    hll_distinct's exact_distinct); at 100 TB you keep only the sketch
    and probe it for whatever keys you care about.
    """
    return cms_probe_topk(
        docs, cms_sketch(docs, text_col), text_col, top_k
    )


def oracle_cms_heavy_hitters_sql(
    table: str = "documents", t: str = "text", top_k: int = CMS_TOP_K
) -> str:
    toks = f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"
    h = (
        f"(CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CMS_MOD})"
    )
    cell_rows = "\n            UNION ALL\n".join(
        f"            SELECT {j} AS j, "
        f"((h * {CMS_A[j]} + {CMS_B[j]}) % {_CMS_MOD}) % {CMS_W} AS c "
        f"FROM hashed"
        for j in range(CMS_D)
    )
    probe_rows = "\n            UNION ALL\n".join(
        f"            SELECT token, true_cnt, {j} AS j, "
        f"((h * {CMS_A[j]} + {CMS_B[j]}) % {_CMS_MOD}) % {CMS_W} AS c "
        f"FROM top"
        for j in range(CMS_D)
    )
    return f"""
        WITH tok AS (
            SELECT unnest({toks}) AS token FROM {table}
        ),
        hashed AS (
            SELECT token, {h} AS h FROM tok
        ),
        cells AS (
        {cell_rows}
        ),
        sketch AS (
            SELECT j, c, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM cells GROUP BY j, c
        ),
        true_counts AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS true_cnt,
                   ANY_VALUE(h) AS h
            FROM hashed GROUP BY token
        ),
        top AS (
            SELECT token, true_cnt, h FROM true_counts
            ORDER BY true_cnt DESC, token ASC LIMIT {top_k}
        ),
        probe AS (
        {probe_rows}
        )
        SELECT p.token, p.true_cnt, MIN(s.cnt) AS cms_est
        FROM probe p JOIN sketch s ON p.j = s.j AND p.c = s.c
        GROUP BY p.token, p.true_cnt
    """


def rolling_distinct_users(
    events: DataFrame, days: int = 7
) -> DataFrame:
    """(event_date, est_distinct, exact_distinct): trailing-``days``
    distinct users per day, estimated from DAILY HLL REGISTERS
    max-merged across the window.

    Why it matters at 100 TB: exact rolling distinct counts are
    quadratic-ish (every day re-scans ``days`` days of raw events, and
    COUNT(DISTINCT) OVER a range frame isn't partial-aggregatable).
    The register form scans the events ONCE, reduces to |days| x 256
    rows, and every window combine is a MAX over that tiny table — the
    mergeable-sketch law again, this time across time windows.  The
    exact column rides along for error inspection (one bounded
    day-range join); drop it at scale.
    """
    ev = events.select(
        F.to_date("ts").alias("event_date"), F.col("user_id")
    )
    day_regs = hll_registers(ev, "user_id", ["event_date"])
    days_tab = ev.select("event_date").distinct()
    d = days_tab.alias("d")
    r = day_regs.alias("r")
    in_window = (F.col("r.event_date") <= F.col("d.event_date")) & (
        F.col("r.event_date") >= F.date_sub(F.col("d.event_date"), days - 1)
    )
    merged = (
        d.join(r, in_window)
        .groupBy(F.col("d.event_date").alias("event_date"), F.col("r.bucket"))
        .agg(F.max("r.m_j").alias("m_j"))
    )
    est = hll_estimate(merged, ["event_date"])
    e2 = ev.alias("e")
    exact = (
        d.join(
            e2,
            (F.col("e.event_date") <= F.col("d.event_date"))
            & (
                F.col("e.event_date")
                >= F.date_sub(F.col("d.event_date"), days - 1)
            ),
        )
        .groupBy(F.col("d.event_date").alias("event_date"))
        .agg(F.count_distinct("e.user_id").alias("exact_distinct"))
    )
    return est.join(exact, "event_date")


def oracle_rolling_distinct_users_sql(
    table: str = "events", days: int = 7
) -> str:
    h = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS event_date, user_id FROM {table}
        ),
        hashed AS (
            SELECT event_date,
                   {h} % {M_REGISTERS} AS bucket,
                   {h} >> {B_BITS} AS rest
            FROM ev
        ),
        day_regs AS (
            SELECT event_date, bucket, MAX({_sql_rank("rest")}) AS m_j
            FROM hashed GROUP BY event_date, bucket
        ),
        days_tab AS (SELECT DISTINCT event_date FROM ev),
        merged AS (
            SELECT d.event_date AS event_date, r.bucket,
                   MAX(r.m_j) AS m_j
            FROM days_tab d JOIN day_regs r
              ON r.event_date <= d.event_date
             AND r.event_date >= d.event_date - {days - 1}
            GROUP BY d.event_date, r.bucket
        ),
        scaled AS (
            SELECT event_date,
                   CAST(SUM(CAST(1 AS BIGINT) << ({RANK_CAP} - m_j))
                        AS BIGINT) AS present_sum,
                   COUNT(*) AS n_present
            FROM merged GROUP BY event_date
        ),
        est AS (
            SELECT event_date,
                   present_sum + ({M_REGISTERS} - n_present)
                       * CAST({1 << RANK_CAP} AS BIGINT) AS total,
                   {M_REGISTERS} - n_present AS empty
            FROM scaled
        ),
        raw AS (
            SELECT event_date, empty,
                   CAST({_ALPHA!r} AS DOUBLE) * {M_REGISTERS} * {M_REGISTERS}
                       * CAST({float(1 << RANK_CAP)!r} AS DOUBLE) / total
                       AS e_raw
            FROM est
        ),
        corrected AS (
            SELECT event_date,
                   CASE WHEN e_raw <= CAST({_LC_THRESHOLD!r} AS DOUBLE)
                             AND empty > 0
                        THEN CAST({float(M_REGISTERS)!r} AS DOUBLE)
                             * ln(CAST({float(M_REGISTERS)!r} AS DOUBLE)
                                  / empty)
                        ELSE e_raw END AS est
            FROM raw
        ),
        exact AS (
            SELECT d.event_date AS event_date,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                       AS exact_distinct
            FROM days_tab d JOIN ev e
              ON e.event_date <= d.event_date
             AND e.event_date >= d.event_date - {days - 1}
            GROUP BY d.event_date
        )
        SELECT c.event_date,
               FLOOR(c.est * 100 + 0.5) / 100 AS est_distinct,
               x.exact_distinct
        FROM corrected c JOIN exact x USING (event_date)
    """
