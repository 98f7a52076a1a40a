"""Distribution-drift diagnostics for corpus and event telemetry.

Three data-QA operators a production training-data pipeline runs on
every ingest cycle (none exist in the reference, which has no
statistical QA surface — its data_quality.py stops at null/dup/row
counts):

- :func:`length_drift_chisq` — Pearson chi-square of each source's
  document-length distribution against the corpus-wide distribution.
  The standard "did this source's crawl change shape?" alarm: a
  boilerplate flood or truncation bug shifts the length histogram long
  before eyeballing samples would catch it.
- :func:`source_token_kl` — per-source KL divergence KL(P_s || Q)
  between the source's unigram token distribution and the corpus
  distribution.  Complements the per-source entropy diagnostic
  (operators/mixing.py::source_entropy): entropy flags a degenerate
  source in isolation; KL flags a source that is *unlike the rest of
  the mix* (wrong language, spam cluster, template farm).
- :func:`snapshot_value_psi` — Population Stability Index of the
  event-value distribution before vs after a cutoff timestamp, per
  event type.  The standard model-monitoring drift score (PSI < 0.1
  stable, > 0.25 action), here over the engine's events table.

All three are deterministic-integer end to end, following the
functions/detmath.py discipline: counts are exact, expected counts and
fractions are e6 fixed point via truncating integer division, and
every logarithm is the shared fixed-point L() table join — so the
DuckDB oracle twins hash-match bit-for-bit on any platform.

Scale shape (the 100 TB contract):

- Each operator makes exactly ONE pass over the big table (a
  map-side-combinable groupBy onto a bounded key space:
  |sources| x ~50 msb bins, |sources| x |vocab|, |types| x 22
  buckets); all drift arithmetic then runs on that bounded rollup.
- The only non-equi/cross joins are 1-row scalar or tiny-dimension
  broadcasts (grand totals, the bin list, the 4096-row log2 mantissa
  table) — bounded by construction, never by data.
- Accumulators that can exceed 2^63 at 100 TB counts use
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), the same discipline as
  mixing.py::source_entropy; per-term magnitudes are bounded in each
  docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
)
from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
    attach_det_log2_e20,
    log2_table_df,
    sql_det_log2_joins,
    sql_log2_table_cte,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    token_count,
    tokens,
)

E6 = 10**6

# PSI binning: the shared fixed-literal event-value histogram bounds
# (operators/events.py::value_histogram) — data-derived bounds would
# need a separate order-stable min/max pass and would re-bin history
# whenever the range moves.
PSI_LO, PSI_HI, PSI_BINS = 0.0, 500.0, 20
PSI_CUTOFF = "2024-01-16 00:00:00"


def _msb_bin(col):
    """Power-of-two length bin: msb(n + 1) via binary-repr length —
    pure integer formatting, identical in Spark (conv) and DuckDB
    (bin).  ~50 bins cover any 64-bit count."""
    return (F.length(F.conv(col + F.lit(1), 10, 2)) - 1).cast("long")


def length_bin_counts(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The chi-square observation rollup (source, bin, o): document
    counts per (source, msb token-count bin).  Counts are ADDITIVE,
    so this rollup is also the streaming maintenance unit — per-batch
    rollups SUM-merge to exactly this table
    (streaming/incremental.py::chisq_count_stream)."""
    return (
        docs.select(
            F.col(source_col).alias("source"),
            _msb_bin(token_count(F.col(text_col))).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("o"))
    )


def chisq_from_counts(obs: DataFrame) -> DataFrame:
    """Chi-square scoring from a (source, bin, o) rollup — shared
    verbatim by the batch operator and the streaming read-time merge.
    Persists the rollup (it feeds the totals AND the grid; ownership
    transfers via the functions/caching.py contract)."""
    obs = obs.persist()
    srcs = obs.groupBy("source").agg(F.sum("o").alias("n_docs"))
    bins = obs.groupBy("bin").agg(F.sum("o").alias("t_bin"))
    tot = obs.agg(F.sum("o").alias("n_total"))
    grid = (
        srcs.crossJoin(F.broadcast(bins))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["source", "bin"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    terms = grid.select(
        "source",
        "n_docs",
        F.expr(
            f"GREATEST(CAST(n_docs AS DECIMAL(38,0)) * t_bin * {E6}"
            " div n_total, 1)"
        ).alias("e_e6"),
        F.expr(f"o * CAST({E6} AS BIGINT)").alias("o_e6"),
    ).select(
        "source",
        "n_docs",
        F.expr(
            "CAST(o_e6 - e_e6 AS DECIMAL(38,0)) * (o_e6 - e_e6) div e_e6"
        ).alias("term_e6"),
    )
    out = (
        terms.groupBy("source", "n_docs")
        .agg(
            (F.count(F.lit(1)) - F.lit(1)).alias("dof"),
            F.sum("term_e6").cast("long").alias("chi2_e6"),
        )
        .select("source", "n_docs", "dof", "chi2_e6")
        .orderBy("source")
    )
    return attach_cached_deps(out, obs)


def length_drift_chisq(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, dof, chi2_e6): Pearson chi-square of the
    source's token-count distribution vs the corpus, binned by
    msb(token_count + 1), in e6 fixed point.

    Exact-integer formulation per (source, bin) cell::

        e_e6    = n_docs * t_bin * 1e6 div n_total   -- expected, e6
        term_e6 = (o * 1e6 - e_e6)^2 div max(e_e6, 1)
        chi2_e6 = sum(term_e6) over the source's full bin grid

    ``max(e_e6, 1)`` guards the degenerate sub-1e-6 expected count
    (tiny source x rare bin at extreme scale) — deterministic in both
    engines.  Magnitudes at 1e12 docs: n_docs * t_bin * 1e6 <= 1e30
    and diff_e6^2 <= 1e36, both inside DECIMAL(38,0); chi2_e6 <=
    n_total * 1e6 <= 1e18 fits BIGINT.

    Plan: one corpus pass (groupBy (source, bin), map-side combine)
    onto a <= |sources| x ~50 row table that is persisted and feeds
    the totals + grid (ownership transfers to the caller via the
    functions/caching.py contract); everything downstream is
    tiny-table broadcast arithmetic."""
    return chisq_from_counts(length_bin_counts(docs, text_col, source_col))


def oracle_length_drift_sql(table: str = "documents", t: str = "text") -> str:
    toks = f"list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')"
    return f"""
        WITH binned AS (
            SELECT source,
                   (length(bin(CAST(len({toks}) + 1 AS BIGINT))) - 1)
                       AS bin
            FROM {table}
        ),
        obs AS (
            SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS o
            FROM binned GROUP BY 1, 2
        ),
        srcs AS (
            SELECT source, CAST(SUM(o) AS BIGINT) AS n_docs
            FROM obs GROUP BY 1
        ),
        binsum AS (
            SELECT bin, CAST(SUM(o) AS BIGINT) AS t_bin FROM obs GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM obs),
        grid AS (
            SELECT s.source, s.n_docs,
                   GREATEST((CAST(s.n_docs AS HUGEINT) * b.t_bin * {E6})
                            // t.n_total, 1) AS e_e6,
                   CAST(COALESCE(o.o, 0) AS HUGEINT) * {E6} AS o_e6
            FROM srcs s
            CROSS JOIN binsum b
            CROSS JOIN tot t
            LEFT JOIN obs o ON o.source = s.source AND o.bin = b.bin
        )
        SELECT source, n_docs,
               CAST(COUNT(*) - 1 AS BIGINT) AS dof,
               CAST(SUM(((o_e6 - e_e6) * (o_e6 - e_e6)) // e_e6)
                    AS BIGINT) AS chi2_e6
        FROM grid
        GROUP BY 1, 2
        ORDER BY source
    """


def source_token_kl(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, kl_e20): KL(P_source || Q_corpus) over
    lowercased whitespace unigrams, in 2^20 fixed point via the
    deterministic L() log2.

    Identity (tokens absent from the source contribute 0, and the
    corpus distribution dominates every source, so no smoothing is
    needed)::

        KL * n_s = sum_t c_st * (L(c_st) + L(N) - L(C_t) - L(n_s))
        kl_e20   = GREATEST(sum, 0) div n_s

    The GREATEST clamp absorbs the fixed-point truncation noise that
    can push a near-identical source's sum a few ulps below zero —
    KL itself is >= 0.  Magnitudes at 100 TB (N ~ 1e14 < 2^50 so L()
    stays in range): |per-term| <= c * 4 * 51 * 2^20 ~ 2e22 —
    DECIMAL(38,0) accumulation, same as source_entropy's c*L(c) sum.

    Plan: one corpus pass (groupBy (source, tok), map-side combine)
    persisted and reused for the token/source/grand totals; one
    |vocab|-keyed shuffle join of the rollup against the token totals;
    the per-source and grand totals come back as broadcasts.  Cache
    ownership transfers to the caller (functions/caching.py)."""
    return kl_from_counts(
        source_token_counts(docs, text_col, source_col)
    )


def source_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The KL observation rollup (source, tok, c): lowercased unigram
    counts per source.  Counts are ADDITIVE, so per-batch rollups
    SUM-merge to exactly this table
    (streaming/incremental.py::kl_count_stream)."""
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def kl_from_counts(obs: DataFrame) -> DataFrame:
    """KL scoring from a (source, tok, c) rollup — shared verbatim by
    the batch operator and the streaming read-time merge.  Persists
    the rollup (it feeds four consumers; ownership transfers via the
    functions/caching.py contract)."""
    spark = obs.sparkSession
    logt = log2_table_df(spark)
    counts = obs.persist()
    tok_tot = counts.groupBy("tok").agg(F.sum("c").alias("ct"))
    src_tot = attach_det_log2_e20(
        counts.groupBy("source").agg(F.sum("c").alias("n_s")),
        "n_s", "l_ns", logt,
    )
    grand = attach_det_log2_e20(
        counts.agg(F.sum("c").alias("n_tot")), "n_tot", "l_nt", logt
    )
    j = counts.join(tok_tot, "tok")
    j = attach_det_log2_e20(j, "c", "l_c", logt)
    j = attach_det_log2_e20(j, "ct", "l_ct", logt)
    j = j.join(F.broadcast(src_tot), "source").crossJoin(F.broadcast(grand))
    per_source = j.groupBy("source", "n_s").agg(
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * (F.col("l_c") + F.col("l_nt") - F.col("l_ct") - F.col("l_ns"))
        ).alias("s_term")
    )
    out = per_source.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.expr(
            "CAST(GREATEST(s_term, CAST(0 AS DECIMAL(38,0)))"
            " div n_s AS BIGINT)"
        ).alias("kl_e20"),
    ).orderBy("source")
    return attach_cached_deps(out, counts)


def oracle_source_token_kl_sql(
    table: str = "documents", t: str = "text"
) -> str:
    toks = (
        f"list_filter(string_split_regex(LOWER({t}), '\\s+'), x -> x <> '')"
    )
    frm_c, l_c = sql_det_log2_joins("c.c", "kc")
    frm_ct, l_ct = sql_det_log2_joins("tt.ct", "kt")
    frm_ns, l_ns = sql_det_log2_joins("n_s", "ks")
    frm_nt, l_nt = sql_det_log2_joins("n_tot", "kn")
    return f"""
        WITH {sql_log2_table_cte()},
        flat AS (
            SELECT source, unnest({toks}) AS tok FROM {table}
        ),
        counts AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM flat GROUP BY 1, 2
        ),
        tok_tot AS (
            SELECT tok, CAST(SUM(c) AS BIGINT) AS ct
            FROM counts GROUP BY 1
        ),
        src_tot AS (
            SELECT source, n_s, {l_ns} AS l_ns
            FROM (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
                  FROM counts GROUP BY 1) {frm_ns}
        ),
        grand AS (
            SELECT {l_nt} AS l_nt
            FROM (SELECT CAST(SUM(c) AS BIGINT) AS n_tot
                  FROM counts) {frm_nt}
        ),
        terms AS (
            SELECT c.source,
                   CAST(c.c AS HUGEINT) * ({l_c} + g.l_nt - {l_ct} - s.l_ns)
                       AS term
            FROM counts c
            JOIN tok_tot tt USING (tok)
            JOIN src_tot s USING (source)
            CROSS JOIN grand g
            {frm_c} {frm_ct}
        ),
        per_source AS (
            SELECT source, SUM(term) AS s_term FROM terms GROUP BY 1
        )
        SELECT s.source, s.n_s AS n_tokens,
               CAST(GREATEST(p.s_term, 0) // s.n_s AS BIGINT) AS kl_e20
        FROM per_source p JOIN src_tot s USING (source)
        ORDER BY source
    """


def psi_period_counts(
    events: DataFrame,
    cutoff: str = PSI_CUTOFF,
    lo: float = PSI_LO,
    hi: float = PSI_HI,
    bins: int = PSI_BINS,
) -> DataFrame:
    """The PSI observation rollup (event_type, bucket, o1, o2):
    pre/post-cutoff counts per value bucket.  Counts are ADDITIVE, so
    this rollup is also the streaming maintenance unit — per-batch
    rollups SUM-merge to exactly this table
    (streaming/incremental.py::psi_count_stream)."""
    v = F.col("value")
    bucket = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(bins + 1))
        .otherwise(
            (F.floor((v - F.lit(lo)) / F.lit(hi - lo) * bins) + 1).cast("int")
        )
        .cast("long")
    )
    pre = (F.col("ts") < F.lit(cutoff).cast("timestamp")).cast("long")
    return (
        events.filter(v.isNotNull())
        .groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(
            F.sum(pre).alias("o1"),
            F.sum(F.lit(1) - pre).alias("o2"),
        )
    )


def psi_from_counts(
    obs: DataFrame,
    types: DataFrame,
    bins: int = PSI_BINS,
) -> DataFrame:
    """PSI scoring from a (event_type, bucket, o1, o2) rollup and the
    1-column type universe ``types`` — shared verbatim by the batch
    operator and the streaming read-time merge, which is what makes
    stream end-state == batch bit-exact."""
    spark = obs.sparkSession
    logt = log2_table_df(spark)
    grid = (
        types.distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(bins + 1).cast("long"))
            ).alias("bucket"),
        )
        .join(obs, ["event_type", "bucket"], "left")
        .withColumn("a1", F.coalesce(F.col("o1"), F.lit(0)) + F.lit(1))
        .withColumn("a2", F.coalesce(F.col("o2"), F.lit(0)) + F.lit(1))
    )
    tot = grid.groupBy("event_type").agg(
        F.sum(F.coalesce(F.col("o1"), F.lit(0))).alias("n_pre"),
        F.sum(F.coalesce(F.col("o2"), F.lit(0))).alias("n_post"),
        F.sum("a1").alias("m1"),
        F.sum("a2").alias("m2"),
    )
    tot = attach_det_log2_e20(tot, "m1", "l_m1", logt)
    tot = attach_det_log2_e20(tot, "m2", "l_m2", logt)
    g = grid.join(F.broadcast(tot), "event_type")
    g = attach_det_log2_e20(g, "a1", "l_a1", logt)
    g = attach_det_log2_e20(g, "a2", "l_a2", logt)
    per_type = g.groupBy("event_type", "n_pre", "n_post").agg(
        F.sum(
            (
                F.expr(f"a1 * CAST({E6} AS BIGINT) div m1")
                - F.expr(f"a2 * CAST({E6} AS BIGINT) div m2")
            ).cast("decimal(38,0)")
            * (F.col("l_a1") + F.col("l_m2") - F.col("l_a2") - F.col("l_m1"))
        ).alias("s_term")
    )
    return per_type.select(
        "event_type",
        "n_pre",
        "n_post",
        F.expr(
            "CAST(GREATEST(s_term, CAST(0 AS DECIMAL(38,0)))"
            f" div {E6} AS BIGINT)"
        ).alias("psi_e20"),
    ).orderBy("event_type")


def snapshot_value_psi(
    events: DataFrame,
    cutoff: str = PSI_CUTOFF,
    lo: float = PSI_LO,
    hi: float = PSI_HI,
    bins: int = PSI_BINS,
) -> DataFrame:
    """(event_type, n_pre, n_post, psi_e20): Population Stability
    Index of the event-value distribution before vs after ``cutoff``,
    per event type, over the shared fixed-literal value buckets
    (operators/events.py::value_histogram semantics, including the
    below/above-range buckets 0 and bins+1).

    Add-1 smoothing over the FULL (type x bucket) grid keeps every
    log argument positive (the standard PSI convention for empty
    bins); fractions are e6 fixed point and log ratios expand
    linearly so every L() input is a raw count::

        f1_e6 = a1 * 1e6 div m1          a = o + 1, m = sum(a)
        d_e20 = L(a1) + L(m2) - L(a2) - L(m1)
        psi_e20 = GREATEST(sum(f1_e6 - f2_e6) * d_e20, 0) div 1e6

    Per-term |f_diff * d| <= 1e6 * 204 * 2^20 ~ 2e14 per bucket —
    BIGINT-safe, summed in DECIMAL(38,0) anyway for uniformity.

    Plan: one events pass (conditional-count groupBy onto
    |types| x 22 cells), then pure broadcast arithmetic on the grid.
    No persist needed — the rollup feeds a single linear pipeline."""
    return psi_from_counts(
        psi_period_counts(events, cutoff, lo, hi, bins),
        events.select("event_type"),
        bins,
    )


def oracle_snapshot_psi_sql(
    table: str = "events",
    cutoff: str = PSI_CUTOFF,
    lo: float = PSI_LO,
    hi: float = PSI_HI,
    bins: int = PSI_BINS,
) -> str:
    frm_a1, l_a1 = sql_det_log2_joins("g.a1", "pa")
    frm_a2, l_a2 = sql_det_log2_joins("g.a2", "pb")
    frm_m1, l_m1 = sql_det_log2_joins("m1", "pm")
    frm_m2, l_m2 = sql_det_log2_joins("m2", "pn")
    return f"""
        WITH {sql_log2_table_cte()},
        obs AS (
            SELECT event_type,
                   CAST(CASE WHEN value < {lo} THEN 0
                             WHEN value >= {hi} THEN {bins + 1}
                             ELSE FLOOR((value - {lo}) / {hi - lo} * {bins})
                                  + 1
                        END AS BIGINT) AS bucket,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '{cutoff}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '{cutoff}'
                                 THEN 0 ELSE 1 END) AS BIGINT) AS o2
            FROM {table}
            WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT ty.event_type, r.range AS bucket,
                   COALESCE(o.o1, 0) AS o1, COALESCE(o.o2, 0) AS o2,
                   COALESCE(o.o1, 0) + 1 AS a1,
                   COALESCE(o.o2, 0) + 1 AS a2
            FROM (SELECT DISTINCT event_type FROM {table}) ty
            CROSS JOIN range(0, {bins + 2}) r
            LEFT JOIN obs o
              ON o.event_type = ty.event_type AND o.bucket = r.range
        ),
        tot AS (
            SELECT event_type, n_pre, n_post, m1, m2,
                   {l_m1} AS l_m1, {l_m2} AS l_m2
            FROM (SELECT event_type,
                         CAST(SUM(o1) AS BIGINT) AS n_pre,
                         CAST(SUM(o2) AS BIGINT) AS n_post,
                         CAST(SUM(a1) AS BIGINT) AS m1,
                         CAST(SUM(a2) AS BIGINT) AS m2
                  FROM grid GROUP BY 1) {frm_m1} {frm_m2}
        ),
        terms AS (
            SELECT g.event_type, t.n_pre, t.n_post,
                   CAST((g.a1 * {E6}) // t.m1
                        - (g.a2 * {E6}) // t.m2 AS HUGEINT)
                   * ({l_a1} + t.l_m2 - {l_a2} - t.l_m1) AS term
            FROM grid g
            JOIN tot t USING (event_type)
            {frm_a1} {frm_a2}
        )
        SELECT event_type, n_pre, n_post,
               CAST(GREATEST(SUM(term), 0) // {E6} AS BIGINT) AS psi_e20
        FROM terms
        GROUP BY 1, 2, 3
        ORDER BY event_type
    """
