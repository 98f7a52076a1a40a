"""Source-mixing planning and diagnostics for training-data curation.

Two operators a large-scale pretraining pipeline runs between corpus
statistics and the final shuffle/pack (neither exists in the
reference, which has no curation surface at all):

- :func:`mixing_plan` — the Dolma/LLaMA-style token-budget allocation:
  given per-source token counts, target mixture weights, a total token
  budget and an epoch cap, compute each source's sampling rate and
  realized token count.  Pure integer (e6 fixed point) arithmetic over
  a |sources|-row rollup — one combinable groupBy over the corpus, one
  broadcast of the weights table; output is cluster-trivial at any
  scale.
- :func:`source_entropy` — per-source unigram Shannon entropy, the
  standard degenerate-source diagnostic (templated/boilerplate sources
  show collapsed entropy).  H = L(N) − (Σ c·L(c)) / N with L the
  deterministic fixed-point log2 (functions/detmath.py) — integers end
  to end, so the gate hash is engine/platform-exact; the L-joins run
  on the per-(source, token) count table, and the Σ c·L(c)
  accumulation is DECIMAL(38,0) (per-term values reach ~2^75 at
  100 TB-scale counts — a BIGINT accumulator would overflow).

Scale notes: both operators are one shuffle each (groupBy source /
groupBy (source, token) with map-side combine).  |sources| is small by
construction; the per-(source, token) table is |vocab|·|sources| rows,
embarrassingly parallel through the broadcast log2 joins.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
    attach_det_log2_e20,
    log2_table_df,
    pow2_table_df,
    sql_det_log2_joins,
    sql_log2_table_cte,
    sql_pow2_table_cte,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    token_count,
    tokens,
)

E6 = 10**6


def mixing_plan(
    docs: DataFrame,
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling plan for a ``token_budget``-token training
    mix: (source, n_docs, n_tokens, weight_e6, rate_e6, planned_tokens,
    capped).

    ``weights`` maps source → target weight in e6 fixed point (callers
    normalize; un-listed sources get weight 0).  ``rate_e6`` is the
    sampling rate (>E6 means multiple epochs), capped at
    ``max_epochs_e6`` — the capped flag marks sources whose target
    share is unreachable without over-epoching (the classic "not
    enough Wikipedia" case), and ``planned_tokens`` is what the cap
    actually yields.  All arithmetic is 64-bit integer: desired =
    budget·w_e6 div E6; rate = desired·E6 div n_tokens, min cap;
    planned = n_tokens·rate div E6."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())],
        f"{source_col} STRING, weight_e6 BIGINT",
    )
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    j = per_source.join(F.broadcast(wdf), source_col, "left").select(
        source_col,
        "n_docs",
        "n_tokens",
        F.coalesce("weight_e6", F.lit(0).cast("long")).alias("weight_e6"),
    )
    raw_rate = F.expr(
        f"({int(token_budget)} * weight_e6 div {E6}) * {E6} "
        "div greatest(n_tokens, 1)"
    )
    rate = F.least(raw_rate, F.lit(int(max_epochs_e6)))
    return j.select(
        source_col,
        "n_docs",
        "n_tokens",
        "weight_e6",
        rate.alias("rate_e6"),
        F.expr(
            f"n_tokens * least(({int(token_budget)} * weight_e6 div {E6})"
            f" * {E6} div greatest(n_tokens, 1), "
            f"{int(max_epochs_e6)}) div {E6}"
        ).alias("planned_tokens"),
        (raw_rate > F.lit(int(max_epochs_e6))).alias("capped"),
    ).orderBy(source_col)


def oracle_mixing_plan_sql(
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    table: str = "documents",
    t: str = "text",
) -> str:
    rows = ", ".join(
        f"('{s}', {int(w)})" for s, w in sorted(weights.items())
    )
    b = int(token_budget)
    cap = int(max_epochs_e6)
    raw = (
        f"(({b} * weight_e6) // {E6}) * {E6} // GREATEST(n_tokens, 1)"
    )
    return f"""
        WITH w(source, weight_e6) AS (VALUES {rows}),
        per_source AS (
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(
                       string_split_regex({t}, '\\s+'), x -> x <> '')))
                       AS BIGINT) AS n_tokens
            FROM {table} d GROUP BY d.source
        ),
        j AS (
            SELECT p.source, p.n_docs, p.n_tokens,
                   CAST(COALESCE(w.weight_e6, 0) AS BIGINT) AS weight_e6
            FROM per_source p LEFT JOIN w USING (source)
        )
        SELECT source, n_docs, n_tokens, weight_e6,
               CAST(LEAST({raw}, {cap}) AS BIGINT) AS rate_e6,
               CAST(n_tokens * LEAST({raw}, {cap}) // {E6} AS BIGINT)
                   AS planned_tokens,
               {raw} > {cap} AS capped
        FROM j ORDER BY source
    """


def source_entropy(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, n_distinct_tokens, entropy_e20): per-source
    unigram Shannon entropy in 2^20 fixed point, deterministic-integer
    throughout: H = L(N) − (Σ c·L(c)) div N (truncating div, identical
    in both engines).  Collapsed entropy flags templated/degenerate
    sources before they flood a training mix."""
    spark = docs.sparkSession
    logt, powt = log2_table_df(spark), pow2_table_df(spark)
    counts = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = attach_det_log2_e20(counts, "c", "l_c", logt, powt)
    per_source = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        # c·L(c) reaches ~2^75 at 100 TB-scale counts: DECIMAL(38,0)
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("l_c")).alias("s_cl"),
    )
    per_source = attach_det_log2_e20(
        per_source, "n_tokens", "l_n", logt, powt
    )
    return per_source.select(
        "source",
        "n_tokens",
        "n_distinct_tokens",
        F.expr("CAST(l_n - (s_cl div n_tokens) AS BIGINT)").alias(
            "entropy_e20"
        ),
    ).orderBy("source")


def oracle_source_entropy_sql(table: str = "documents", t: str = "text") -> str:
    toks = (
        f"list_filter(string_split_regex(LOWER({t}), '\\s+'), x -> x <> '')"
    )
    frm_c, l_c = sql_det_log2_joins("c", "e")
    frm_n, l_n = sql_det_log2_joins("n_tokens", "f")
    return f"""
        WITH {sql_log2_table_cte()},
        {sql_pow2_table_cte()},
        flat AS (
            SELECT source, unnest({toks}) AS tok FROM {table}
        ),
        counts AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM flat GROUP BY source, tok
        ),
        lcounts AS (
            SELECT source, c, {l_c} AS l_c FROM counts {frm_c}
        ),
        per_source AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
                   SUM(CAST(c AS HUGEINT) * l_c) AS s_cl
            FROM lcounts GROUP BY source
        )
        SELECT source, n_tokens, n_distinct_tokens,
               CAST({l_n} - (s_cl // n_tokens) AS BIGINT) AS entropy_e20
        FROM per_source {frm_n}
        ORDER BY source
    """


def mixing_sample(
    docs: DataFrame,
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXECUTE a :func:`mixing_plan`: (doc_id, source, epoch,
    n_tokens) — the realized training mix, one output row per (doc,
    epoch) the plan's per-source rate admits.

    Rates are applied per document by CONTENT hash (the
    functions/sampling.py discipline — ``df.sample`` is seed- and
    partitioning-dependent, unusable for a reproducible mix): bucket =
    md5(doc_id || salt) mod E6; a source sampled at ``rate_e6`` yields
    ``rate_e6 div E6`` full epochs of every doc plus one extra epoch
    for docs whose bucket falls under ``rate_e6 mod E6`` — the
    standard over-epoching realization (rate 2.3 = every doc twice,
    30% of docs a third time), deterministic across runs, engines and
    partitionings, and consistent under incremental re-processing.

    Plan shape: the |sources|-row plan broadcasts onto the corpus (one
    map-side join), the epoch explode is bounded by
    ``ceil(max_epochs_e6 / E6)`` — a pure per-row pipeline with no
    extra shuffle at any corpus size."""
    plan = mixing_plan(
        docs,
        weights,
        token_budget,
        max_epochs_e6=max_epochs_e6,
        text_col=text_col,
        source_col=source_col,
    ).select(source_col, "rate_e6")
    key = F.concat_ws(
        "\x1f", F.col(id_col).cast("string"), F.lit(salt)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        % E6
    )
    n_copies = F.expr(f"rate_e6 div {E6}") + F.when(
        bucket < F.col("rate_e6") % E6, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.join(F.broadcast(plan), source_col)
        .select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            token_count(F.col(text_col)).alias("n_tokens"),
            n_copies.alias("__nc"),
        )
        .filter(F.col("__nc") >= 1)
        .select(
            id_col,
            "source",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("__nc"))
            ).alias("epoch"),
            "n_tokens",
        )
        .select(id_col, "source", "epoch", "n_tokens")
        .orderBy(id_col, "epoch")
    )


def oracle_mixing_sample_sql(
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    table: str = "documents",
    t: str = "text",
    salt: str = "",
) -> str:
    plan = oracle_mixing_plan_sql(
        weights, token_budget, max_epochs_e6=max_epochs_e6,
        table=table, t=t,
    )
    key = f"concat_ws(chr(31), CAST(doc_id AS VARCHAR), '{salt}')"
    bucket = (
        f"(CAST(('0x' || substr(md5({key}), 1, 15)) AS BIGINT) % {E6})"
    )
    ntoks = (
        f"len(list_filter(string_split_regex({t}, '\\s+'), x -> x <> ''))"
    )
    return f"""
        WITH plan AS ({plan}),
        j AS (
            SELECT d.doc_id, d.source,
                   CAST({ntoks} AS BIGINT) AS n_tokens,
                   p.rate_e6 // {E6}
                     + CASE WHEN {bucket} < p.rate_e6 % {E6}
                            THEN 1 ELSE 0 END AS nc
            FROM {table} d JOIN plan p USING (source)
        )
        SELECT doc_id, source,
               CAST(unnest(range(1, nc + 1)) AS BIGINT) AS epoch,
               n_tokens
        FROM j WHERE nc >= 1
        ORDER BY doc_id, epoch
    """


def curriculum_mix(
    docs: DataFrame,
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    n_phases: int = 4,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-curriculum ORDER over the realized training mix: (pos,
    phase, doc_id, epoch, n_tokens) — the table a dataloader walks.

    Curriculum learning orders training data from broad/noisy toward
    high quality (the annealing recipe: the last phase is the cleanest
    data).  Composition of the engine's own pieces, deterministic end
    to end:

    1. phase — documents ranked by (quality_score asc, doc_id asc)
       via the DISTRIBUTED two-pass rank (functions/ranking.py — no
       single-partition WindowExec even at billions of docs), bucketed
       NTILE-style into ``n_phases``; the dround6 quality score is
       quantized, so the order is engine-exact.
    2. mix — :func:`mixing_sample`'s (doc, epoch) rows, joined to the
       phases.
    3. pos — a second global rank over (phase, order_hash, doc_id,
       epoch), where order_hash = md5(doc_id ␟ epoch) shuffles WITHIN
       each phase (content-hash discipline: reproducible under any
       partitioning, no seed).

    Scale: two rank passes (each a range exchange + bounded stats) +
    one broadcast plan join — the same asymptotic cost as sorting the
    mix once, which ANY global training order costs."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        attach_cached_deps,
        carried_deps,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.ranking import (
        attach_global_rank,
        ntile_from_rank,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        quality_score,
    )

    q = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), quality_score(F.col(text_col)).alias("_q")
    )
    ranked_docs = attach_global_rank(
        q,
        [F.asc("_q"), F.asc(id_col)],
        rank_col="_qrank",
        total_col="_qn",
    )
    phases = ranked_docs.select(
        id_col,
        ntile_from_rank(F.col("_qrank"), F.col("_qn"), n_phases)
        .cast("long")
        .alias("phase"),
    )
    mix = mixing_sample(
        docs,
        weights,
        token_budget,
        max_epochs_e6=max_epochs_e6,
        text_col=text_col,
        source_col=source_col,
        id_col=id_col,
    )
    oh = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "\x1f",
                            F.col(id_col).cast("string"),
                            F.col("epoch").cast("string"),
                        ),
                        "UTF-8",
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    phased = mix.join(phases, id_col).withColumn("_oh", oh)
    ordered = attach_global_rank(
        phased,
        [F.asc("phase"), F.asc("_oh"), F.asc(id_col), F.asc("epoch")],
        rank_col="pos",
    )
    out = ordered.select(
        "pos", "phase", id_col, "epoch", "n_tokens"
    ).orderBy("pos")
    return attach_cached_deps(
        out, *carried_deps(ranked_docs), *carried_deps(ordered)
    )


def oracle_curriculum_mix_sql(
    weights: Mapping[str, int],
    token_budget: int,
    max_epochs_e6: int = 3 * E6,
    n_phases: int = 4,
    table: str = "documents",
    t: str = "text",
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        sql_quality_score,
    )

    mix = oracle_mixing_sample_sql(
        weights, token_budget, max_epochs_e6=max_epochs_e6,
        table=table, t=t,
    )
    oh = (
        "CAST(('0x' || substr(md5(concat_ws(chr(31), "
        "CAST(m.doc_id AS VARCHAR), CAST(m.epoch AS VARCHAR))), 1, 15)) "
        "AS BIGINT)"
    )
    return f"""
        WITH mix AS ({mix}),
        phases AS (
            SELECT doc_id,
                   CAST(NTILE({n_phases}) OVER (
                       ORDER BY {sql_quality_score(t)} ASC, doc_id ASC
                   ) AS BIGINT) AS phase
            FROM {table} WHERE {t} IS NOT NULL
        )
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY p.phase, {oh}, m.doc_id, m.epoch
               ) AS BIGINT) AS pos,
               p.phase, m.doc_id, m.epoch, m.n_tokens
        FROM mix m JOIN phases p USING (doc_id)
        ORDER BY pos
    """
