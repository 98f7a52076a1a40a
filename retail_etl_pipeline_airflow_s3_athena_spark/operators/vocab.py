"""Corpus vocabulary building: top-k n-gram counts with document
frequency.

The reference has no text surface at all (its quality checks stop at
row counts, scripts/data_quality.py); vocabulary extraction is the
canonical corpus-statistics job a training-data pipeline runs before
tokenizer training (BPE/WordPiece corpus scans) or TF-IDF weighting.

Plan shape (100 TB notes): tokens are posexploded to FLAT rows and
n-grams formed with window ``lead()`` over (doc_id, pos) — identical
to the dedup shingle path, and for the same reason: higher-order array
lambdas are interpreted, flat rows stay inside WholeStageCodegen.  The
per-doc window needs no extra shuffle beyond the doc_id hash
partitioning, the n-gram groupBy is map-side combinable (partial
counts per partition), and the global top-k is a
TakeOrderedAndProject — no full sort.  Doc-frequency uses a two-level
aggregate ((ngram, doc_id) then ngram) instead of COUNT(DISTINCT) so
both levels stay partial-aggregatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
    dround,
    sql_dround,
    tokens,
)

TOP_K = 100


def ngram_vocab(
    docs: DataFrame,
    n: int = 2,
    k: int = TOP_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` lowercase whitespace-token ``n``-grams by total count
    (ties broken by n-gram text), with per-n-gram document frequency.

    Returns (ngram, n_occurrences, doc_freq) ordered by count desc.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    if n == 1:
        grams = flat.select("doc_id", F.col("tok").alias("ngram"))
    else:
        w = Window.partitionBy("doc_id").orderBy("pos")
        leads = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
        grams = (
            flat.select("doc_id", F.col("tok").alias("t0"), *leads)
            # the last n-1 positions of each doc have no full n-gram
            .filter(F.col(f"t{n - 1}").isNotNull())
            .select(
                "doc_id",
                F.concat_ws(
                    " ", *[F.col(f"t{i}") for i in range(n)]
                ).alias("ngram"),
            )
        )
    per_doc = grams.groupBy("ngram", "doc_id").agg(
        F.count("*").alias("n_in_doc")
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("n_in_doc").alias("n_occurrences"),
            F.count("*").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    tfidf_e20 = tf * (L(n_docs) − L(doc_freq)) — the classic
    tf·log(n/df) with L the DETERMINISTIC fixed-point log2
    (functions/detmath.py), so the score is a 64-bit INTEGER and the
    rank ordering is bit-identical on any engine/platform.  (The
    previous formulation used libm ``ln`` with a documented
    last-ulp-across-libms residual risk; base-2 instead of natural log
    scales every score by the same constant, so the ranking semantics
    are unchanged.)

    Plan shape (100 TB notes): tf is a (doc_id, term) partial-agg
    groupBy; doc_freq re-aggregates tf's output (two-level, both
    map-side combinable, no COUNT DISTINCT); the L-joins run on the
    vocab-sized doc-frequency table (two ~KB broadcasts) and the 1-row
    n_docs aggregate; the per-doc top-k rank filter compiles to
    WindowGroupLimit, so each map task keeps k rows per doc before the
    final shuffle."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
        attach_det_log2_e20,
        log2_table_df,
        pow2_table_df,
    )

    logt = log2_table_df(docs.sparkSession)
    powt = pow2_table_df(docs.sparkSession)
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # persisted: tf feeds BOTH the doc-frequency rollup and the score
    # join — without it the scan+explode+aggregate runs twice (at scale
    # this is the materialized term-frequency table every TF-IDF system
    # stages).  Ownership transfers to the caller (release_cached).
    tf = flat.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    dfreq = attach_det_log2_e20(dfreq, "doc_freq", "l_df", logt, powt)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    n_docs = attach_det_log2_e20(n_docs, "n_docs", "l_n", logt, powt)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n_docs.select("l_n"))
        .select(
            "doc_id",
            "term",
            "tf",
            "doc_freq",
            (F.col("tf") * (F.col("l_n") - F.col("l_df"))).alias("tfidf_e20"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_e20"), F.asc("term")
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        attach_cached_deps,
    )

    return attach_cached_deps(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k),
        tf,
    )


def oracle_tfidf_sql(
    table: str = "documents",
    k: int = 5,
    t: str = "text",
    id_col: str = "doc_id",
) -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
        sql_det_log2_joins,
        sql_log2_table_cte,
        sql_pow2_table_cte,
    )

    toks = f"list_filter(string_split_regex(lower({t}), '\\s+'), x -> x <> '')"
    frm_df, l_df = sql_det_log2_joins("doc_freq", "g")
    frm_n, l_n = sql_det_log2_joins("n_docs", "h")
    return f"""
        WITH {sql_log2_table_cte()},
        {sql_pow2_table_cte()},
        flat AS (
            SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM flat GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
            FROM tf GROUP BY term
        ),
        ldfreq AS (
            SELECT term, doc_freq, {l_df} AS l_df FROM dfreq {frm_df}
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
        ln_ AS (SELECT {l_n} AS l_n FROM n {frm_n}),
        scored AS (
            SELECT f.doc_id, f.term, f.tf, d.doc_freq,
                   CAST(f.tf * (l_n - d.l_df) AS BIGINT) AS tfidf_e20
            FROM tf f JOIN ldfreq d USING (term) CROSS JOIN ln_
        )
        SELECT doc_id, term, tf, doc_freq, tfidf_e20, CAST(rank AS INT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf_e20 DESC, term ASC) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """


def oracle_ngram_vocab_sql(
    table: str = "documents",
    n: int = 2,
    k: int = TOP_K,
    t: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = f"list_filter(string_split_regex(lower({t}), '\\s+'), x -> x <> '')"
    if n == 1:
        gram_cte = f"""
            grams AS (
                SELECT {id_col} AS doc_id, unnest({toks}) AS ngram
                FROM {table}
            )"""
    else:
        concat = " || ' ' || ".join(
            "tok" if i == 0 else f"LEAD(tok, {i}) OVER w" for i in range(n)
        )
        gram_cte = f"""
            toks AS (
                SELECT {id_col} AS doc_id,
                       unnest({toks}) AS tok,
                       generate_subscripts({toks}, 1) AS pos
                FROM {table}
            ),
            grams AS (
                SELECT doc_id, {concat} AS ngram
                FROM toks
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            )"""
    return f"""
        WITH {gram_cte}
        SELECT ngram,
               CAST(COUNT(*) AS BIGINT)               AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM grams
        WHERE ngram IS NOT NULL
        GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram ASC
        LIMIT {k}
    """


VOCAB_SIZE = 1000

# Largest vocabulary the single-partition TakeOrdered + rank-window
# fast path may handle; callers asking for more (a BPE-scale or
# "unbounded" vocab) silently got the textbook one-task WindowExec
# before — now they get the distributed two-pass rank instead.
WINDOW_VOCAB_MAX = 65_536
OOV_ID = -1


def encode_token_ids(
    docs: DataFrame,
    vocab_size: int = VOCAB_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integerization: (doc_id, pos, token_id) — every token position
    mapped to its frequency-ranked vocabulary id (0 = most frequent;
    ties broken by token text; out-of-vocabulary -> -1).

    This is the tokenize-to-ids step between corpus statistics and
    sequence packing: downstream training consumes id arrays, and the
    id assignment must be DETERMINISTIC so shards encoded on different
    executors/days agree on the mapping.

    Plan, small vocabularies (``vocab_size <= WINDOW_VOCAB_MAX``):
    token counts partial-aggregate map-side; the top-``vocab_size``
    cut is a TakeOrderedAndProject (per-partition partial top-k, no
    full sort); ranking the cut is a window over only ``vocab_size``
    rows (driver-bounded by construction); the corpus-side encode is a
    BROADCAST left join — the token stream never shuffles.

    Plan, large vocabularies: the top-k cut and the single-partition
    rank window would both funnel ``vocab_size`` rows through one task,
    so above ``WINDOW_VOCAB_MAX`` the id assignment switches to the
    distributed two-pass rank (functions/ranking.py — range partition +
    per-partition offsets) over ALL token counts, filtered to
    ``rank <= vocab_size``; the encode join drops the broadcast hint
    and lets AQE choose (a multi-million-row vocab may exceed the
    broadcast budget)."""
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    counts = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    if vocab_size <= WINDOW_VOCAB_MAX:
        cut = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(vocab_size)
        w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
        vocab = cut.select(
            "tok", (F.row_number().over(w) - 1).cast("long").alias("token_id")
        )
        vocab = F.broadcast(vocab)
    else:
        from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
            attach_cached_deps,
            carried_deps,
        )
        from retail_etl_pipeline_airflow_s3_athena_spark.functions.ranking import (
            attach_global_rank,
        )

        ranked = attach_global_rank(
            counts, [F.desc("cnt"), F.asc("tok")], rank_col="__rk"
        )
        vocab = ranked.filter(F.col("__rk") <= vocab_size).select(
            "tok", (F.col("__rk") - 1).cast("long").alias("token_id")
        )
        out = flat.join(vocab, "tok", "left").select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce("token_id", F.lit(OOV_ID).cast("long")).alias(
                "token_id"
            ),
        )
        return attach_cached_deps(out, *carried_deps(ranked))
    return flat.join(vocab, "tok", "left").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce("token_id", F.lit(OOV_ID).cast("long")).alias("token_id"),
    )


def oracle_encode_token_ids_sql(
    table: str = "documents",
    t: str = "text",
    vocab_size: int = VOCAB_SIZE,
) -> str:
    toks = (
        f"list_filter(string_split_regex(LOWER({t}), '\\s+'), x -> x <> '')"
    )
    return f"""
        WITH flat AS (
            SELECT doc_id,
                   unnest(range(len({toks}))) AS pos,
                   unnest({toks}) AS tok
            FROM {table}
        ),
        counts AS (
            SELECT tok, COUNT(*) AS cnt FROM flat GROUP BY tok
        ),
        vocab AS (
            SELECT tok,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) - 1
                        AS BIGINT) AS token_id
            FROM counts
            ORDER BY cnt DESC, tok ASC LIMIT {vocab_size}
        )
        SELECT f.doc_id,
               CAST(f.pos AS BIGINT) AS pos,
               COALESCE(v.token_id, {OOV_ID}) AS token_id
        FROM flat f LEFT JOIN vocab v USING (tok)
    """


PROB_SCALE = 1_000_000


def bigram_prob_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bigrams, fluency_score): language-model-style fluency
    scoring from the corpus's own bigram statistics — the mean add-one-
    smoothed conditional probability p(w2|w1) = (c12 + 1)/(c1 + V) over
    the document's bigram positions, scaled to integers.

    Why not log-prob/perplexity: ln() is not guaranteed correctly
    rounded and differs in the last ulp across libm implementations, so
    a float log accumulation can flip a value hash.  Scaled integer
    probabilities — (c12+1) * SCALE DIV (c1+V) per position, summed as
    BIGINTs — are bit-exact in any engine, order-independent under
    partial aggregation, and rank documents identically to mean
    probability.  Low scores flag disfluent/garbled text exactly like
    a (corpus-internal) LM perplexity filter would.

    Plan: the flat bigram stream joins the (bounded, vocab-sized)
    bigram and unigram count tables on their keys; V rides in as a
    broadcast 1-row aggregate; the per-doc mean is one combinable SUM.
    Docs with fewer than 2 tokens have no bigram positions and are
    absent from the output (same in the oracle)."""
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        flat.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    vocab_n = flat.select("tok").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(c1.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "doc_id",
            F.expr(
                f"CAST((c12 + 1) * {PROB_SCALE} DIV (c1 + v) AS BIGINT)"
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        dround(
            F.sum("s") / F.count(F.lit(1)) / F.lit(float(PROB_SCALE)), 6
        ).alias("fluency_score"),
    )


def oracle_bigram_prob_score_sql(
    table: str = "documents", t: str = "text"
) -> str:
    toks = (
        f"list_filter(string_split_regex(LOWER({t}), '\\s+'), x -> x <> '')"
    )
    score = sql_dround(
        f"CAST(SUM(s) AS DOUBLE) / COUNT(*) / CAST({PROB_SCALE} AS DOUBLE)", 6
    )
    return f"""
        WITH flat AS (
            SELECT doc_id,
                   unnest(range(len({toks}))) AS pos,
                   unnest({toks}) AS tok
            FROM {table}
        ),
        big AS (
            SELECT doc_id, tok AS w1,
                   LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM flat
        ),
        big2 AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
        c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big2 GROUP BY w1, w2),
        c1 AS (SELECT tok AS w1, COUNT(*) AS c1 FROM flat GROUP BY tok),
        vocab_n AS (SELECT COUNT(DISTINCT tok) AS v FROM flat)
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               {score} AS fluency_score
        FROM big2 b
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN vocab_n
        , LATERAL (SELECT CAST((c12 + 1) * {PROB_SCALE} // (c1 + v)
                               AS BIGINT) AS s) x
        GROUP BY b.doc_id
    """
