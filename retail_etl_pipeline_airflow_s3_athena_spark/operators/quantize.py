"""Embedding compression: per-vector symmetric int8 quantization.

Large-scale similarity search stores don't keep float32 vectors — they
quantize (int8 scalar quantization is the standard first step, 4x
smaller, dot products in integer SIMD).  This operator computes, per
vector: the max-abs scale, the int8 codes, and the L2 reconstruction
error, entirely in codegen'd JVM expressions.

Determinism/plan notes:
- All arithmetic is UNROLLED per dimension (64 literal column
  expressions, like similarity.dot): no interpreted array lambdas,
  and addition chains associate left-to-right identically in Spark's
  codegen and DuckDB's list_reduce fold, so the error sums are
  bit-identical across engines.
- Quantization is embarrassingly parallel — no shuffle at all; the
  operator is a pure projection that pipelines with whatever scan or
  join precedes it.
- Codes are emitted as a comma-joined string (the stable cross-engine
  canonical form); a production sink would pack them to BINARY.
- floor(x + 0.5) rounding (round-half-up) is used on both engines
  rather than engine-native round() half-even/half-away variance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators.similarity import EMB_DIM
from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
    money_avg,
    sql_money_avg,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround, sql_dround

Q_MAX = 127  # int8 symmetric range


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
) -> DataFrame:
    """(vec_id, scale, codes, recon_err): max-abs int8 quantization.

    ``codes[i] = floor(x[i] / scale + 0.5)`` with ``scale =
    max(|x|)/127``; zero vectors quantize to all-zero codes with
    scale 0.  ``recon_err`` is the L2 distance between the vector and
    ``codes * scale``.

    The max-abs reduction is STAGED into its own projection: inlining
    the 64-term ``greatest`` into all 128 downstream code/error
    expressions builds a ~10k-node tree that Catalyst re-evaluates per
    reference (4x slower measured at sf0.1).  CollapseProject keeps the
    stage because ``m`` is non-cheap and multiply-referenced."""
    x = [F.col(vec_col)[i].cast("double") for i in range(dim)]
    max_abs = F.greatest(*[F.abs(xi) for xi in x])
    staged = embeddings.select(
        F.col(id_col), F.col(vec_col), max_abs.alias("m")
    )
    scale = F.col("m") / F.lit(float(Q_MAX))
    zero = F.col("m") == F.lit(0.0)

    def code(xi: Column) -> Column:
        return F.when(zero, F.lit(0)).otherwise(
            F.floor(xi / scale + F.lit(0.5)).cast("int")
        )

    codes = [code(xi) for xi in x]
    err_terms = [
        (xi - ci.cast("double") * scale) * (xi - ci.cast("double") * scale)
        for xi, ci in zip(x, codes)
    ]
    sq_sum = err_terms[0]
    for t in err_terms[1:]:
        sq_sum = sq_sum + t
    return staged.select(
        F.col(id_col),
        dround(scale, 8).alias("scale"),
        F.concat_ws(",", *[c.cast("string") for c in codes]).alias("codes"),
        dround(F.sqrt(sq_sum), 6).alias("recon_err"),
    )


def oracle_quantize_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
) -> str:
    raw = [f"CAST({vec_col}[{i + 1}] AS DOUBLE)" for i in range(dim)]
    max_abs = "GREATEST(" + ", ".join(f"ABS({e})" for e in raw) + ")"
    base_cols = ", ".join(f"{e} AS x{i}" for i, e in enumerate(raw))
    codes = ",\n                   ".join(
        f"CASE WHEN m = 0.0 THEN 0 "
        f"ELSE CAST(FLOOR(x{i} / (m / {Q_MAX}.0) + 0.5) AS INT) END AS c{i}"
        for i in range(dim)
    )
    xs = ", ".join(f"x{i}" for i in range(dim))
    cs = ", ".join(f"c{i}" for i in range(dim))
    # Per-term squared errors as named columns in their own CTE: keeps
    # DuckDB's binder recursion shallow (a 64-term nested expression of
    # CASE sub-expressions exceeds its depth-128 limit).  The final sum
    # over simple column refs associates left-to-right, matching the
    # Spark expression chain bit-for-bit.
    errs = ",\n                   ".join(
        f"(x{i} - CAST(c{i} AS DOUBLE) * (m / {Q_MAX}.0)) * "
        f"(x{i} - CAST(c{i} AS DOUBLE) * (m / {Q_MAX}.0)) AS e{i}"
        for i in range(dim)
    )
    err = " + ".join(f"e{i}" for i in range(dim))
    concat = ("concat_ws(',', " + ", ".join(f"CAST(c{i} AS VARCHAR)" for i in range(dim)) + ")")
    return f"""
        WITH base AS MATERIALIZED (
            SELECT {id_col}, {max_abs} AS m, {base_cols}
            FROM {table}
        ), coded AS MATERIALIZED (
            SELECT {id_col}, m, {xs},
                   {codes}
            FROM base
        ), errs AS MATERIALIZED (
            SELECT {id_col}, m, {cs},
                   {errs}
            FROM coded
        )
        SELECT {id_col},
               {sql_dround(f"m / {Q_MAX}.0", 8)} AS scale,
               {concat} AS codes,
               {sql_dround(f"SQRT({err})", 6)} AS recon_err
        FROM errs
    """


def standardize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-DIMENSION standardization (z-scoring) of the corpus:
    (vec_id, pos, z) with z = (x - mean_pos) / std_pos.

    Whitening-lite: centering + unit variance per dimension is the
    standard preprocessing before PQ codebook training or IVF
    clustering when dimensions have wildly different scales.

    Cross-engine determinism: corpus means/variances are double
    aggregates whose accumulation order differs between Spark's
    partial aggregation and DuckDB's serial sum — so every derived
    statistic is ROUNDED (6dp) before it enters the z formula, and the
    z itself is rounded.  Zero-variance dimensions standardize to 0.

    Plan: one explode -> one groupBy(pos) partial-aggregated stats
    pass (64 groups), stats broadcast back, pure projection after —
    the corpus is scanned twice and shuffled never (the 64-row stats
    exchange is constant-size)."""
    flat = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select("vec_id", "pos", F.col("x").cast("double").alias("x"))
    stats = flat.groupBy("pos").agg(
        dround(money_avg("x", 8), 6).alias("mu"),
        dround(money_avg(F.col("x") * F.col("x"), 8), 6).alias("ex2"),
    ).select(
        "pos",
        "mu",
        dround(F.sqrt(F.greatest(F.col("ex2") - F.col("mu") * F.col("mu"), F.lit(0.0))), 6).alias("sigma"),
    )
    return flat.join(F.broadcast(stats), "pos").select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.when(F.col("sigma") > 0, dround((F.col("x") - F.col("mu")) / F.col("sigma"), 6))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def oracle_standardize_embeddings_sql(table: str = "embeddings") -> str:
    mu = sql_dround(sql_money_avg("x", 8), 6)
    ex2 = sql_dround(sql_money_avg("x * x", 8), 6)
    sigma = sql_dround("SQRT(GREATEST(ex2 - mu * mu, 0.0))", 6)
    z = sql_dround("(f.x - s.mu) / s.sigma", 6)
    return f"""
        WITH flat AS (
            SELECT vec_id,
                   unnest(range(len(embedding))) AS pos,
                   unnest(list_transform(embedding, e -> CAST(e AS DOUBLE)))
                       AS x
            FROM {table}
        ),
        raw_stats AS (
            SELECT pos, {mu} AS mu, {ex2} AS ex2
            FROM flat GROUP BY pos
        ),
        stats AS (
            SELECT pos, mu, {sigma} AS sigma FROM raw_stats
        )
        SELECT f.vec_id,
               CAST(f.pos AS BIGINT) AS pos,
               CASE WHEN s.sigma > 0 THEN {z} ELSE 0.0 END AS z
        FROM flat f JOIN stats s USING (pos)
    """
