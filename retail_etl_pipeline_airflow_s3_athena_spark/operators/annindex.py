"""Persisted ANN index: train once, query forever (r7 verdict #6).

The PQ/IVF family in ``operators/pq.py`` retrains per call — right
for gate determinism, wrong for serving: at 100 TB the index is
built by an offline job and then queried by thousands of online
calls that must never pay a Lloyd round.  This module adds the
serving discipline:

- ``write_ann_index(embeddings, path)``: one training pass (the
  exact ``pq._train`` + IVF coarse assignment used by
  ``ivf_pq_topk``), persisted as three parquet tables under
  ``path``:

  * ``centroids/``  — (label, pos, val): coarse IVF centroids,
    exploded to scalars (K·dim rows — tiny).
  * ``codebooks/``  — (m, code, pos, val): PQ codebooks
    (M·K·sub_dim rows — tiny).
  * ``codes/``      — (vec_id, m, code) **partitioned by cell**:
    the compressed corpus.  Partitioning by the IVF cell makes the
    probe a PARTITION-PRUNED scan — a query touching nprobe of K
    cells reads nprobe/K of the files, enforced by the plan test
    (``PartitionFilters`` present, no full scan).

- ``ann_query(spark, path, ...)``: plans the ADC top-k against the
  PERSISTED tables.  Zero training stages: centroids and codebooks
  are two bounded parquet reads (broadcast), the probe list is a
  driver-side literal IN-filter (n_queries·nprobe values — the
  collect is bounded by the calibration-query contract), and the
  scan+score is the same exact-e6 ADC aggregation as
  ``pq.ivf_pq_topk``, so ``write_ann_index`` → ``ann_query``
  reproduces ``ivf_pq_topk`` bit-for-bit — the gate entry's oracle
  IS the ivf_pq_topk twin.

Determinism carries through parquet: codebook/centroid values are
dround(6) doubles (exact binary round-trip), codes and cells are
integers, and every tie-break is pinned upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
)
from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import cents
from retail_etl_pipeline_airflow_s3_athena_spark.operators.pq import (
    M_SUB,
    PQ_ROUNDS,
    SUB_DIM,
    _assign,
    _l2sq,
    _sub_corpus,
    _train,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.similarity import (
    EMB_DIM,
    _centroid_vectors,
    _normed,
    _pair_cosine,
    dot,
)

N_QUERIES = 5
TOP_K = 10
NPROBE = 2

# Explicit read schemas: an index built from an EMPTY corpus is a
# directory with no data files, where parquet schema inference fails —
# empty partitions/corpora are routine at scale and the query path
# must degrade to an empty result, not throw.
CENTROIDS_SCHEMA = "label INT, pos INT, val DOUBLE"
CODEBOOKS_SCHEMA = "m INT, code INT, pos INT, val DOUBLE"
CODES_SCHEMA = "vec_id BIGINT, m INT, code INT, cell INT"


def _reassemble_vec(df: DataFrame, key_cols: list[str], out: str) -> DataFrame:
    """(keys..., pos, val) -> (keys..., out: array<double>), the
    position-sorted struct-collect idiom (deterministic under any
    partitioning)."""
    return df.groupBy(*key_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "val"))),
            lambda s: s.val,
        ).alias(out)
    )


def _cell_assign(
    embeddings: DataFrame,
    dim: int = EMB_DIM,
    coarse: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cell): nearest coarse centroid by cosine, the
    ``ivf_pq_topk`` argmax discipline (max_by over the broadcast
    centroid table, (cos desc, label asc) pinned).  ``coarse``
    (label, cv, cnrm) defaults to centroids trained on ``embeddings``;
    the append path passes the PERSISTED table instead."""
    corpus = _normed(embeddings, dim)
    if coarse is None:
        coarse = _centroid_vectors(embeddings).select(
            "label", "cv",
            F.sqrt(dot(F.col("cv"), F.col("cv"), dim)).alias("cnrm"),
        )
    return (
        corpus.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id", "label",
            _pair_cosine(
                F.col("v"), F.col("cv"), F.col("nrm"), F.col("cnrm"), dim
            ).alias("c_cos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("label"), F.struct(F.col("c_cos"), (-F.col("label")))
            ).alias("cell")
        )
    )


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    rounds: int = PQ_ROUNDS,
    dim: int = EMB_DIM,
) -> dict:
    """Train and persist the IVF-PQ index.  Returns the manifest
    (row counts per table) — the offline job's receipt."""
    spark = embeddings.sparkSession
    sub, books, means = _train(embeddings, rounds)

    centroids = _centroid_vectors(embeddings).select(
        F.col("label").cast("int").alias("label"),
        F.posexplode("cv").alias("pos", "val"),
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")

    codebooks = means.select(
        "m", "code",
        F.col("pos").cast("int").alias("pos"),
        "val",
    )
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")

    codes = _assign(sub, books).select("vec_id", "m", "code")
    cells = _cell_assign(embeddings, dim)
    (
        codes.join(cells, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    sub.unpersist()
    manifest = {
        "centroids": spark.read.schema(CENTROIDS_SCHEMA).parquet(f"{path}/centroids").count(),
        "codebooks": spark.read.schema(CODEBOOKS_SCHEMA).parquet(f"{path}/codebooks").count(),
        "codes": spark.read.schema(CODES_SCHEMA).parquet(f"{path}/codes").count(),
    }
    return manifest


def _read_coarse(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """(label, cv, cnrm) reassembled from the persisted centroids."""
    return _reassemble_vec(
        spark.read.schema(CENTROIDS_SCHEMA).parquet(f"{path}/centroids"), ["label"], "cv"
    ).select(
        "label", "cv",
        F.sqrt(dot(F.col("cv"), F.col("cv"), dim)).alias("cnrm"),
    )


def append_to_ann_index(
    new_embeddings: DataFrame,
    path: str,
    dim: int = EMB_DIM,
) -> int:
    """Index freshness WITHOUT retraining: assign a new batch against
    the PERSISTED codebooks/centroids and append its codes to the
    cell-partitioned table — the write side of the serving loop
    (FAISS `add`).  Cost ∝ batch: one broadcast codebook join for the
    PQ codes, one broadcast centroid argmax for the cell, one
    partitioned append.  Centroids/codebooks drift as the corpus
    grows — re-training belongs to a periodic rebuild, not the
    per-batch path (same discipline as the fingerprint store's stop
    set).  Returns the number of vectors appended."""
    spark = new_embeddings.sparkSession
    books = _reassemble_vec(
        spark.read.schema(CODEBOOKS_SCHEMA).parquet(f"{path}/codebooks"), ["m", "code"], "scv"
    )
    sub = _sub_corpus(new_embeddings)
    codes = _assign(sub, books).select("vec_id", "m", "code")
    cells = _cell_assign(
        new_embeddings, dim, coarse=_read_coarse(spark, path, dim)
    )
    appended = codes.join(cells, "vec_id")
    n = appended.select("vec_id").distinct().count()
    (
        appended.write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    return n


def ann_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = NPROBE,
    dim: int = EMB_DIM,
) -> DataFrame:
    """ADC top-k against the persisted index — NO training stage.

    ``queries`` is (query_id, embedding).  Cost shape: two tiny
    parquet reads (centroids, codebooks — broadcast), one bounded
    driver collect (the probe list: n_queries·nprobe cell ids, turned
    into a partition-pruning IN filter on ``codes/``), one ADC
    distance table (n_queries·M·K rows, broadcast), one partial-agg
    sum + per-query top-k window.  The corpus-side scan reads ONLY
    the probed cells' files."""
    cents_vec = _reassemble_vec(
        spark.read.schema(CENTROIDS_SCHEMA).parquet(f"{path}/centroids"), ["label"], "cv"
    ).select(
        "label", "cv",
        F.sqrt(dot(F.col("cv"), F.col("cv"), dim)).alias("cnrm"),
    )
    books = _reassemble_vec(
        spark.read.schema(CODEBOOKS_SCHEMA).parquet(f"{path}/codebooks"), ["m", "code"], "scv"
    )

    # _normed reproduces EXACTLY the cast/norm path ivf_pq_topk's
    # query side uses — required for the bit-identical-oracle contract
    q = _normed(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        dim,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )

    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("c_cos"), F.asc("label")
    )
    probed = (
        q.crossJoin(F.broadcast(cents_vec))
        .select(
            "query_id", "label",
            _pair_cosine(
                F.col("qv"), F.col("cv"), F.col("qnrm"), F.col("cnrm"), dim
            ).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("label").alias("cell"))
    )
    # Bounded collect (calibration-query contract): the literal cell
    # list is what turns the codes read into a partition-PRUNED scan.
    probed = probed.persist()
    probe_cells = sorted(
        {r["cell"] for r in probed.select("cell").distinct().collect()}
    )

    codes = spark.read.schema(CODES_SCHEMA).parquet(f"{path}/codes").filter(
        F.col("cell").isin(probe_cells)
    )

    q_sub = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        F.slice(
                            F.col("qv"), m * SUB_DIM + 1, SUB_DIM
                        ).alias("sv"),
                    )
                    for m in range(M_SUB)
                ]
            )
        ).alias("e"),
    ).select("query_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    dist_table = q_sub.join(F.broadcast(books), "m").select(
        "query_id", "m", "code",
        cents(_l2sq(F.col("sv"), F.col("scv")), 6).alias("pd_e6"),
    )

    cand = codes.join(F.broadcast(probed), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = (
        cand.join(F.broadcast(dist_table), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd_e6").alias("adc_e6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_e6"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_e6", "rank")
    )
    return attach_cached_deps(out, probed)


def corpus_queries(embeddings: DataFrame, n_queries: int = N_QUERIES) -> DataFrame:
    """The pq-family calibration query set: the first ``n_queries``
    corpus vectors (self-matches are excluded inside ann_query)."""
    return embeddings.filter(
        F.col("vec_id") < n_queries
    ).select(F.col("vec_id").alias("query_id"), "embedding")
