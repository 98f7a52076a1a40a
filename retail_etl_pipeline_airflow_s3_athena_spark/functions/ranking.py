"""Distributed global ranking without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
input onto ONE task (Spark's WindowExec warns about exactly this) — the
textbook scale-killer for rank/NTILE/PERCENT_RANK over a large keyset.
At 100 TB, |customers| is billions of rows; a global rank must stay
distributed.

``attach_global_rank`` implements the classic two-pass scheme:

1. ``repartitionByRange`` on the sort keys + ``sortWithinPartitions``
   — ONE shuffle; partition *i* holds a contiguous range of the total
   order, locally sorted.
2. ``monotonically_increasing_id`` tags each row; within a partition
   the ids are consecutive and increasing in iteration (= sorted)
   order, so ``id - min(id over the partition)`` is the local 0-based
   row number.  No assumption about the pid<<33 bit layout is made —
   only within-partition monotonicity + consecutiveness, which is the
   documented contract.
3. A per-partition stats rollup (#partitions rows — bounded by the
   cluster, not the data) yields cumulative offsets via a broadcast
   triangular self-join over those #partitions rows; the plan contains
   NO single-partition WindowExec at any width.
4. ``rank = offset + local_row_number + 1`` after a broadcast join of
   the tiny stats table.

Requirements: the ``order_by`` keys must form a TOTAL order (add a
unique tie-break key) — otherwise ranks of tied rows depend on
physical placement and the result is nondeterministic.

From the global rank, NTILE / PERCENT_RANK / quartiles are pure
arithmetic (``ntile_from_rank`` / ``percent_rank_from_rank``), exactly
matching the SQL window-function semantics the oracle runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
)

__all__ = [
    "attach_global_rank",
    "ntile_from_rank",
    "percent_rank_from_rank",
]

_PID = "__rank_pid"
_MID = "__rank_mid"


def attach_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    rank_col: str = "rank",
    total_col: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Return ``df`` plus a 1-based global ``rank_col`` over the total
    order ``order_by``, computed with range partitioning + per-partition
    offsets instead of a single-partition window.

    If ``total_col`` is given, the total row count is attached too
    (handy for NTILE / PERCENT_RANK arithmetic without a second pass).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(num_partitions, *order_by)
    ranged = ranged.sortWithinPartitions(*order_by)
    # Both exprs are nondeterministic -> Catalyst will not push this
    # Project below the Sort/Exchange, so ids follow the sorted order.
    #
    # The persist is CORRECTNESS, not caching (same discipline as
    # RDD.zipWithIndex): tagged feeds both the stats branch and the
    # output branch, and without materialization each branch re-executes
    # the range exchange — whose partition boundaries come from sampling
    # an input whose intra-partition order is shuffle-fetch-order —
    # so the two executions can disagree on (pid, mid) and the offsets
    # silently mis-add (caught by the sf5 endurance gate; invisible at
    # small scale where exchange reuse made the branches share one
    # execution).  Ownership of the persist transfers to the caller via
    # attach_cached_deps.  Caveat inherited from zipWithIndex: a cached
    # block lost AFTER the stats pass recomputes with fresh mids —
    # lossy-executor deployments should checkpoint the input first.
    tagged = ranged.select(
        "*",
        F.spark_partition_id().alias(_PID),
        F.monotonically_increasing_id().alias(_MID),
    ).persist()
    stats = tagged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(_MID).alias("__min_mid"),
    )
    # Exclusive prefix sum over the #partitions-row stats table via a
    # broadcast triangular self-join — O(P^2) pairs where P is the
    # PARTITION COUNT (cluster config, not data), and crucially NOT a
    # ``Window.orderBy`` with empty partitioning: this plan contains no
    # single-partition WindowExec at any width.
    earlier = stats.select(
        F.col(_PID).alias("__pid2"), F.col("__cnt").alias("__cnt2")
    )
    offsets = (
        stats.join(
            F.broadcast(earlier), F.col("__pid2") < F.col(_PID), "left"
        )
        .groupBy(_PID, "__min_mid")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0).cast("long")).alias("__off"))
    )
    total = stats.agg(F.sum("__cnt").alias("__total"))
    out = tagged.join(F.broadcast(offsets), _PID).join(F.broadcast(total))
    rank = (F.col("__off") + (F.col(_MID) - F.col("__min_mid")) + 1).alias(
        rank_col
    )
    keep = [c for c in df.columns]
    cols = [F.col(c) for c in keep] + [rank]
    if total_col is not None:
        cols.append(F.col("__total").alias(total_col))
    return attach_cached_deps(out.select(*cols), tagged)


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """NTILE(k) from a 1-based global rank and the total row count —
    identical bucket-size semantics to the SQL window function: the
    first ``total % k`` buckets get ``total div k + 1`` rows, the rest
    ``total div k``.  Pure integer arithmetic, no window."""
    q = F.floor(total / k).cast("long")
    r = (total % k).cast("long")
    big = q + 1  # size of the first ``r`` buckets
    cutoff = r * big
    in_big = F.floor((rank - 1) / big) + 1
    in_small = r + F.floor((rank - cutoff - 1) / F.greatest(q, F.lit(1))) + 1
    return (
        F.when(rank <= cutoff, in_big).otherwise(in_small).cast("int")
    )


def percent_rank_from_rank(rank: Column, total: Column) -> Column:
    """PERCENT_RANK() from a 1-based rank over a total (tie-free)
    order: ``(rank - 1) / (total - 1)``; 0.0 for a single row."""
    return F.when(total > 1, (rank - 1) / (total - 1)).otherwise(
        F.lit(0.0)
    )
