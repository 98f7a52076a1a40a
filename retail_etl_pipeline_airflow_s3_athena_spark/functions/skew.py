"""Skew-mitigation utilities.

AQE's skew-join splitting (on by default, session.py) handles most hot
keys by splitting oversized partitions at runtime.  Salting is the
manual escape hatch for the cases AQE can't fix — e.g., a single key
holding >x% of the fact table where even a split partition's build side
is the bottleneck, or pre-AQE writers that need deterministic layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join a skewed large side to a small side on ``key`` with salting:
    the large side gets a random salt in [0, salt), the small side is
    replicated across all salt values, and the join key becomes
    (key, salt) — splitting each hot key's rows across ``salt``
    reducers.

    Correctness: every large row still meets every matching small row
    exactly once (the small side is replicated, not split), for any
    salt assignment — so the random salt does not affect results.
    This claim holds only for large-side-preserving joins: under
    ``right``/``full``/``right_semi``/``right_anti`` an unmatched small
    row would surface once PER REPLICA (``salt`` duplicated
    null-extended rows), which is wrong output — those modes are
    rejected.  Cost: small side inflates x salt; only worth it when
    the skew stall exceeds that."""
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti",
               "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports large-side-preserving joins only "
            f"({sorted(allowed)}); how={how!r} would emit each unmatched "
            f"small-side row {salt} times"
        )
    salted_large = large.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_large.join(
        replicated_small, on=[key, "__salt"], how=how
    ).drop("__salt")


def salted_segment_order_stats(
    orders: DataFrame, customer: DataFrame, salt: int = 8
) -> DataFrame:
    """(c_mktsegment, n_orders, total_price): per-segment order stats
    computed THROUGH :func:`salted_join` — the gate-checked proof that
    the salting rewrite is semantics-preserving: the output is
    bit-identical to the plain join (its oracle) for ANY salt
    assignment, any salt width, any partitioning, because the small
    side is replicated (never split) and the aggregate is the
    order-independent exact-cents sum (functions/money.py).

    Plan shape: the fact side shuffles on (custkey, salt) — a hot
    customer's rows land on ``salt`` reducers instead of one; the
    dimension inflates x salt before its (tiny) exchange.  This is the
    manual mitigation for the >x%-single-key case AQE's skew split
    can't fix (the build side itself is the bottleneck)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import money_sum

    large = orders.select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    small = customer.select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(large, small, "custkey", salt=salt)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


def oracle_salted_segment_order_stats_sql() -> str:
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
        sql_money_sum,
    )

    return f"""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_money_sum('o.o_totalprice')} AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        ORDER BY c.c_mktsegment
    """
