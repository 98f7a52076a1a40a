"""Deterministic fixed-point log2 — transcendental-free scoring math.

The engine's gate hashes full-precision values, and libm
transcendentals (``ln``/``log``/``pow``) are NOT correctly rounded —
the last ulp differs across implementations, which flips value hashes
between engines (see operators/vocab.py::bigram_prob_score for the
original statement of the problem).  Everything here is built from
operations that ARE deterministic everywhere: 64-bit integer
arithmetic and comparisons.

``log2`` of a positive integer ``n`` in Q*.20 fixed point, via one
tiny broadcast table join and pure integer/string expressions:

    e = msb(n) = len(binary repr of n) - 1   -- pure expression
                 (Spark conv(n,10,2) / DuckDB bin(n) — integer
                 formatting, deterministic everywhere)
    m = (n * 2^12) div 2^e        -- 12-bit mantissa window [2^12,2^13)
    L(n) = e * 2^20 + T[m]        -- join the shared 4096-entry table

(An earlier formulation found ``e`` with a non-equi join against a
51-row powers-of-two table — correct but a BroadcastNestedLoopJoin
per L() site; the expression form keeps whole-stage codegen.  The
``pow2`` helpers remain for callers that want the table.)

``T`` holds the fractional bits ``log2(m / 2^12) * 2^20`` (rounded
down), generated once by :func:`log2_table_e20` with pure-integer
shift-and-square (Q1.62 fixed point, truncating) — no float, no libm,
bit-identical on any platform.  Both engines consume the SAME tables
(Spark as broadcast literal DataFrames, DuckDB as VALUES CTEs), so
cross-engine equality is by construction.  NO iterative expression
ladder: an earlier shift-ladder formulation blew up exponentially
under Catalyst's CollapseProject; the join formulation keeps every
expression tree constant-size.

Precision: the 12-bit mantissa truncation bounds the error of
``L(n)/2^20`` vs true log2 by ~2^-11.5 — plenty for importance
weighting / scoring, and stated wherever used.

Scale: the join runs on BOUNDED inputs (per-bucket count tables,
1-row totals) — never on the token stream; the one broadcast is
~64 KB (4096 rows).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANTISSA_BITS = 12
E20 = 1 << 20
MAX_EXP = 50
# n * 2^MANTISSA_BITS must fit a signed 64-bit long: n < 2^(63-12)
MAX_LOG_INPUT = 1 << MAX_EXP


def log2_frac_e20(k: int) -> int:
    """Fractional log2 bits of ``k / 2^MANTISSA_BITS`` (``k`` in
    ``[2^12, 2^13)``) in 2^20 fixed point, by 20 rounds of Q1.62
    shift-and-square — pure integers, truncating, platform-free."""
    y = (k << 62) >> MANTISSA_BITS  # Q1.62 value in [1, 2)
    f = 0
    for _ in range(20):
        y = (y * y) >> 62
        f <<= 1
        if y >= (2 << 62):
            f |= 1
            y >>= 1
    return f


def log2_table_e20() -> List[Tuple[int, int]]:
    """The shared (mantissa, frac_e20) lookup table, 4096 rows."""
    lo = 1 << MANTISSA_BITS
    return [(k, log2_frac_e20(k)) for k in range(lo, 2 * lo)]


def pow2_table() -> List[Tuple[int, int]]:
    """The shared (e, 2^e) msb table, ``MAX_EXP``+1 rows."""
    return [(e, 1 << e) for e in range(MAX_EXP + 1)]


def log2_e20(n: int) -> int:
    """Driver-side reference: L(n) for a positive integer (the same
    decomposition the engines run; used by tests and VALUES oracles)."""
    if not 1 <= n <= MAX_LOG_INPUT:
        raise ValueError(f"log2_e20 input out of range: {n}")
    e = n.bit_length() - 1
    m = (n << MANTISSA_BITS) >> e
    return e * E20 + log2_frac_e20(m)


def log2_table_df(spark: SparkSession) -> DataFrame:
    """The shared mantissa table as a broadcastable DataFrame."""
    return spark.createDataFrame(
        log2_table_e20(), "mant BIGINT, frac BIGINT"
    )


def pow2_table_df(spark: SparkSession) -> DataFrame:
    """The shared msb table as a broadcastable DataFrame."""
    return spark.createDataFrame(pow2_table(), "e BIGINT, p2 BIGINT")


def attach_det_log2_e20(
    df: DataFrame,
    in_col: str,
    out_col: str,
    log_df: DataFrame,
    pow_df: Optional[DataFrame] = None,
) -> DataFrame:
    """``df`` + ``out_col`` = L(``in_col``) via expressions + ONE
    broadcast equi-join against the shared 4096-row mantissa table.
    ``in_col`` must be a positive integer column; out-of-range values
    raise loudly (ANSI) rather than wrapping.  ``pow_df`` is accepted
    and ignored for signature compatibility (msb is now the
    binary-repr-length expression, not a table join)."""
    n = "__dl2_n"
    guarded = (
        F.when(
            (F.col(in_col) < 1) | (F.col(in_col) > MAX_LOG_INPUT),
            F.raise_error(
                F.concat(
                    F.lit(f"det_log2 input out of [1, {MAX_LOG_INPUT}]: "),
                    F.col(in_col).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.col(in_col).cast("long"))
    )
    out = df.withColumn(n, guarded)
    out = out.withColumn(
        "__dl2_e",
        (F.length(F.conv(F.col(n), 10, 2)) - 1).cast("long"),
    )
    out = out.withColumn(
        "__dl2_mant",
        F.expr(f"{n} * {1 << MANTISSA_BITS} div shiftleft(1L, __dl2_e)"),
    )
    lt = F.broadcast(
        log_df.withColumnsRenamed({"mant": "__dl2_mant", "frac": "__dl2_f"})
    )
    out = out.join(lt, "__dl2_mant")
    return out.withColumn(
        out_col, F.col("__dl2_e") * E20 + F.col("__dl2_f")
    ).drop(n, "__dl2_mant", "__dl2_e", "__dl2_f")


def sql_log2_table_cte(name: str = "log2t") -> str:
    """The shared mantissa table as a DuckDB VALUES CTE body."""
    rows = ", ".join(f"({k}, {f})" for k, f in log2_table_e20())
    return f"{name}(mant, frac) AS (VALUES {rows})"


def sql_pow2_table_cte(name: str = "powt") -> str:
    """The shared msb table as a DuckDB VALUES CTE body."""
    rows = ", ".join(f"({e}, {p})" for e, p in pow2_table())
    return f"{name}(e, p2) AS (VALUES {rows})"


def sql_det_log2_joins(n_expr: str, prefix: str) -> tuple[str, str]:
    """DuckDB twin: returns (equi-JOIN fragment against ``log2t``, the
    ``L(n_expr)`` select expression).  ``bin(n)`` is DuckDB's
    leading-zero-free binary formatting — ``length(bin(n)) - 1`` is
    the msb, mirroring Spark's ``length(conv(n, 10, 2)) - 1``.
    Append the fragment to the FROM clause of the query that owns
    ``n_expr``'s columns."""
    p = prefix
    e = f"(length(bin(CAST({n_expr} AS BIGINT))) - 1)"
    frag = (
        f" JOIN log2t {p}t ON {p}t.mant ="
        f" (({n_expr}) * {1 << MANTISSA_BITS}) // (1::BIGINT << {e})"
    )
    lexpr = f"({e} * {E20} + {p}t.frac)"
    return frag, lexpr
