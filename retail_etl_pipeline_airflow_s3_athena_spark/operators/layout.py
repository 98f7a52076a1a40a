"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the scan you avoid is worth more than the scan you speed
up.  Partition pruning handles ONE dimension (the reference's silver
layer partitions by date — sources/writers.py mirrors it); queries
that also filter on a second key (customer, store, part) still read
every file inside the date range.  Z-ordering interleaves the bits of
two normalized dimensions into one sort key, so ANY contiguous range
of files covers a small rectangle in BOTH dimensions — parquet
min/max footer stats then prune files for either predicate.  This is
Delta/Iceberg OPTIMIZE ZORDER re-expressed as plain deterministic
DataFrame ops: range-normalize each dimension to 16 bits off a 1-row
stats broadcast, interleave to a 32-bit Morton code, and
repartitionByRange + sortWithinPartitions on that code at write time.

Determinism: normalization is exact integer arithmetic off exact
integer min/max (xn = (x − min)·65535 div max(range, 1)); the
interleave is a 32-term bit-extraction sum, codegen'd JVM-side.  The
`zorder_layout` diagnostic buckets the corpus by the top 8 Morton
bits (a FIXED 256-cell grid, not the data-dependent range split the
writer uses) and reports per-bucket min/max of both dimensions — the
pruning evidence as a hash-checkable table: each bucket's extent is a
small rectangle, so a predicate on either dimension touches few
buckets.

Scale shape: one map-side-combinable stats aggregation (1 row), one
broadcast crossJoin, one groupBy on 256 bucket keys (diagnostic) or
one range exchange (writer) — the same cost as any global sort, which
a layout rewrite at 100 TB is by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16
MAX_N = (1 << BITS) - 1  # 65535
BUCKET_SHIFT = 24  # top 8 of the 32 interleaved bits -> 256 buckets


def _interleave(xn: Column, yn: Column) -> Column:
    """32-bit Morton code from two 16-bit normalized ints: x takes the
    even bit positions, y the odd.  A flat 32-term sum of bit
    extractions — whole-stage-codegen'd, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(BITS):
        z = z + (F.shiftright(xn, i).bitwiseAND(F.lit(1))) * F.lit(
            1 << (2 * i)
        )
        z = z + (F.shiftright(yn, i).bitwiseAND(F.lit(1))) * F.lit(
            1 << (2 * i + 1)
        )
    return z


def _sql_interleave(xn: str, yn: str) -> str:
    terms = []
    for i in range(BITS):
        terms.append(f"(({xn} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({yn} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    out: str = "z",
    keep_nulls: bool = False,
) -> DataFrame:
    """Attach the Morton key of two integer dimensions: stats row
    (exact min/max of each, NULLs ignored) broadcast back, normalize,
    interleave.  With ``keep_nulls=False`` (the diagnostic default)
    rows with a NULL in either dimension are dropped; with
    ``keep_nulls=True`` they get the sentinel key z = −1 (sorts
    before every real 32-bit code) — the writer path uses this so a
    layout REWRITE never loses rows (Delta/Iceberg ZORDER keeps
    null-keyed rows too; r7 ADVICE).

    The range normalization multiplies in DECIMAL(38,0): plain BIGINT
    ``(x − min) · 65535`` silently wraps once the dimension range
    exceeds ~1.4e14 (epoch-micros timestamps), producing garbage
    Morton keys with no signal (r7 ADVICE) — the decimal product is
    exact to 38 digits and ``div`` truncates it back to a ≤16-bit
    BIGINT."""
    base = df.withColumn("_zx", x_col.cast("long")).withColumn(
        "_zy", y_col.cast("long")
    )
    if not keep_nulls:
        base = base.filter(
            F.col("_zx").isNotNull() & F.col("_zy").isNotNull()
        )
    stats = base.agg(
        F.min("_zx").alias("_mnx"),
        F.max("_zx").alias("_mxx"),
        F.min("_zy").alias("_mny"),
        F.max("_zy").alias("_mxy"),
    )
    j = base.crossJoin(F.broadcast(stats))
    xn = F.expr(
        f"CAST(_zx - _mnx AS DECIMAL(38,0)) * {MAX_N}"
        " div greatest(CAST(_mxx - _mnx AS DECIMAL(38,0)), 1)"
    )
    yn = F.expr(
        f"CAST(_zy - _mny AS DECIMAL(38,0)) * {MAX_N}"
        " div greatest(CAST(_mxy - _mny AS DECIMAL(38,0)), 1)"
    )
    z = _interleave(xn, yn)
    if keep_nulls:
        z = F.when(
            F.col("_zx").isNotNull() & F.col("_zy").isNotNull(), z
        ).otherwise(F.lit(-1).cast("long"))
    return j.withColumn(out, z).drop(
        "_zx", "_zy", "_mnx", "_mxx", "_mny", "_mxy"
    )


def zorder_layout(orders: DataFrame) -> DataFrame:
    """Layout diagnostic over orders z-ordered on (o_custkey,
    o_orderdate): one row per occupied 256-cell Morton bucket —
    (bucket, n_rows, min_custkey, max_custkey, min_odate, max_odate).

    The hash-checkable pruning evidence: each bucket's (custkey ×
    date) extent is a small rectangle of the global domain, so a
    filter on EITHER dimension selects few buckets — what parquet
    footer min/max pruning sees after `write_zordered`."""
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    keyed = with_zorder_key(orders, F.col("o_custkey"), days)
    return (
        keyed.groupBy(
            F.shiftright(F.col("z"), BUCKET_SHIFT).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").cast("long").alias("min_custkey"),
            F.max("o_custkey").cast("long").alias("max_custkey"),
            F.min("o_orderdate").alias("min_odate"),
            F.max("o_orderdate").alias("max_odate"),
        )
        .orderBy("bucket")
    )


def write_zordered(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    path: str,
    n_files: int = 64,
) -> None:
    """Materialize ``df`` z-ordered on (x, y): Morton key →
    repartitionByRange(n_files) → sortWithinPartitions → parquet.
    Contiguous z-ranges per file ⇒ narrow per-file min/max footer
    stats on BOTH source dimensions (the pruning contract
    `zorder_layout` quantifies; test asserts per-partition extents
    shrink vs the unordered layout).

    NULL-keyed rows are KEPT under the sentinel z = −1 (they sort
    into the first file(s)): a layout rewrite that silently drops
    data is corruption, not optimization (r7 ADVICE; Delta/Iceberg
    ZORDER keeps them too).  The NULL-drop stays on the diagnostic
    path only."""
    keyed = with_zorder_key(df, x_col, y_col, keep_nulls=True)
    (
        keyed.repartitionByRange(n_files, F.col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def oracle_zorder_layout_sql(table: str = "orders") -> str:
    x = "CAST(o_custkey AS BIGINT)"
    y = "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
    z = _sql_interleave("xn", "yn")
    return f"""
        WITH base AS (
            SELECT o_custkey, o_orderdate,
                   {x} AS zx, {y} AS zy
            FROM {table}
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        ),
        stats AS (
            SELECT MIN(zx) AS mnx, MAX(zx) AS mxx,
                   MIN(zy) AS mny, MAX(zy) AS mxy
            FROM base
        ),
        keyed AS (
            SELECT o_custkey, o_orderdate,
                   CAST(CAST(zx - mnx AS HUGEINT) * {MAX_N}
                        // GREATEST(CAST(mxx - mnx AS HUGEINT), 1)
                        AS BIGINT) AS xn,
                   CAST(CAST(zy - mny AS HUGEINT) * {MAX_N}
                        // GREATEST(CAST(mxy - mny AS HUGEINT), 1)
                        AS BIGINT) AS yn
            FROM base CROSS JOIN stats
        )
        SELECT CAST({z} >> {BUCKET_SHIFT} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
               CAST(MAX(o_custkey) AS BIGINT) AS max_custkey,
               MIN(o_orderdate) AS min_odate,
               MAX(o_orderdate) AS max_odate
        FROM keyed
        GROUP BY 1
        ORDER BY bucket
    """
