"""SparkSession factory with scale-oriented defaults.

The reference pipeline is single-process pandas (no session concept);
this module is the Spark-side replacement for its implicit "runtime":
one place that pins timezone, enables AQE, and sizes shuffles.

Design notes for 100 TB / 1000-executor scale:
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts.
- UTC session timezone: the reference's pandas timestamps are naive;
  pinning UTC makes `to_date`/`to_timestamp` deterministic and matches
  the DuckDB oracle's UTC-naive timestamps.
- shuffle.partitions defaults to the local core count for tests; on a
  real cluster leave AQE's `coalescePartitions` to pick the effective
  number (initialPartitionNum is set high so AQE can only shrink).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "retail-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Determinism / oracle parity
        .config("spark.sql.session.timeZone", "UTC")
        # Local-mode driver IS the executor fleet: the 1g JVM default
        # starves caches/broadcasts long before the machine does.  8g,
        # not bigger: A/B at sf0.1 shows a 32g heap is ~15% SLOWER
        # (longer GC pauses) with identical results.  (No-op if a JVM
        # already exists; the cluster path sets memory via spark-submit.)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        # Adaptive execution: the scale story
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce to the ADVISORY SIZE, not to defaultParallelism:
        # with the default (true), AQE keeps ~core-count partitions
        # even for KB-sized shuffles, so every tiny exchange pays a
        # full fleet of scheduling-overhead tasks.  false is the
        # Spark-documented recommendation ("it's recommended to set
        # this config to false and respect the configured target
        # size"); at-scale shuffles exceed the advisory size and keep
        # full width, so this is not a local-mode tune.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast policy: estimate-driven static broadcasts are OFF —
        # pre-shuffle size estimates under-count exploded/derived tables
        # by orders of magnitude (a mis-broadcast corpus table OOMs the
        # driver at scale).  AQE instead converts shuffle joins to
        # broadcast from MEASURED map-stage output sizes, which is the
        # decision we'd want on a 1000-executor cluster too.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "32m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-UDF path (extensions only; parity needs none)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Nanosecond parquet timestamps (the events fixture) read as long;
        # sources.readers.read_events converts to micros explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet: vectorized reader + pushdown are defaults; keep explicit
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Generated-class cache: the default 100 entries thrashes when a
        # workload cycles through many expression-heavy queries (this
        # engine's unrolled vector math and wide aggregates generate
        # several classes per query) — each revisit then pays a full
        # janino recompile.  Static conf: takes effect at JVM start.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Keep catalog/warehouse artifacts out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"),
        )
        # Quiet progress bars in test output
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
