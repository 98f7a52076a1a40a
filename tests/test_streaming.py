"""Structured Streaming stages over the events fixture (file source,
AvailableNow trigger, memory/parquet sinks)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import events as event_ops
from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers
from retail_etl_pipeline_airflow_s3_athena_spark.streaming import incremental


@pytest.fixture(scope="module")
def events_dir(sf_dir):
    # streaming file sources watch a DIRECTORY; stage the fixture file
    d = tempfile.mkdtemp(prefix="events_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def events_stream(spark, events_dir):
    return incremental.stream_events(spark, events_dir)


def test_silver_stream_writes_partitioned_parquet(spark, events_dir, events_stream):
    out = tempfile.mkdtemp(prefix="silver_stream_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = incremental.silver_stream(events_stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert "date" in got.columns  # hive-partitioned by event date
    assert got.filter(F.col("value").isNull()).count() == 0

    # exactly-once: a second AvailableNow run over the same input is a no-op
    q2 = incremental.silver_stream(
        incremental.stream_events(spark, events_dir), out, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 1000


def test_windowed_stream_matches_batch(spark, sf_dir, events_stream):
    agg = incremental.windowed_stream(events_stream)
    incremental.run_to_memory(agg, "win_out", output_mode="complete")
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in event_ops.windowed_event_stats(
            readers.read_events(spark, sf_dir)
        ).collect()
    }
    assert streamed == batch  # same window semantics, streaming vs batch


def test_stateful_sessions_match_batch(spark, sf_dir):
    # multiple source files -> multiple micro-batches -> the watermark
    # advances between batches and event-time timeouts actually fire
    from pyspark.sql import types as T

    d = tempfile.mkdtemp(prefix="events_multi_")
    # 4 chronological chunks so files stream in (roughly) event-time
    # order and the watermark advances between micro-batches; ts is
    # written as a plain (LTZ/UTC) timestamp so no conversion on read
    readers.read_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn(
        "part", ((F.dayofmonth("ts") - 1) / 8).cast("int")
    ).coalesce(1).write.partitionBy("part").parquet(f"{d}/out")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
            T.StructField("part", T.IntegerType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/out")
        .drop("part")
    )
    sessions = incremental.stateful_sessions(stream)
    incremental.run_to_memory(sessions, "sess_out")
    emitted = spark.sql("SELECT * FROM sess_out").collect()
    assert len(emitted) > 0
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in event_ops.sessionize(
            readers.read_events(spark, sf_dir)
        ).collect()
    }
    # every emitted (closed) session must exactly match a batch session
    for r in emitted:
        key = (r["user_id"], r["session_start"])
        assert key in batch, f"streamed session {key} not found in batch"
        b = batch[key]
        assert r["n_events"] == b["n_events"]
        assert r["session_end"] == b["session_end"]


def test_stateful_sessions_golden_equivalence(spark):
    """Deterministic batch-equivalence: with a controlled watermark
    progression, the emitted (closed) session set must EXACTLY equal
    the batch sessionize() sessions that can no longer grow — both
    keys and every aggregate, not just soundness of a sample."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def rows(*evts):
        return pa.table(
            {
                "event_id": pa.array([e[0] for e in evts], pa.int64()),
                "ts": pa.array([e[1] for e in evts], pa.timestamp("us")),
                "user_id": pa.array([e[2] for e in evts], pa.int64()),
                "event_type": pa.array(["click"] * len(evts), pa.string()),
                "value": pa.array([e[3] for e in evts], pa.float64()),
                "props": pa.array(["{}"] * len(evts), pa.string()),
            }
        )

    d = tempfile.mkdtemp(prefix="sess_golden_")
    # f1: user 1 session (2 events, 10 min apart), user 2 session (1 ev)
    pq.write_table(
        rows(
            (1, t0, 1, 2.5),
            (2, t0 + dt.timedelta(minutes=10), 1, 1.5),
            (3, t0 + dt.timedelta(minutes=5), 2, 4.0),
        ),
        f"{d}/f1.parquet",
    )
    # f2/f3: watermark pushers 10 and 20 days later — each advances the
    # watermark far past the f1 sessions' gap horizon, so their
    # event-time timeouts must fire mid-stream
    pq.write_table(
        rows((4, t0 + dt.timedelta(days=10), 99, 0.0)), f"{d}/f2.parquet"
    )
    pq.write_table(
        rows((5, t0 + dt.timedelta(days=20), 99, 0.0)), f"{d}/f3.parquet"
    )
    for i, f in enumerate(["f1", "f2", "f3"]):
        os.utime(f"{d}/{f}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    incremental.run_to_memory(
        incremental.stateful_sessions(stream), "sess_golden_out"
    )
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_golden_out").collect()
    }
    batch_df = event_ops.sessionize(
        spark.read.schema(schema).parquet(d).select(
            "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
    )
    # closed sessions: users 1/2 close via event-time timeout once the
    # pushers advance the watermark; user 99's day-10 session closes
    # in-data when the day-20 event opens a new one.  Only the final
    # day-20 session is still open (nothing advances the watermark past
    # it), so expected = every batch session except that one.
    expected = {
        (r["user_id"],
         r["session_start"].replace(tzinfo=None)
         if r["session_start"].tzinfo else r["session_start"],
         r["session_end"].replace(tzinfo=None)
         if r["session_end"].tzinfo else r["session_end"],
         r["n_events"], r["session_value"])
        for r in batch_df.collect()
    }
    last_open = max(expected, key=lambda t: t[1])
    assert last_open[0] == 99
    expected.discard(last_open)
    normalized = {
        (u,
         s.replace(tzinfo=None) if getattr(s, "tzinfo", None) else s,
         e.replace(tzinfo=None) if getattr(e, "tzinfo", None) else e,
         n, v)
        for (u, s, e, n, v) in emitted
    }
    assert normalized == expected
    # user 1 (n=2, value 4.0), user 2 (n=1), user 99's day-10 session
    assert len(expected) == 3


def test_gold_stream_matches_batch_aggregate(spark, sf_dir, events_dir):
    """Streaming gold maintenance must converge to exactly the batch
    aggregate of everything that has landed."""
    gold_dir = tempfile.mkdtemp(prefix="gold_stream_")
    ckpt = tempfile.mkdtemp(prefix="gold_ckpt_")
    q = incremental.gold_stream(
        incremental.stream_events(spark, events_dir), gold_dir, ckpt
    )
    q.awaitTermination(120)
    streamed = {
        (r["event_date"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(gold_dir).collect()
    }
    batch = {
        (r["event_date"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in readers.read_events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_dedup_stream_drops_duplicates(spark, sf_dir, events_stream):
    deduped = incremental.dedup_stream(events_stream)
    incremental.run_to_memory(deduped, "dedup_out")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").first()["n"]
    n_src = readers.read_events(spark, sf_dir).count()
    distinct_ids = (
        readers.read_events(spark, sf_dir).select("event_id").distinct().count()
    )
    assert n == distinct_ids <= n_src


def test_hash_sample_is_streaming_safe(spark, sf_dir, events_stream):
    """Content-hash sampling is a stateless filter, so it runs
    unchanged under Structured Streaming AND selects exactly the same
    rows as the batch plan — the property that lets one sampling
    definition govern both the backfill and the live pipeline."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.sampling import hash_sample

    sampled = hash_sample(events_stream, ["event_id"], 0.2).select("event_id")
    incremental.run_to_memory(sampled, "sample_out", output_mode="append")
    streamed = {
        r["event_id"] for r in spark.sql("SELECT * FROM sample_out").collect()
    }
    batch = {
        r["event_id"]
        for r in hash_sample(
            readers.read_events(spark, sf_dir), ["event_id"], 0.2
        ).select("event_id").collect()
    }
    assert streamed == batch
    assert 0 < len(batch) < 1000


def test_near_dup_stream_matches_full_self_join(spark):
    """Union of per-batch pair emissions == the full-corpus self-join
    pair set, with identical jaccard values (df cap never binds on the
    tiny corpus, so jaccard is pure set overlap — corpus-independent)."""
    from pyspark.sql import Row

    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    variant = base + " indeed"
    other = "completely different text about spark structured streaming state"
    docs1 = [
        Row(doc_id=0, text=base, lang="en", source="a", n_chars=len(base)),
        Row(doc_id=1, text=other, lang="en", source="a", n_chars=len(other)),
        Row(doc_id=2, text=base, lang="en", source="b", n_chars=len(base)),
    ]
    docs2 = [
        Row(doc_id=10, text=variant, lang="en", source="b", n_chars=len(variant)),
        Row(doc_id=11, text=other + " with a twist at the end", lang="en",
            source="a", n_chars=0),
        Row(doc_id=12, text=base, lang="en", source="c", n_chars=len(base)),
    ]
    src = tempfile.mkdtemp(prefix="docs_src_")
    work = tempfile.mkdtemp(prefix="neardup_stream_")
    spark.createDataFrame(docs1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(docs2).coalesce(1).write.mode("append").parquet(src)

    q = incremental.near_dup_stream(spark, src, work, threshold=0.3)
    q.awaitTermination(180)

    got = {
        (max(r["new_doc_id"], r["old_doc_id"]),
         min(r["new_doc_id"], r["old_doc_id"])): r["jaccard"]
        for r in spark.read.parquet(f"{work}/pairs").collect()
    }
    full = spark.createDataFrame(docs1 + docs2)
    ref_df = dedup.near_dup_pairs(full, threshold=0.3)
    ref = {
        (max(r["doc_a"], r["doc_b"]), min(r["doc_a"], r["doc_b"])): r["jaccard"]
        for r in ref_df.collect()
    }
    release_cached(ref_df)
    assert got == ref
    assert got, "expected near-dup pairs in the constructed corpus"
    # corpus sink accumulated every batch exactly once
    assert spark.read.parquet(f"{work}/corpus").count() == 6


def test_hll_sketch_stream_matches_batch(spark, sf_dir, events_dir):
    """Streaming register deltas max-merge to EXACTLY the batch sketch
    (the mergeable-sketch law), in multiple micro-batches."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.functions import sketches

    work = tempfile.mkdtemp(prefix="hll_stream_")
    # split the fixture into several files so availableNow runs >1 batch
    ev = readers.read_events(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="hll_src_")
    ev.repartition(5).write.mode("overwrite").parquet(src)

    q = incremental.hll_sketch_stream(spark, src, work)
    q.awaitTermination(120)
    n_batches = len(
        [f for f in os.listdir(os.path.join(work, "ckpt", "commits")) if not f.startswith(".")]
    )
    assert n_batches >= 2, "fixture must stream as multiple micro-batches"

    got = {
        r["event_type"]: r["est_distinct"]
        for r in incremental.hll_stream_estimates(spark, work).collect()
    }
    want = {
        r["event_type"]: r["est_distinct"]
        for r in sketches.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    assert got == want


def test_attribution_stream_matches_batch_interval_join(spark, sf_dir, events_dir):
    """Stream-stream interval join (click -> purchase attribution)
    emits exactly the batch join's pairs."""
    a = incremental.stream_events(spark, events_dir)
    b = incremental.stream_events(spark, events_dir)
    q = incremental.run_to_memory(
        incremental.attribution_stream(a, b), "attr_out"
    )
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }

    ev = readers.read_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in clicks.join(
            purchases,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_scd2_stream_matches_sequential_batch_merges(spark):
    """Two update files streamed with maxFilesPerTrigger=1 produce the
    same dimension as two sequential batch scd2_merge calls."""
    import os
    import time

    from pyspark.sql import Row, types as T

    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import scd

    schema = T.StructType(
        [
            T.StructField("cust_id", T.LongType()),
            T.StructField("segment", T.StringType()),
        ]
    )
    src = tempfile.mkdtemp(prefix="scd2_src_")
    work = tempfile.mkdtemp(prefix="scd2_stream_")
    b0 = [Row(cust_id=1, segment="bronze"), Row(cust_id=2, segment="silver")]
    b1 = [Row(cust_id=1, segment="gold"), Row(cust_id=3, segment="bronze")]
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(f"{src}/b0")
    for f in os.listdir(f"{src}/b0"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b0/{f}", f"{src}/u0.parquet")
    time.sleep(1.1)  # file-stream ordering is by modification time
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{src}/b1")
    for f in os.listdir(f"{src}/b1"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b1/{f}", f"{src}/u1.parquet")

    q = incremental.scd2_stream(
        spark, src, work, "cust_id", ["segment"], schema
    )
    q.awaitTermination(120)
    got = {
        (r["cust_id"], r["segment"], str(r["effective_from"]),
         str(r["effective_to"]), r["is_current"])
        for r in spark.read.parquet(f"{work}/dim").collect()
    }

    empty = spark.createDataFrame(
        [],
        T.StructType(
            schema.fields
            + [
                T.StructField("effective_from", T.DateType()),
                T.StructField("effective_to", T.DateType()),
                T.StructField("is_current", T.BooleanType()),
            ]
        ),
    )
    m1 = scd.scd2_merge(
        empty, spark.createDataFrame(b0, schema), "cust_id", ["segment"],
        "2024-01-01",
    )
    m2 = scd.scd2_merge(
        m1, spark.createDataFrame(b1, schema), "cust_id", ["segment"],
        "2024-01-02",
    )
    want = {
        (r["cust_id"], r["segment"], str(r["effective_from"]),
         str(r["effective_to"]), r["is_current"])
        for r in m2.collect()
    }
    release_cached(m1)
    release_cached(m2)
    assert got == want
    # the closed v1 row and the live v2 row for cust 1 both exist
    assert (1, "bronze", "2024-01-01", "2024-01-02", False) in got
    assert (1, "gold", "2024-01-02", "None", True) in got


def test_dq_monitor_stream_totals_match_batch(spark, sf_dir):
    """Per-batch metric rows sum to the whole-table metrics."""
    import os

    ev = readers.read_events(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="dq_src_")
    ev.repartition(5).write.mode("overwrite").parquet(src)
    work = tempfile.mkdtemp(prefix="dq_mon_")
    q = incremental.dq_monitor_stream(spark, src, work)
    q.awaitTermination(120)
    m = spark.read.parquet(os.path.join(work, "metrics"))
    agg = m.agg(
        F.sum("n_rows"), F.sum("n_null_values"), F.sum("n_negative_values")
    ).first()
    want = ev.agg(
        F.count(F.lit(1)),
        F.sum(F.col("value").isNull().cast("long")),
        F.sum((F.col("value") < 0).cast("long")),
    ).first()
    assert (agg[0], agg[1], agg[2]) == (want[0], want[1], want[2] or 0)
    assert m.count() >= 2  # multiple micro-batches each left a row


def test_versioned_sink_time_travel_and_register_compaction(spark, sf_dir):
    """read_version addresses the previous SCD2 state; compacting the
    HLL register sink changes file counts, never estimates."""
    import os

    from pyspark.sql import Row, types as T

    from retail_etl_pipeline_airflow_s3_athena_spark.functions import sketches

    # --- versioned sink time travel (reuse the scd2 stream shape) ----
    schema = T.StructType(
        [
            T.StructField("cust_id", T.LongType()),
            T.StructField("segment", T.StringType()),
        ]
    )
    src = tempfile.mkdtemp(prefix="tt_src_")
    work = tempfile.mkdtemp(prefix="tt_work_")
    spark.createDataFrame([Row(cust_id=1, segment="bronze")], schema)\
        .coalesce(1).write.mode("overwrite").parquet(f"{src}/a")
    for f in os.listdir(f"{src}/a"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/a/{f}", f"{src}/u0.parquet")
    import time as _t
    _t.sleep(1.1)
    spark.createDataFrame([Row(cust_id=1, segment="gold")], schema)\
        .coalesce(1).write.mode("overwrite").parquet(f"{src}/b")
    for f in os.listdir(f"{src}/b"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/b/{f}", f"{src}/u1.parquet")
    q = incremental.scd2_stream(spark, src, work, "cust_id", ["segment"], schema)
    q.awaitTermination(120)
    dim = f"{work}/dim"
    vs = incremental.list_versions(dim)
    assert len(vs) >= 2
    v0 = incremental.read_version(spark, dim, vs[0]).collect()
    latest = incremental.read_version(spark, dim).collect()
    assert {r["segment"] for r in v0 if r["is_current"]} == {"bronze"}
    assert {r["segment"] for r in latest if r["is_current"]} == {"gold"}

    # --- register compaction preserves estimates ---------------------
    ev = readers.read_events(spark, sf_dir)
    hwork = tempfile.mkdtemp(prefix="hll_c_")
    src2 = tempfile.mkdtemp(prefix="hll_c_src_")
    ev.repartition(4).write.mode("overwrite").parquet(src2)
    q2 = incremental.hll_sketch_stream(spark, src2, hwork)
    q2.awaitTermination(120)
    before = {
        r["event_type"]: r["est_distinct"]
        for r in incremental.hll_stream_estimates(spark, hwork).collect()
    }
    n = incremental.compact_registers(spark, hwork)
    after = {
        r["event_type"]: r["est_distinct"]
        for r in incremental.hll_stream_estimates(spark, hwork).collect()
    }
    assert before == after and n <= 5 * 256


def test_compact_registers_refuses_while_stream_active(spark, sf_dir):
    """The stream-active lock (ADVICE r5): compaction run concurrently
    with hll_sketch_stream could delete deltas appended in its
    two-rename window — it must refuse while the stream's query id is
    live, and clear a stale lock from a terminated stream."""
    import os

    import pytest as _pytest

    ev = readers.read_events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="hll_lock_")
    src = tempfile.mkdtemp(prefix="hll_lock_src_")
    ev.repartition(2).write.mode("overwrite").parquet(src)
    q = incremental.hll_sketch_stream(spark, src, work)
    lock = os.path.join(work, "stream.active")
    try:
        # while the query is registered as active, compaction refuses
        if any(str(a.id) == str(q.id) for a in spark.streams.active):
            with _pytest.raises(RuntimeError, match="stop the stream"):
                incremental.compact_registers(spark, work)
    finally:
        q.awaitTermination(120)
    # terminated stream: even if the cleanup thread lost the race and
    # the lock file is still present, compaction treats it as stale
    with open(lock, "w") as fh:
        fh.write(f"hll_sketch_stream:{q.id}")
    n = incremental.compact_registers(spark, work)
    assert n > 0
    assert not os.path.exists(lock)


def test_versioned_overwrite_never_reuses_live_dir(spark, tmp_path):
    """Crash-replay safety (ADVICE r5): re-running a batch id whose
    version dir is the LIVE symlink target must write to a fresh
    suffixed dir, never overwrite the directory being read."""
    import os

    target = str(tmp_path / "dim")
    df1 = spark.range(5).toDF("k")
    incremental._versioned_overwrite(df1, target, batch_id=3)
    live_before = os.path.realpath(target)
    assert live_before.endswith(".v3")
    # simulate checkpoint-less replay of the same batch id
    df2 = spark.range(9).toDF("k")
    incremental._versioned_overwrite(df2, target, batch_id=3)
    live_after = os.path.realpath(target)
    assert live_after != live_before, "replay reused the live version dir"
    assert live_after.endswith(".v3r1")
    assert spark.read.parquet(target).count() == 9


def test_versioned_overwrite_uri_pointer_commit(spark, tmp_path):
    """URI targets (no POSIX rename): the ._CURRENT pointer-file scheme
    must give the same never-see-partial guarantee as the symlink swap
    — exercised through Hadoop's file:// FileSystem, the same API an
    s3a:// deployment hits."""
    target = f"file://{tmp_path}/gold_uri"
    df1 = spark.range(5).toDF("k")
    incremental._versioned_overwrite(df1, target, batch_id=1)
    assert incremental.resolve_table_dir(spark, target).endswith(".v1")
    assert incremental.read_table(spark, target).count() == 5

    # a fully-written new version flips the pointer...
    df2 = spark.range(9).toDF("k")
    incremental._versioned_overwrite(df2, target, batch_id=2)
    assert incremental.resolve_table_dir(spark, target).endswith(".v2")
    assert incremental.read_table(spark, target).count() == 9
    # ...and retention kept the immediately-previous version
    import os
    siblings = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("gold_uri.v")
    )
    assert siblings == ["gold_uri.v1", "gold_uri.v2"]

    # simulated writer crash: version dir written, pointer NOT flipped
    # -> a concurrent reader still resolves the old complete version
    df3 = spark.range(2).toDF("k")
    df3.write.parquet(f"file://{tmp_path}/gold_uri.v3")
    assert incremental.resolve_table_dir(spark, target).endswith(".v2")
    assert incremental.read_table(spark, target).count() == 9

    # crash-replay of batch 3: the half-written v3 dir exists, so the
    # retried batch takes a fresh r1 suffix and commits atomically
    incremental._versioned_overwrite(df3, target, batch_id=3)
    assert incremental.resolve_table_dir(spark, target).endswith(".v3r1")
    assert incremental.read_table(spark, target).count() == 2


def test_resolve_table_dir_posix_passthrough(spark, tmp_path):
    target = str(tmp_path / "plain")
    spark.range(3).toDF("k").write.parquet(target)
    assert incremental.resolve_table_dir(spark, target) == target
    assert incremental.read_table(spark, target).count() == 3


def test_dsir_stat_stream_matches_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Streaming DSIR count deltas: (1) SUM-merged stream stats ==
    one-pass batch stats; (2) stream-scored importance == batch
    importance; (3) a crash-REPLAYED batch overwrites its own delta
    (deterministic per-batch path) instead of double-counting."""
    from pyspark.sql import functions as F

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import dsir
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    staged = docs.select(
        "doc_id", "text", (F.col("lang") == "en").alias("tgt")
    )
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    staged.repartition(4).write.parquet(src)
    q = incremental.dsir_stat_stream(spark, src, work)
    q.awaitTermination(120)

    got_stats = {
        r["bucket"]: (r["cs"], r["ct"])
        for r in incremental.dsir_stream_stats(spark, work).collect()
    }
    flat = dsir._flat_buckets(staged, F.col("tgt"), "text", "doc_id")
    want_stats = {
        r["bucket"]: (r["cs"], r["ct"])
        for r in dsir.bucket_stats(flat).collect()
    }
    assert got_stats == want_stats

    stream_imp = incremental.dsir_stream_importance(spark, work, docs)
    batch_imp = dsir.dsir_importance(docs, F.col("lang") == "en")
    assert sorted(map(tuple, stream_imp.collect())) == sorted(
        map(tuple, batch_imp.collect())
    )

    # simulate checkpoint-less replay of batch 0: same batch_id, same
    # data -> the delta path is overwritten, stats unchanged
    import os
    b0 = spark.read.parquet(src + "/" + sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )[0])
    st = dsir.bucket_stats(
        dsir._flat_buckets(b0, F.col("tgt"), "text", "doc_id")
    )
    st.write.mode("overwrite").parquet(os.path.join(work, "deltas", "batch=0"))
    replayed = {
        r["bucket"]: (r["cs"], r["ct"])
        for r in incremental.dsir_stream_stats(spark, work).collect()
    }
    assert replayed == want_stats


def test_cms_sketch_stream_matches_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Streaming CMS cell deltas: (1) SUM-merged stream sketch ==
    one-pass batch sketch; (2) stream-probed heavy hitters == batch
    cms_heavy_hitters; (3) a crash-REPLAYED batch overwrites its own
    delta (deterministic per-batch path) instead of double-counting."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.functions import sketches
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    staged = docs.select("doc_id", "source", "text")
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    staged.repartition(4).write.parquet(src)
    q = incremental.cms_sketch_stream(spark, src, work)
    q.awaitTermination(120)
    n_batches = len(
        [f for f in os.listdir(os.path.join(work, "cells")) if f.startswith("batch=")]
    )
    assert n_batches >= 2, "fixture must stream as multiple micro-batches"

    got = {
        (r["j"], r["c"]): r["cnt"]
        for r in incremental.cms_stream_sketch(spark, work).collect()
    }
    want = {
        (r["j"], r["c"]): r["cnt"]
        for r in sketches.cms_sketch(staged).collect()
    }
    assert got == want

    stream_hh = incremental.cms_stream_heavy_hitters(spark, work, docs)
    batch_hh = sketches.cms_heavy_hitters(docs)
    assert sorted(map(tuple, stream_hh.collect())) == sorted(
        map(tuple, batch_hh.collect())
    )

    # simulate checkpoint-less replay of batch 0: a replayed batch
    # recomputes the IDENTICAL delta (cms_sketch is deterministic) and
    # lands it at the SAME batch=0 path with overwrite — total sketch
    # unchanged, where an append-mode sink would double-count
    b0_path = os.path.join(work, "cells", "batch=0")
    delta0 = spark.createDataFrame(
        spark.read.parquet(b0_path).collect(), "j INT, c LONG, cnt LONG"
    )
    delta0.write.mode("overwrite").parquet(b0_path)
    replayed = {
        (r["j"], r["c"]): r["cnt"]
        for r in incremental.cms_stream_sketch(spark, work).collect()
    }
    assert replayed == want


def test_psi_count_stream_matches_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Streaming PSI count deltas: (1) SUM-merged stream rollup ==
    one-pass batch psi_period_counts; (2) stream-scored PSI == batch
    snapshot_value_psi; (3) a crash-REPLAYED batch overwrites its own
    delta (deterministic per-batch path) instead of double-counting."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import drift
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    events = readers.read_events(spark, sf_dir)
    staged = events.select("event_id", "ts", "event_type", "value")
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    staged.repartition(4).write.parquet(src)
    q = incremental.psi_count_stream(spark, src, work)
    q.awaitTermination(120)
    n_batches = len(
        [
            f
            for f in os.listdir(os.path.join(work, "counts"))
            if f.startswith("batch=")
        ]
    )
    assert n_batches >= 2, "fixture must stream as multiple micro-batches"

    key = lambda r: (r["event_type"], r["bucket"])  # noqa: E731
    got = {
        key(r): (r["o1"], r["o2"])
        for r in incremental.psi_stream_counts(spark, work).collect()
    }
    want = {
        key(r): (r["o1"], r["o2"])
        for r in drift.psi_period_counts(staged).collect()
    }
    assert got == want

    stream_psi = incremental.psi_stream_scores(
        spark, work, events.select("event_type")
    )
    batch_psi = drift.snapshot_value_psi(events)
    assert sorted(map(tuple, stream_psi.collect())) == sorted(
        map(tuple, batch_psi.collect())
    )

    # simulate checkpoint-less replay of batch 0: the recomputed delta
    # lands at the SAME batch=0 path with overwrite — rollup unchanged,
    # where an append-mode sink would double-count
    b0_path = os.path.join(work, "counts", "batch=0")
    delta0 = spark.createDataFrame(
        spark.read.parquet(b0_path).collect(),
        "event_type STRING, bucket LONG, o1 LONG, o2 LONG",
    )
    delta0.write.mode("overwrite").parquet(b0_path)
    replayed = {
        key(r): (r["o1"], r["o2"])
        for r in incremental.psi_stream_counts(spark, work).collect()
    }
    assert replayed == want


def test_chisq_count_stream_matches_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """Streaming chi-square count deltas: SUM-merged stream scores ==
    batch length_drift_chisq; a replayed batch overwrites its own
    delta instead of double-counting."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import drift
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    staged = docs.select("doc_id", "source", "text")
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    staged.repartition(4).write.parquet(src)
    q = incremental.chisq_count_stream(spark, src, work)
    q.awaitTermination(120)
    n_batches = len(
        [
            f
            for f in os.listdir(os.path.join(work, "counts"))
            if f.startswith("batch=")
        ]
    )
    assert n_batches >= 2

    sdf = incremental.chisq_stream_scores(spark, work)
    bdf = drift.length_drift_chisq(docs)
    got, want = sdf.collect(), bdf.collect()
    release_cached(sdf)
    release_cached(bdf)
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    b0 = os.path.join(work, "counts", "batch=0")
    delta0 = spark.createDataFrame(
        spark.read.parquet(b0).collect(), "source STRING, bin LONG, o LONG"
    )
    delta0.write.mode("overwrite").parquet(b0)
    rdf = incremental.chisq_stream_scores(spark, work)
    replayed = rdf.collect()
    release_cached(rdf)
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, want))


def test_kl_count_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming KL unigram-count deltas: SUM-merged stream scores ==
    batch source_token_kl; replayed batch overwrites idempotently."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import drift
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    staged = docs.select("doc_id", "source", "text")
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    staged.repartition(4).write.parquet(src)
    q = incremental.kl_count_stream(spark, src, work)
    q.awaitTermination(120)

    sdf = incremental.kl_stream_scores(spark, work)
    bdf = drift.source_token_kl(docs)
    got, want = sdf.collect(), bdf.collect()
    release_cached(sdf)
    release_cached(bdf)
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    b0 = os.path.join(work, "counts", "batch=0")
    delta0 = spark.createDataFrame(
        spark.read.parquet(b0).collect(), "source STRING, tok STRING, c LONG"
    )
    delta0.write.mode("overwrite").parquet(b0)
    rdf = incremental.kl_stream_scores(spark, work)
    replayed = rdf.collect()
    release_cached(rdf)
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, want))


def test_gold_partials_stream_matches_batch_and_is_state_free(
    spark, sf_dir, tmp_path
):
    """gold_partials_stream end state == batch daily_sales_summary over
    the same rows (partial additivity), with MULTIPLE batch partitions
    in the store (the zero-streaming-state design: each micro-batch
    wrote only its own partial) and idempotent replay of one batch."""
    import os

    from retail_etl_pipeline_airflow_s3_athena_spark.plans import (
        gold,
        goldstore,
        retail_views,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.streaming import incremental

    st = retail_views.sale_transactions(spark, sf_dir)
    src, work = str(tmp_path / "src"), str(tmp_path / "wk")
    st.repartition(4).write.parquet(src)
    q = incremental.gold_partials_stream(spark, src, work, st.schema)
    q.awaitTermination(120)

    partials = os.path.join(work, "partials")
    want = [tuple(r) for r in gold.daily_sales_summary(st).collect()]
    got = [tuple(r) for r in goldstore.serve_gold_daily(spark, partials).collect()]
    assert got == want

    batches = [
        d for d in os.listdir(partials) if d.startswith("batch=")
    ]
    assert len(batches) >= 2, "expected one partial partition per micro-batch"

    # crash-replay of batch 0: rewriting its own partition changes nothing
    b0 = os.path.join(partials, "batch=0")
    rows0 = spark.read.parquet(b0)
    frozen = spark.createDataFrame(rows0.collect(), rows0.schema)
    frozen.write.mode("overwrite").parquet(b0)
    again = [tuple(r) for r in goldstore.serve_gold_daily(spark, partials).collect()]
    assert again == want
