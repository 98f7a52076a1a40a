"""Crash-recoverable directory swap (functions/fsutil): every crash
point must leave a recoverable copy, and — ADVICE r11 — recovery from
the worst crash point (between the two renames, when nothing is live
at ``path``) must be AUTOMATIC, not a manual rename.

Reference scope: scripts/aws_upload.py's atomic-publish intent,
re-expressed FS-API-only."""

from __future__ import annotations

from retail_etl_pipeline_airflow_s3_athena_spark.functions.fsutil import (
    hadoop_fs,
    recover_dir,
    swap_dir,
)


def _write(spark, path, vals):
    spark.createDataFrame([(v,) for v in vals], ["v"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _vals(spark, path):
    return {r["v"] for r in spark.read.parquet(path).collect()}


def test_swap_dir_happy_path(spark, tmp_path):
    live = str(tmp_path / "store")
    tmp = str(tmp_path / "store__rewrite")
    _write(spark, live, [1, 2])
    _write(spark, tmp, [3, 4])
    swap_dir(spark, live, tmp, "test")
    jvm, fs = hadoop_fs(spark, live)
    assert _vals(spark, live) == {3, 4}
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{live}__old"))
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(tmp))


def test_crash_between_renames_recovers_automatically(spark, tmp_path):
    """Simulate the mid-swap crash: live renamed aside, replacement
    never renamed in.  recover_dir must restore the aside copy; a
    healthy store must be left untouched."""
    live = str(tmp_path / "store")
    _write(spark, live, [1, 2])
    jvm, fs = hadoop_fs(spark, live)
    P = jvm.org.apache.hadoop.fs.Path
    assert fs.rename(P(live), P(f"{live}__old"))  # the crash point

    assert recover_dir(spark, live) is True
    assert _vals(spark, live) == {1, 2}
    assert not fs.exists(P(f"{live}__old"))
    # idempotent on a healthy store
    assert recover_dir(spark, live) is False
    assert _vals(spark, live) == {1, 2}


def test_swap_dir_entry_recovers_then_swaps(spark, tmp_path):
    """A NEW swap arriving after a mid-swap crash must first restore
    the aside copy (so a failure mid-way still leaves a servable
    store), then complete normally — and a STALE aside next to a live
    store is superseded, never restored over it."""
    live = str(tmp_path / "store")
    tmp = str(tmp_path / "store__rewrite")
    _write(spark, live, [1, 2])
    jvm, fs = hadoop_fs(spark, live)
    P = jvm.org.apache.hadoop.fs.Path
    assert fs.rename(P(live), P(f"{live}__old"))  # crashed prior swap
    _write(spark, tmp, [3, 4])
    swap_dir(spark, live, tmp, "test")
    assert _vals(spark, live) == {3, 4}
    assert not fs.exists(P(f"{live}__old"))

    # stale aside + live store: aside is cleared, live wins
    _write(spark, f"{live}__old", [9])
    _write(spark, tmp, [5, 6])
    swap_dir(spark, live, tmp, "test")
    assert _vals(spark, live) == {5, 6}
    assert not fs.exists(P(f"{live}__old"))
