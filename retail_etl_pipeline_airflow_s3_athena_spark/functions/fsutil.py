"""Hadoop-FS helpers shared by the persisted-store tiers (gold store,
ANN index): FS handles and the crash-recoverable directory swap.
FS-API-only — the same calls work on local FS, HDFS, and s3a."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf)


def swap_dir(spark: SparkSession, path: str, tmp: str, op: str) -> None:
    """Crash-recoverable store swap: rename the live directory aside
    (``<path>__old``), rename the rewritten ``tmp`` into place, then
    delete the aside copy.  Every crash point leaves a recoverable
    copy — before the second rename the data survives at ``__old``
    AND ``tmp``; delete-then-rename had a window where a crash
    stranded the only copy at ``tmp``.  A stale ``__old`` from a
    prior crashed run is cleared first (the live directory at
    ``path`` supersedes it)."""
    jvm, fs = hadoop_fs(spark, path)
    p_old = jvm.org.apache.hadoop.fs.Path(path)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_aside = jvm.org.apache.hadoop.fs.Path(f"{path}__old")
    if fs.exists(p_aside):
        fs.delete(p_aside, True)
    if fs.exists(p_old) and not fs.rename(p_old, p_aside):
        raise IOError(f"{op}: rename {path} -> {path}__old failed")
    if not fs.rename(p_tmp, p_old):
        raise IOError(f"{op}: rename {tmp} -> {path} failed")
    fs.delete(p_aside, True)
