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


def recover_dir(spark: SparkSession, path: str) -> bool:
    """Crash-recovery entry check, usable from READ paths as well as
    the swap itself: if ``path`` is missing but a ``<path>__old``
    aside copy exists (a swap crashed between its two renames), rename
    the copy back into place.  Returns True when a recovery happened.
    Idempotent and cheap (two existence probes) when the store is
    healthy."""
    jvm, fs = hadoop_fs(spark, path)
    p_old = jvm.org.apache.hadoop.fs.Path(path)
    p_aside = jvm.org.apache.hadoop.fs.Path(f"{path}__old")
    if fs.exists(p_aside) and not fs.exists(p_old):
        if not fs.rename(p_aside, p_old):
            raise IOError(f"recover_dir: rename {path}__old -> {path} failed")
        return True
    return False


def swap_dir(spark: SparkSession, path: str, tmp: str, op: str) -> None:
    """Crash-recoverable store swap: rename the live directory aside
    (``<path>__old``), rename the rewritten ``tmp`` into place, then
    delete the aside copy.  Every crash point leaves a recoverable
    copy — before the second rename the data survives at ``__old``
    AND ``tmp``; delete-then-rename had a window where a crash
    stranded the only copy at ``tmp``.  Recovery is AUTOMATIC (r12,
    ADVICE r11): a crash between the two renames leaves nothing live
    at ``path`` — on entry, if ``path`` is missing but ``<path>__old``
    exists, the aside copy is renamed back into place before
    proceeding, so the next run (and any read in between that calls
    ``recover_dir``) sees the pre-swap store.  A stale ``__old`` is
    cleared only when a live directory at ``path`` supersedes it."""
    jvm, fs = hadoop_fs(spark, path)
    p_old = jvm.org.apache.hadoop.fs.Path(path)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_aside = jvm.org.apache.hadoop.fs.Path(f"{path}__old")
    # prior run crashed between its two renames: put the aside copy
    # back so this swap starts from the pre-crash live store (it is
    # about to be re-renamed aside anyway, but a failure below must
    # leave a servable ``path``); a stale aside next to a LIVE path
    # is superseded and cleared
    if not recover_dir(spark, path) and fs.exists(p_aside):
        fs.delete(p_aside, True)
    if fs.exists(p_old) and not fs.rename(p_old, p_aside):
        raise IOError(f"{op}: rename {path} -> {path}__old failed")
    if not fs.rename(p_tmp, p_old):
        raise IOError(f"{op}: rename {tmp} -> {path} failed")
    fs.delete(p_aside, True)
