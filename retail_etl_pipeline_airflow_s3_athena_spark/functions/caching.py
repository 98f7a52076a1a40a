"""Cache-ownership contract for operators that persist shared
intermediates.

Several operators (``dedup.near_dup_pairs``, ``dedup.lsh_candidate_pairs``,
``dedup.blocked_jaccard_pairs``) persist an intermediate table that
feeds multiple branches of the returned (lazy) plan — the persist is
what makes the shared table compute once instead of once per branch
when the caller finally runs an action.  Unpersisting before returning
would defeat that, so ownership transfers to the caller instead:

- the operator tags the returned DataFrame with its cached
  dependencies via :func:`attach_cached_deps`;
- the caller, after materializing the result (collect/write/count),
  calls :func:`release_cached` to free the executor storage memory.

Long-lived sessions (services, notebooks) MUST release; batch jobs
that exit immediately may skip it (the JVM teardown frees the blocks).
``release_cached`` is a no-op on DataFrames with no tagged deps, so
callers can apply it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_spark_graft_cached_deps"


def attach_cached_deps(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Tag ``result`` with persisted upstream DataFrames the caller
    must release once the result has been materialized."""
    existing = getattr(result, _ATTR, ())
    setattr(result, _ATTR, tuple(existing) + tuple(deps))
    return result


def carried_deps(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persisted deps tagged on ``df`` (empty tuple if none).  Use
    to re-attach ownership when a transformation produces a NEW
    DataFrame — select/withColumnRenamed return fresh Python objects
    that do not carry the tag, so a rename after ``attach_cached_deps``
    would silently leak the persist."""
    return tuple(getattr(df, _ATTR, ()))


def release_cached(result: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cached dependency tagged on ``result``.  Call
    after the result has been materialized; the plan stays valid (a
    later re-run simply recomputes the intermediate)."""
    for dep in getattr(result, _ATTR, ()):
        dep.unpersist(blocking)
    if hasattr(result, _ATTR):
        setattr(result, _ATTR, ())
