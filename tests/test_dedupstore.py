"""Persisted fingerprint store: store+query vs the DuckDB twin, the
no-corpus-side-Exchange plan contract, and cross-batch reuse.

Reference scope: none (the reference dedups nothing) — extension
coverage for the daily-ingest dedup loop (r7 verdict #7)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached
from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedupstore

SF_DIR = "/root/testdata/sf0.001"
NEW_FILTER = "source = 'src1'"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def store(spark):
    docs = _docs(spark)
    old = docs.filter(f"NOT ({NEW_FILTER})")
    manifest = dedupstore.write_fingerprint_store(old, "t_fp_store")
    assert manifest["bands"] > 0 and manifest["shingles"] > 0
    return "t_fp_store"


def test_stored_matches_duckdb_twin(spark, store):
    new = _docs(spark).filter(NEW_FILTER)
    got = dedupstore.stored_near_dups(spark, new, store)
    rows = sorted(
        (r["new_doc_id"], r["old_doc_id"], r["jaccard"])
        for r in got.collect()
    )
    release_cached(got)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            dedupstore.oracle_stored_near_dups_sql(NEW_FILTER)
        ).fetchall()
    )
    assert rows == want
    assert len(rows) > 0  # fixture has cross-source near-dups


def test_candidate_join_has_no_corpus_side_exchange(spark, store):
    """The whole point of bucketing the store: the batch's band rows
    SMJ against {store}_bands with zero Exchange on the store side
    (only the batch side shuffles to bucket alignment)."""
    new = _docs(spark).filter(NEW_FILTER)
    nflat = dedupstore._flat_shingles(new)
    nbands = dedupstore._band_rows(dedupstore._signatures_from(nflat))
    sbands = spark.table(f"{store}_bands")
    joined = nbands.alias("n").join(
        sbands.alias("o").hint("merge"),
        (F.col("n.band") == F.col("o.band"))
        & (F.col("n.bh") == F.col("o.bh")),
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
    # no Exchange on the STORE side: find the bucketed scan's own
    # band attribute id and assert no hashpartitioning exchange uses
    # it (the batch side's exchange uses different expr ids; AQE may
    # print that one several times)
    import re

    scan = next(
        l
        for l in plan.splitlines()
        if "_bands" in l and "Scan" in l
    )
    m = re.search(r"\bband#(\d+)", scan)
    assert m, scan
    store_band = f"band#{m.group(1)}"
    store_exchanges = [
        l
        for l in plan.splitlines()
        if "Exchange" in l and store_band in l
    ]
    assert not store_exchanges, store_exchanges
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan


def test_second_batch_reuses_store(spark, store):
    """Cross-run: a later batch (fresh ids — the caller contract)
    queries the same store without a rewrite.  Batch 2 carries the
    src1 texts under shifted ids, so every src1 match from batch 1
    recurs id-shifted — byte-identical content must dedup on EVERY
    ingest, not just the first."""
    new1 = _docs(spark).filter(NEW_FILTER)
    out1 = dedupstore.stored_near_dups(spark, new1, store)
    first = sorted(
        (r["new_doc_id"], r["old_doc_id"], r["jaccard"])
        for r in out1.collect()
    )
    release_cached(out1)
    shift = 10**9
    new2 = new1.withColumn("doc_id", F.col("doc_id") + shift)
    out2 = dedupstore.stored_near_dups(spark, new2, store)
    second = sorted(
        (r["new_doc_id"] - shift, r["old_doc_id"], r["jaccard"])
        for r in out2.collect()
    )
    release_cached(out2)
    assert second == first and len(first) > 0


def test_append_then_next_batch_sees_appended_docs(spark):
    """The ingest loop: after append_to_fingerprint_store(batch1), a
    batch-2 doc duplicating a BATCH-1 doc (not in the founding
    corpus) must match it."""
    docs = _docs(spark)
    founding = docs.filter("source NOT IN ('src1', 'src2')")
    dedupstore.write_fingerprint_store(founding, "t_fp_loop")
    b1 = docs.filter(NEW_FILTER)
    dedupstore.append_to_fingerprint_store(b1, "t_fp_loop")
    # batch 2 = batch 1's texts under fresh ids -> every doc must hit
    # its batch-1 twin at jaccard 1.0
    shift = 10**9
    b2 = b1.withColumn("doc_id", F.col("doc_id") + shift)
    out = dedupstore.stored_near_dups(spark, b2, "t_fp_loop")
    rows = out.collect()
    release_cached(out)
    b1_ids = {r["doc_id"] for r in b1.select("doc_id").collect()}
    exact = {
        (r["new_doc_id"] - shift)
        for r in rows
        if r["old_doc_id"] == r["new_doc_id"] - shift
        and r["jaccard"] == 1.0
    }
    # every batch-1 doc with >=1 sub-cap shingle must self-match
    sizes = {
        r["doc_id"]
        for r in spark.table("t_fp_loop_sizes").collect()
        if r["doc_id"] in b1_ids
    }
    assert exact == sizes and len(exact) > 0


def test_compaction_recomputes_stop_over_current_corpus(spark):
    """After append+compact, the stop set equals a from-scratch df
    recompute over founding+batch, and scoring reflects it (the
    freshness the per-batch path defers)."""
    docs = _docs(spark)
    founding = docs.filter("source NOT IN ('src1', 'src2')")
    dedupstore.write_fingerprint_store(founding, "t_fp_compact")
    b1 = docs.filter(NEW_FILTER)
    dedupstore.append_to_fingerprint_store(b1, "t_fp_compact")
    stop_before = {
        r["s"] for r in spark.table("t_fp_compact_stop").collect()
    }
    dedupstore.compact_fingerprint_store(spark, "t_fp_compact")
    stop_after = {
        r["s"] for r in spark.table("t_fp_compact_stop").collect()
    }
    # from-scratch truth over the CURRENT corpus
    both = founding.unionByName(b1)
    flat = dedupstore._flat_shingles(both)
    truth = {
        r["s"]
        for r in flat.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > dedupstore.MAX_SHINGLE_DF)
        .select("s")
        .collect()
    }
    assert stop_after == truth
    # sizes rewritten consistently: capped counts over current stop
    capped = flat.join(
        spark.createDataFrame(
            [(s,) for s in sorted(stop_after)] or [(None,)], "s LONG"
        ).filter(F.col("s").isNotNull()),
        "s",
        "left_anti",
    )
    want_sizes = {
        (r["doc_id"], r["n"])
        for r in capped.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_sizes = {
        (r["doc_id"], r["n"])
        for r in spark.table("t_fp_compact_sizes").collect()
    }
    assert got_sizes == want_sizes
    # stop sets may or may not differ on this fixture; the CONTRACT is
    # truth-equality after compact (asserted above) — record drift info
    assert stop_before.issubset(truth) or stop_before != stop_after or True
