"""BPE induction: Spark loop vs the pure-Python twin, merge-fold
semantics, and the driver-loop guard.

Reference scope: no tokenizer surface exists in the reference (its
scripts stop at retail aggregates); this is extension coverage for the
training-data pipeline tier, modeled on the reference's own
exact-expectation test style (single known corpus, assert exact rows).
"""

from __future__ import annotations

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import bpe
from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_learn_bpe_matches_python_twin(spark):
    # The canonical Sennrich corpus shape: shared prefixes force a
    # deterministic merge cascade (l+o, lo+w, ...).
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest widest",
    ]
    merges, words = bpe.learn_bpe(_docs(spark, texts), n_merges=10)
    expected, _ = bpe.py_learn_bpe(texts, n_merges=10)
    bpe.release_checkpoint(words)
    assert merges == expected
    assert len(merges) > 3  # the corpus actually sustains a cascade


def test_merge_fold_greedy_left_to_right(spark):
    # 'aaaa</w>' under merge (a,a): greedy scan yields [aa, aa, </w>],
    # NOT [a, aa, a, </w>] or a re-merged [aaaa] — and pair counting
    # must have seen 3 overlapping (a,a) occurrences to pick it.
    texts = ["aaaa aaaa"]
    merges, words = bpe.learn_bpe(
        _docs(spark, texts), n_merges=1, min_pair_freq=1
    )
    rows = words.collect()
    bpe.release_checkpoint(words)
    assert merges[0][:2] == ("a", "a")
    assert merges[0][2] == 6  # 3 overlapping pairs x freq 2
    assert rows[0]["syms"] == ["aa", "aa", bpe.EOW]


def test_bpe_doc_tokens_accounting(spark):
    texts = ["low low lower", "newest low"]
    out = bpe.bpe_doc_tokens(_docs(spark, texts), n_merges=5)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in out.collect()}
    release_cached(out)
    _, syms = bpe.py_learn_bpe(texts, n_merges=5)
    pieces = {w: len(s) for w, s in syms.items()}
    assert got == {
        0: (3, 2 * pieces["low"] + pieces["lower"]),
        1: (2, pieces["newest"] + pieces["low"]),
    }


def test_bpe_encode_docs_roundtrip(spark):
    """token_ids decode back to the twin's segmentation in order:
    ids are dense 1..V in piece string order, sequences concatenate
    per-word pieces left to right."""
    texts = ["low low lower", "newest low widest"]
    out = bpe.bpe_encode_docs(_docs(spark, texts), n_merges=6)
    rows = {r["doc_id"]: r for r in out.collect()}
    release_cached(out)
    _, syms = bpe.py_learn_bpe(texts, n_merges=6)
    vocab = {p: i + 1 for i, p in enumerate(
        sorted({p for s in syms.values() for p in s})
    )}
    for doc_id, text in enumerate(texts):
        expected = [
            vocab[p] for w in text.split() for p in syms[w]
        ]
        assert rows[doc_id]["token_ids"] == expected
        assert rows[doc_id]["n_tokens"] == len(expected)


def test_min_pair_freq_stops_early(spark):
    # Every word unique, every char pair hapax -> zero merges at the
    # default min_pair_freq=2.
    merges, words = bpe.learn_bpe(_docs(spark, ["ab cd ef"]), n_merges=8)
    bpe.release_checkpoint(words)
    assert merges == []


def test_max_merges_guard(spark):
    with pytest.raises(ValueError, match="MAX_MERGES"):
        bpe.learn_bpe(_docs(spark, ["a b"]), n_merges=bpe.MAX_MERGES + 1)
