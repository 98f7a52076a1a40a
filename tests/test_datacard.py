"""Data-card semantics on a constructed corpus with known duplicates,
languages, and quality levels.

Reference scope: the reference's data_quality.py is per-COLUMN
null/dup counts; the corpus-level datasheet is extension coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import datacard

GOOD_EN = (
    "the project is a long document and it is written in the english "
    "language so the quality of the text is high and the score is good "
    "because it has many tokens and a natural stopword density in it "
    "the end of the story is that it passes the bar easily every time"
)


def test_card_on_constructed_corpus(spark):
    rows = [
        # src_a: 4 docs — one exact dup pair (after lower/trim), all en
        (0, "src_a", GOOD_EN),
        (1, "src_a", "The Quick Brown fox  "),
        (2, "src_a", "the quick brown fox"),
        (3, "src_a", "!!! ??? ###"),
        # src_b: 2 docs — one French, one English
        (4, "src_b", "le chat est dans la maison et le chien est que"),
        (5, "src_b", GOOD_EN),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING"
    )
    out = {r["source"]: r for r in datacard.data_card(docs).collect()}
    a, b = out["src_a"], out["src_b"]
    assert a["n_docs"] == 4
    # "The Quick Brown fox  " and "the quick brown fox" share an md5
    # after lower+trim
    assert a["exact_dup_docs"] == 1
    assert b["exact_dup_docs"] == 0
    # src_b splits 1 fr / 1 en -> tie broken alphabetically = en
    assert b["top_lang"] == "en" and b["top_lang_e6"] == 500_000
    assert a["top_lang"] == "en"
    # only GOOD_EN clears the 0.5 quality bar in src_a (1/4); src_b 1/2
    assert a["quality_pass_e6"] == 250_000
    assert b["quality_pass_e6"] == 500_000
    # volume columns are plain sums
    assert a["n_tokens"] == sum(
        len(t.split()) for _, s, t in rows if s == "src_a"
    )
    assert a["avg_doc_tokens_e2"] == 100 * a["n_tokens"] // 4


def test_card_empty_and_null(spark):
    empty = spark.createDataFrame(
        [], "doc_id LONG, source STRING, text STRING"
    )
    assert datacard.data_card(empty).count() == 0
    nulls = spark.createDataFrame(
        [(1, "s", None), (2, "s", GOOD_EN)],
        "doc_id LONG, source STRING, text STRING",
    )
    row = datacard.data_card(nulls).collect()[0]
    assert row["n_docs"] == 1  # NULL text dropped
