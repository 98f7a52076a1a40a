"""Property-based tests (hypothesis) for algebraic equivalences the
engine's optimized formulations rely on."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.skew import salted_join
from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedup

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(texts=doc_strategy)
def test_inverted_index_jaccard_equals_array_form(spark, texts):
    """The flat inverted-index Jaccard (production path) must equal the
    array_intersect formulation for every pair with overlap."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in enumerate(texts)]
    )
    flat_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_pairs(
            docs, block_col="source", threshold=1e-9
        ).collect()
    }
    # array-based reference formulation (empty docs excluded — the
    # production path emits no rows for them, and 0/0 is undefined)
    sh = docs.select(
        "doc_id", F.array_distinct(dedup.shingle_hashes(F.col("text"))).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import dround

    array_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                dround(inter / union, 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") > 0)
            .collect()
        )
    }
    assert flat_pairs == array_pairs


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=0,
        max_size=30,
    )
)
def test_salted_join_equivalence(spark, rows):
    """salted_join must return exactly a plain join's multiset of rows
    for any data and any salt."""
    large = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in rows], schema="k int, v int"
    )
    small = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(4)])
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in large.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(large, small, "k", salt=3).collect()
    )
    assert plain == salted


@settings(max_examples=5, deadline=None)
@given(
    deltas=st.lists(st.integers(1, 4000), min_size=1, max_size=25),
)
def test_sessionize_partitions_events(spark, deltas):
    """Sessions must partition a user's events: counts sum to the total,
    intra-session gaps <= threshold, inter-session gaps > threshold."""
    import datetime as dt

    from retail_etl_pipeline_airflow_s3_athena_spark.operators.events import sessionize

    t = dt.datetime(2024, 1, 1)
    ts = []
    for d in deltas:
        t = t + dt.timedelta(seconds=d)
        ts.append(t)
    events = spark.createDataFrame(
        [
            Row(user_id=1, ts=x, event_id=i, value=1.0, event_type="view")
            for i, x in enumerate(ts)
        ]
    )
    sessions = sorted(
        sessionize(events, gap_seconds=1800).collect(),
        key=lambda r: r["session_start"],
    )
    assert sum(r["n_events"] for r in sessions) == len(ts)
    for r in sessions:
        assert r["session_start"] <= r["session_end"]
    for prev, nxt in zip(sessions, sessions[1:]):
        gap = (nxt["session_start"] - prev["session_end"]).total_seconds()
        assert gap > 1800


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=40).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    max_tokens=st.integers(2, 16),
)
def test_doc_chunks_reassemble_to_original(spark, texts, max_tokens):
    """Concatenating a doc's chunks in chunk_id order must reproduce the
    whitespace-normalized original text; every chunk except the last is
    exactly max_tokens long."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.training import doc_chunks

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    by_doc: dict[int, list] = {}
    for r in doc_chunks(docs, max_tokens=max_tokens).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert " ".join(c["chunk_text"] for c in chunks) == " ".join(t.split())
        for c in chunks[:-1]:
            assert c["n_tokens"] == max_tokens
        assert 1 <= chunks[-1]["n_tokens"] <= max_tokens
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))


@settings(max_examples=5, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=20),
    max_tokens=st.integers(5, 40),
)
def test_pack_sequences_bin_invariants(spark, sizes, max_tokens):
    """Bins are contiguous in doc_id order, every doc appears exactly
    once, and a bin only opens when the previous one has reached the
    target (streaming first-fit: fill < max_tokens implies the NEXT doc
    still joins this bin)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.training import pack_sequences

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, source="s", text=" ".join(["w"] * n))
            for i, n in enumerate(sizes)
        ]
    )
    rows = sorted(
        pack_sequences(docs, max_tokens=max_tokens).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in rows] == list(range(len(sizes)))
    # bin ids are non-decreasing in doc order and start at 0
    bins = [r["bin_id"] for r in rows]
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # first-fit invariant: the bin is the exclusive running total
    # divided by the target — a bin only closes once it reaches it
    for r in rows:
        assert r["bin_id"] == sum(sizes[: r["doc_id"]]) // max_tokens


@settings(max_examples=5, deadline=None)
@given(texts=doc_strategy)
def test_shingle_cap_noop_when_above_corpus_size(spark, texts):
    """A document-frequency cap at or above the corpus size can never
    exclude a shingle (df <= n_docs), so the capped Jaccard must equal
    the uncapped one exactly — the cap only ever removes genuinely
    high-df stop shingles."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in enumerate(texts)]
    )
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_pairs(
            docs, threshold=1e-9, max_df=len(texts)
        ).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_pairs(
            docs, threshold=1e-9, max_df=None
        ).collect()
    }
    assert capped == uncapped


@settings(max_examples=5, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=10**11), min_size=3, max_size=40
    )
)
def test_mad_filter_is_integer_exact_and_order_free(spark, cents):
    """anomalous_revenue_days' n*dev > K*T filter must agree with a
    pure-Python integer re-derivation for ANY cents profile (including
    sf100-scale daily magnitudes, ~1e11), and be invariant to row
    order — the integer arithmetic claim, property-tested."""
    from retail_etl_pipeline_airflow_s3_athena_spark.plans.relational import ANOMALY_K

    n = len(cents)
    s = sum(cents)
    devs = [abs(c * n - s) for c in cents]
    t = sum(devs)
    expect = sorted(
        i for i, d in enumerate(devs) if n * d > ANOMALY_K * t
    )
    df = spark.createDataFrame(
        [Row(day=i, cents=c) for i, c in enumerate(cents)]
    )
    scalars = df.agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    dev = df.crossJoin(scalars).withColumn(
        "dev", F.abs(F.col("cents") * F.col("n") - F.col("s"))
    )
    total = dev.agg(F.sum("dev").alias("t"))
    got = sorted(
        r["day"]
        for r in dev.crossJoin(total)
        .filter(F.col("n") * F.col("dev") > F.lit(ANOMALY_K) * F.col("t"))
        .collect()
    )
    assert got == expect
    # order invariance: reversing input changes nothing
    df2 = spark.createDataFrame(
        [Row(day=i, cents=c) for i, c in reversed(list(enumerate(cents)))]
    )
    scalars2 = df2.agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
    dev2 = df2.crossJoin(scalars2).withColumn(
        "dev", F.abs(F.col("cents") * F.col("n") - F.col("s"))
    )
    total2 = dev2.agg(F.sum("dev").alias("t"))
    got2 = sorted(
        r["day"]
        for r in dev2.crossJoin(total2)
        .filter(F.col("n") * F.col("dev") > F.lit(ANOMALY_K) * F.col("t"))
        .collect()
    )
    assert got2 == expect


@settings(max_examples=5, deadline=None)
@given(
    gaps=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # customer
            st.integers(min_value=0, max_value=2000),   # day offset
        ),
        min_size=2,
        max_size=30,
    )
)
def test_order_gap_multiset_invariant_under_shuffle(spark, gaps):
    """customer_order_gaps' window sort is pinned by (date, key), but
    the GAP MULTISET must already be invariant to the order equal-date
    rows arrive in — reversing the input changes nothing."""
    import datetime as dt

    base = dt.datetime(1995, 1, 1)
    rows = [
        Row(
            o_orderkey=i,
            o_custkey=c,
            o_orderdate=base + dt.timedelta(days=off),
        )
        for i, (c, off) in enumerate(gaps)
    ]

    def run(rs):
        from pyspark.sql import Window

        df = spark.createDataFrame(rs)
        w = Window.partitionBy("o_custkey").orderBy(
            "o_orderdate", "o_orderkey"
        )
        return sorted(
            (r["o_custkey"], r["g"])
            for r in df.withColumn(
                "prev", F.lag("o_orderdate").over(w)
            )
            .filter(F.col("prev").isNotNull())
            .select(
                "o_custkey",
                F.datediff(
                    F.to_date("o_orderdate"), F.to_date("prev")
                ).alias("g"),
            )
            .collect()
        )

    assert run(rows) == run(list(reversed(rows)))


@settings(max_examples=5, deadline=None)
@given(
    prefix=st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    shared=st.lists(st.sampled_from(WORDS), min_size=6, max_size=10),
    suffix=st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
)
def test_winnow_guarantee_property(spark, prefix, shared, suffix):
    """Winnowing recall law: any shared run of >= W + K - 1 = 6 tokens
    between two documents yields at least one shared fingerprint,
    regardless of surrounding context."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    doc_a = " ".join(prefix + shared)
    doc_b = " ".join(shared + suffix)
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=doc_a), Row(doc_id=1, text=doc_b)]
    )
    fps = winnow.winnow_fingerprints(docs).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc.get(0, set()) & by_doc.get(1, set()), (doc_a, doc_b)


# ---------------------------------------------------------------------------
# Exact monetary aggregation (functions/money.py): partition-count
# invariance.  The r5 driver caught nation_year_profit penny-off at
# sf0.1 — dround(SUM(double)) depends on accumulation order when the
# true sum lands within an ulp of the .005 boundary.  money_sum /
# revenue_sum accumulate exact scaled integers, so the result must be
# BIT-IDENTICAL for every repartitioning.
# ---------------------------------------------------------------------------

amounts_strategy = st.lists(
    # 2-dp money values, including boundary-hugging ones
    st.integers(min_value=-10**7, max_value=10**9).map(lambda c: c / 100.0),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(amounts=amounts_strategy)
def test_money_sum_partition_invariant(spark, amounts):
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
        money_sum,
    )

    df = spark.createDataFrame([Row(v=a) for a in amounts])
    results = {
        df.repartition(n).agg(money_sum("v").alias("s")).collect()[0].s
        for n in (1, 3, 7, 32)
    }
    assert len(results) == 1, results
    # and the value is the exact cent sum
    expected = sum(round(a * 100) for a in amounts) / 100.0
    assert results == {expected}


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**7).map(lambda c: c / 100.0),
            st.integers(min_value=0, max_value=10).map(lambda h: h / 100.0),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_revenue_sum_partition_invariant_and_exact(spark, rows):
    from fractions import Fraction

    from retail_etl_pipeline_airflow_s3_athena_spark.functions.money import (
        revenue_sum,
    )

    df = spark.createDataFrame([Row(p=p, d=d) for p, d in rows])
    results = {
        df.repartition(n)
        .agg(revenue_sum("p", "d").alias("s"))
        .collect()[0]
        .s
        for n in (1, 5, 32)
    }
    assert len(results) == 1
    exact = sum(
        Fraction(round(p * 100), 100) * (1 - Fraction(round(d * 100), 100))
        for p, d in rows
    )
    assert results == {float(exact)}
