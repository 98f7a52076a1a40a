"""Extension operators: dedup / similarity / text analysis semantics
on constructed inputs (known duplicates, known vectors)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.operators import cluster, dedup, scd, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        Row(doc_id=0, text=base, source="s0"),
        Row(doc_id=1, text="  THE quick brown fox jumps over the lazy dog again and again today ".lower(), source="s0"),
        Row(doc_id=2, text=near, source="s0"),
        Row(doc_id=3, text="completely different words about spark query engines and shuffles", source="s1"),
        Row(doc_id=4, text=base, source="s1"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    # 0, 1 (whitespace/case-normalized) and 4 are the same text
    assert out[0]["keeper_id"] == 0 and not out[0]["is_duplicate"]
    assert out[1]["keeper_id"] == 0 and out[1]["is_duplicate"]
    assert out[4]["keeper_id"] == 0 and out[4]["is_duplicate"]
    assert not out[2]["is_duplicate"]
    assert not out[3]["is_duplicate"]


def test_near_dup_catches_one_word_edit(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.near_dup_pairs(docs, threshold=0.5).collect()
    }
    # the one-word edit (0 vs 2) must be found with high jaccard
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7
    # identical texts have jaccard 1.0
    assert pairs.get((0, 4)) == 1.0
    # unrelated doc 3 pairs with nothing
    assert not any(3 in p for p in pairs)


def test_simhash_similarity_structure(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[4] == sigs[1]  # same bag of words
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    ham_far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham_near < ham_far  # one-word edit closer than unrelated text


def test_simhash_near_dup_bands_find_identical_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely different content about spark engines"),
        ]
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup(docs, max_hamming=3).collect()
    }
    assert out.get((0, 1)) == 0  # identical text -> identical signature
    assert (0, 2) not in out and (1, 2) not in out


def test_shingle_df_cap_drops_stop_shingles(spark):
    # 4 docs share one stop phrase; two of them also share unique
    # content.  With the cap at 3 the stop shingle (df=4) leaves the
    # Jaccard universe: the content-sharing pair keeps jaccard 1.0 and
    # pairs related ONLY by the stop phrase vanish.
    stop = "click here to subscribe now"
    rows = [
        Row(doc_id=0, text=f"{stop} alpha beta gamma delta", source="s0"),
        Row(doc_id=1, text=f"{stop} alpha beta gamma delta", source="s0"),
        Row(doc_id=2, text=f"{stop} epsilon zeta eta theta", source="s0"),
        Row(doc_id=3, text=f"{stop} iota kappa lambda mu", source="s0"),
    ]
    docs = spark.createDataFrame(rows)
    # blocked_jaccard compares ALL within-block pairs (no LSH recall
    # noise), so the cap's effect is deterministic
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_pairs(
            docs, threshold=0.2, max_df=3
        ).collect()
    }
    assert capped.get((0, 1)) == 1.0  # unique-content dup survives
    assert (2, 3) not in capped  # stop-phrase-only pair gone
    assert (0, 2) not in capped
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_pairs(
            docs, threshold=0.2, max_df=None
        ).collect()
    }
    assert (2, 3) in uncapped  # sanity: only the cap removed it
    # the LSH pipeline honors the same cap on its verification step
    nd = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.near_dup_pairs(docs, threshold=0.3, max_df=3).collect()
    }
    assert nd.get((0, 1)) == 1.0


def test_cache_ownership_release(docs):
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import release_cached

    out = dedup.near_dup_pairs(docs, threshold=0.5)
    out.collect()
    deps = getattr(out, "_spark_graft_cached_deps")
    assert deps and all(d.storageLevel.useMemory for d in deps)
    release_cached(out, blocking=True)
    assert all(not d.storageLevel.useMemory for d in deps)
    assert getattr(out, "_spark_graft_cached_deps") == ()


def test_incremental_near_dups_asymmetric(docs):
    # docs fixture: 0,1,2 in s0 (existing); 3,4 in s1 (new batch).
    # doc 4 duplicates doc 0 -> must match; doc 3 is unrelated.
    out = {
        (r["new_doc_id"], r["old_doc_id"]): r["jaccard"]
        for r in dedup.incremental_near_dups(docs, "source = 's1'").collect()
    }
    assert out.get((4, 0)) == 1.0
    assert out.get((4, 1)) == 1.0  # normalized dup of the same text
    assert not any(n == 3 for n, _ in out)  # unrelated new doc matches nothing
    # asymmetric: old docs never appear on the new side and vice versa
    assert all(n in (3, 4) and o in (0, 1, 2) for n, o in out)


def test_minhash_estimates_jaccard(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    assert pairs.get((0, 4)) == 1.0  # identical docs agree on all hashes
    assert (0, 2) in pairs  # near-dup shares at least one band


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0], label=0),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0, 0.0], label=0),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0], label=1),
        Row(vec_id=3, embedding=[0.0, 0.0, 1.0, 0.0], label=2),
        Row(vec_id=4, embedding=[0.70710678, 0.70710678, 0.0, 0.0], label=1),
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_exact(vecs):
    out = similarity.cosine_topk(vecs, n_queries=1, k=4, dim=4).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # query [1,0,0,0]: nearest is [0.9,.1] then the 45° vector, then y, z
    assert ranked == [1, 4, 2, 3]
    cos = {r["neighbor_id"]: r["cos_sim"] for r in out}
    assert abs(cos[1] - 0.9 / math.sqrt(0.82)) < 1e-5
    assert cos[2] == 0.0


def test_label_centroids(vecs):
    cents = similarity.label_centroids(vecs).collect()
    by = {(r["label"], r["pos"]): r["val"] for r in cents}
    assert by[(0, 0)] == pytest.approx(0.95, abs=1e-6)
    assert by[(2, 2)] == 1.0
    assert len(cents) == 3 * 4  # 3 labels x dim 4


def test_ivf_probes_subset(vecs):
    out = similarity.ivf_topk(vecs, n_queries=1, k=4, nprobe=2, dim=4).collect()
    ids = {r["neighbor_id"] for r in out}
    # probing 2 of 3 cells: label-2 cell ([0,0,1,0]) is never probed
    assert 3 not in ids
    assert 1 in ids


def test_kmeans_refine_reassigns_and_averages(vecs):
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )

    out = similarity.kmeans_refine(vecs, dim=4)
    rows = out.collect()
    release_cached(out)
    by = {(r["cluster"], r["pos"]): r for r in rows}
    # vec 4 ([.707,.707,0,0]) sits at 45 deg between the label-0 centroid
    # ([0.95,0.05,0,0]) and the label-1 centroid ([0.354,0.854,0,0]);
    # cosine to label-1's centroid is higher, so cluster 1 keeps vecs
    # {2, 4} and cluster 0 keeps {0, 1} after the reassignment round.
    n_by_cluster = {c: r["n_members"] for (c, p), r in by.items() if p == 0}
    assert n_by_cluster == {0: 2, 1: 2, 2: 1}
    # recomputed cluster-0 mean of vecs 0 and 1 on dim 0: (1.0+0.9)/2
    assert by[(0, 0)]["val"] == pytest.approx(0.95, abs=1e-6)
    # singleton cluster keeps its member verbatim
    assert by[(2, 2)]["val"] == 1.0


def test_kmeans_fit_two_rounds_preserves_membership(vecs):
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )

    out = similarity.kmeans_fit(vecs, rounds=2, dim=4)
    rows = out.collect()
    release_cached(out)
    # every vector is assigned each round: memberships sum to the corpus
    n_total = sum(r["n_members"] for r in rows if r["pos"] == 0)
    assert n_total == 5
    # one round == the refine wrapper, element for element
    one = similarity.kmeans_fit(vecs, rounds=1, dim=4)
    ref = similarity.kmeans_refine(vecs, dim=4)
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, ref.collect()))
    release_cached(one)
    release_cached(ref)
    assert a == b


def test_cosine_topk_gemm_bit_identical(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr = [
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in similarity.cosine_topk(emb, n_queries=3, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    gemm = [
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in similarity.cosine_topk_gemm(emb, n_queries=3, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    # float64 cumsum accumulates in the same left-assoc order as the
    # unrolled expression chain: EXACT equality, including the doubles
    assert expr == gemm


def test_gemm_near_dup_matches_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in similarity.embedding_near_dup(emb, threshold=0.4).collect()
    }
    gemm = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in similarity.embedding_near_dup_gemm(emb, threshold=0.4).collect()
    }
    # fp64 cumsum accumulates in the fold's left-assoc order: EXACT
    # equality, including the rounded doubles
    assert exact == gemm
    assert len(exact) > 0


def test_gemm_near_dup_tiling_invariant(spark, sf_dir):
    # forcing many tiny tiles must not change the result (each pair is
    # emitted exactly once, in the pass owning b's tile)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in similarity.embedding_near_dup_gemm(emb, threshold=0.4).collect()
    }
    many = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in similarity.embedding_near_dup_gemm(
            emb, threshold=0.4, tile_rows=64
        ).collect()
    }
    assert one == many


def test_tfidf_top_terms_formula_and_topk(spark):
    from collections import Counter

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import vocab

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="apple banana apple"),
            Row(doc_id=1, text="banana cherry"),
            Row(doc_id=2, text="cherry durian cherry cherry"),
        ]
    )
    out = vocab.tfidf_top_terms(docs, k=2).collect()
    by = {(r["doc_id"], r["term"]): r for r in out}
    # 'apple' unique to doc0: tf=2, doc_freq=1, n_docs=3
    # -> 2 * (L(3) - L(1)) on the deterministic fixed-point log2
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.detmath import (
        log2_e20,
    )

    r = by[(0, "apple")]
    assert r["rank"] == 1 and r["tf"] == 2 and r["doc_freq"] == 1
    assert r["tfidf_e20"] == 2 * (log2_e20(3) - log2_e20(1))
    # and the integer score tracks true tf*log2(n/df) to ~2^-11
    assert r["tfidf_e20"] / 2**20 == pytest.approx(
        2 * math.log2(3), abs=2e-3
    )
    # ubiquitous-ish terms score below unique ones; k bounds per doc
    cnt = Counter(r["doc_id"] for r in out)
    assert all(v <= 2 for v in cnt.values())


def test_embedding_near_dup_lsh_subset_and_exact_dups(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plant an exact duplicate: identical vectors -> identical rp
    # signature -> every band collides -> the pair MUST be found
    dup = emb.filter("vec_id = 0").withColumn("vec_id", F.lit(999999).cast("long"))
    withdup = emb.unionByName(dup)
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_lsh(withdup, threshold=0.4).collect()
    }
    allp = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup(withdup, threshold=0.4).collect()
    }
    # precision exact: every LSH pair is an all-pairs pair, same value
    assert set(lsh) <= set(allp)
    assert all(allp[k] == v for k, v in lsh.items())
    assert lsh[(0, 999999)] == 1.0


def test_rp_lsh_gemm_bit_identical(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr = {
        (r["vec_id"], r["rp_sig"])
        for r in similarity.rp_lsh_signatures(emb).collect()
    }
    gemm = {
        (r["vec_id"], r["rp_sig"])
        for r in similarity.rp_lsh_signatures_gemm(emb).collect()
    }
    assert expr == gemm
    with pytest.raises(Exception, match="dim"):
        bad = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        similarity.rp_lsh_signatures_gemm(bad).collect()


def test_embedding_near_dup_lsh_plan_is_equijoin(spark, sf_dir):
    """The band-collision candidate join must plan as an equi-join
    (shuffle or broadcast HASH join) — a BroadcastNestedLoopJoin would
    mean the bucket restriction fell out of the join condition and the
    plan is O(n^2) at scale."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = similarity.embedding_near_dup_lsh(emb)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_rp_lsh_rejects_wrong_dim(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0, 3.0, 4.0]),
         Row(vec_id=1, embedding=[1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    ok = similarity.rp_lsh_signatures(df.filter("vec_id = 0"), dim=4).collect()
    assert len(ok) == 1 and ok[0]["rp_sig"] is not None
    with pytest.raises(Exception, match="dim"):
        similarity.rp_lsh_signatures(df, dim=4).collect()


def test_text_features_formulas(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="the cat, sat!")])
    r = text.text_features(df).first()
    assert r["n_tokens"] == 3
    assert r["n_bpe_tokens"] == 5  # the / cat / , / sat / !
    assert r["n_chars"] == 13
    assert r["punct_ratio"] == pytest.approx(2 / 13, abs=1e-6)
    assert r["stopword_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    # fingerprint is stable
    assert r["fingerprint"] == text.text_features(df).first()["fingerprint"]


def test_fingerprint_udf_matches_expr(spark):
    """The Arrow-vectorized fingerprint must be bit-identical to the
    expression formula-of-record (which the oracle SQL mirrors),
    including unicode, whitespace-only, empty, and null texts."""
    rows = [
        Row(doc_id=0, text="The quick brown fox"),
        Row(doc_id=1, text="  MiXeD  Case   with   runs  "),
        Row(doc_id=2, text=""),
        Row(doc_id=3, text="   "),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="Ünïcødé tèst İstanbul ß"),
        Row(doc_id=6, text="x" * 5000),
    ]
    df = spark.createDataFrame(rows)
    bad = (
        df.select(
            text.fingerprint(F.col("text")).alias("fast"),
            text.fingerprint_expr(F.col("text")).alias("ref"),
        )
        .filter("fast IS DISTINCT FROM ref")
        .count()
    )
    assert bad == 0


def test_language_id_picks_english(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat is in the house and it is warm"),
            Row(doc_id=1, text="der hund ist nicht ein kater und das haus"),
            Row(doc_id=2, text="xyzzy plugh frobozz"),
        ]
    )
    out = {r["doc_id"]: r["predicted_lang"] for r in text.language_id(df).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"


def test_connected_components_transitive_chain(spark):
    # chain 1-2-3 plus isolated pair 10-11: transitivity must merge the
    # chain even though (1, 3) is never a direct edge
    edges = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=10, doc_b=11)]
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in cluster.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_paths_agree(spark):
    # the driver union-find fast path and the distributed min-label
    # loop must compute the IDENTICAL fixpoint — force the distributed
    # path with max_driver_edges=0 and compare on a graph with a chain,
    # a triangle, and out-of-order ids
    edges = spark.createDataFrame(
        [
            Row(doc_a=5, doc_b=2),
            Row(doc_a=2, doc_b=9),
            Row(doc_a=9, doc_b=7),
            Row(doc_a=20, doc_b=21),
            Row(doc_a=21, doc_b=22),
            Row(doc_a=22, doc_b=20),
        ]
    )
    fast = {r["doc_id"]: r["cluster_id"]
            for r in cluster.connected_components(edges).collect()}
    dist = cluster.connected_components(edges, max_driver_edges=0)
    dist_out = {r["doc_id"]: r["cluster_id"] for r in dist.collect()}
    cluster.release_cached(dist)
    assert fast == dist_out == {
        5: 2, 2: 2, 9: 2, 7: 2, 20: 20, 21: 20, 22: 20,
    }


def test_near_dup_clusters_and_keep(docs):
    out = {r["doc_id"]: r for r in cluster.near_dup_clusters(docs).collect()}
    # 0/1/4 identical, 2 a one-word edit: one cluster, canonical 0
    for d in (0, 1, 2, 4):
        assert out[d]["cluster_id"] == 0 and out[d]["cluster_size"] == 4
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    # unrelated doc 3 is its own singleton
    assert out[3]["cluster_id"] == 3 and out[3]["cluster_size"] == 1
    kept = sorted(r["doc_id"] for r in cluster.dedup_keep(docs).collect())
    assert kept == [0, 3]


def test_fuzzy_name_matches_banding_is_lossless(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedup as dd

    rows = [Row(p_name=n) for n in [
        "widget", "widgat", "widgets",      # dist 1 cluster
        "gear", "bear",                     # dist 1
        "a", "abc",                         # dist 2, adjacent bands
        "completely different",             # no match
        "widget",                           # dup row -> n_rows=2
    ]]
    df = spark.createDataFrame(rows)
    got = {
        (r["name_a"], r["name_b"]): (r["rows_a"], r["rows_b"], r["dist"])
        for r in dd.fuzzy_name_matches(df, max_dist=2).collect()
    }
    # brute-force reference over the distinct vocabulary
    import itertools

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1, m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    from collections import Counter
    counts = Counter(r.p_name for r in rows)
    expect = {}
    for a, b in itertools.combinations(sorted(counts), 2):
        d = lev(a, b)
        if d <= 2:
            expect[(a, b)] = (counts[a], counts[b], d)
    assert got == expect
    assert got[("widget", "widgets")][0] == 2  # dup row counted


def test_normalize_text_canonicalizes(spark):
    rows = [
        Row(doc_id=0, text="  Hello\tWORLD \x07 bell  "),
        Row(doc_id=1, text="already clean"),
        Row(doc_id=2, text="A\n\nB"),
    ]
    out = {
        r["doc_id"]: r
        for r in text.normalize_text(spark.createDataFrame(rows)).collect()
    }
    assert out[0]["norm_text"] == "hello world bell"
    assert out[0]["n_chars_norm"] == len("hello world bell")
    assert out[1]["norm_text"] == "already clean"
    assert out[2]["norm_text"] == "a b"


def test_pii_redact_masks_and_counts(spark):
    rows = [
        Row(doc_id=0, text="contact me at jane.doe+x@example.co.uk or visit https://ex.com/a?b=1 now"),
        Row(doc_id=1, text="server 10.0.255.3 called 415-555-1234 twice"),
        Row(doc_id=2, text="nothing sensitive here"),
    ]
    docs = spark.createDataFrame(rows)
    out = {r["doc_id"]: r for r in text.pii_redact(docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_url"] == 1
    assert out[0]["redacted_text"] == "contact me at <EMAIL> or visit <URL> now"
    assert out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["redacted_text"] == "server <IP> called <PHONE> twice"
    assert out[2]["redacted_text"] == "nothing sensitive here"

    # cross-engine: DuckDB oracle yields byte-identical redactions
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(r.doc_id, r.text) for r in rows],
    )
    ora = {
        r[0]: r
        for r in con.execute(text.oracle_pii_redact_sql()).fetchall()
    }
    for d in (0, 1, 2):
        assert ora[d][-1] == out[d]["redacted_text"]
        assert list(ora[d][1:5]) == [
            out[d]["n_url"], out[d]["n_email"],
            out[d]["n_ipv4"], out[d]["n_phone"],
        ]


def test_scd2_merge_state_transitions(spark):
    import datetime as dt

    cur = spark.createDataFrame(
        [
            # history row for key 1 (must pass through untouched)
            Row(k=1, v="old", effective_from=dt.date(2020, 1, 1),
                effective_to=dt.date(2021, 1, 1), is_current=False),
            # live rows: 1 will change, 2 stays identical
            Row(k=1, v="a", effective_from=dt.date(2021, 1, 1),
                effective_to=None, is_current=True),
            Row(k=2, v="b", effective_from=dt.date(2021, 1, 1),
                effective_to=None, is_current=True),
        ]
    )
    upd = spark.createDataFrame(
        [Row(k=1, v="a2"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    out = scd.scd2_merge(cur, upd, "k", ["v"], "2022-06-01").collect()
    rows = {(r["k"], r["v"], r["is_current"]): r for r in out}
    assert len(out) == 5
    # history untouched
    assert rows[(1, "old", False)]["effective_to"] == dt.date(2021, 1, 1)
    # changed key: old version closed at merge date, new live version
    assert rows[(1, "a", False)]["effective_to"] == dt.date(2022, 6, 1)
    assert rows[(1, "a2", True)]["effective_from"] == dt.date(2022, 6, 1)
    assert rows[(1, "a2", True)]["effective_to"] is None
    # unchanged key: original live row intact
    assert rows[(2, "b", True)]["effective_from"] == dt.date(2021, 1, 1)
    # brand-new key inserted live
    assert rows[(3, "c", True)]["effective_from"] == dt.date(2022, 6, 1)


def test_funnel_conversion_is_order_sensitive(spark):
    import datetime as dt

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import events as ev_ops

    t0 = dt.datetime(2025, 1, 1)

    def e(i, user, typ, minutes):
        return Row(
            event_id=i, ts=t0 + dt.timedelta(minutes=minutes), user_id=user,
            event_type=typ, value=1.0, props="{}",
        )

    rows = [
        # user 1: view -> click -> purchase (full funnel)
        e(1, 1, "view", 0), e(2, 1, "click", 10), e(3, 1, "purchase", 20),
        # user 2: purchase BEFORE click -> stops at click stage
        e(4, 2, "view", 0), e(5, 2, "purchase", 5), e(6, 2, "click", 10),
        # user 3: click without prior view -> stops at view-missing
        e(7, 3, "click", 0), e(8, 3, "purchase", 5),
    ]
    df = spark.createDataFrame(rows)
    r = ev_ops.funnel_conversion(df).first()
    assert (r["n_users"], r["n_viewed"], r["n_clicked"], r["n_purchased"]) == (
        3, 2, 2, 1,
    )


def test_weekly_retention_offsets(spark, sf_dir):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import events as ev_ops
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers as rd

    rows = ev_ops.weekly_retention(rd.read_events(spark, sf_dir)).collect()
    assert len(rows) > 0
    assert all(r["week_offset"] >= 0 for r in rows)
    # offset-0 count per cohort == cohort size (everyone is active in
    # their first week by definition)
    first = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    assert set(first) == {r["cohort_week"] for r in rows}
    for r in rows:
        assert r["n_users"] <= first[r["cohort_week"]]


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        "k long, bal double, seg string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (3, None, "C"), (5, 50.0, "E")],
        "k long, bal double, seg string",
    )
    out = {
        r["k"]: r["status"]
        for r in scd.snapshot_diff(old, new, "k", ["bal", "seg"]).collect()
    }
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under eqNullSafe
        4: "removed",
        5: "added",
    }


def test_value_histogram_boundaries(spark):
    import datetime as dt

    from retail_etl_pipeline_airflow_s3_athena_spark.operators import events as ev_ops

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        Row(event_id=i, ts=t0, user_id=1, event_type="view", value=v, props="{}")
        for i, v in enumerate([-5.0, 0.0, 24.9, 25.0, 499.9, 500.0, 600.0, None])
    ]
    out = {
        r["bucket"]: r["n"]
        for r in ev_ops.value_histogram(
            spark.createDataFrame(rows), lo=0.0, hi=500.0, bins=20
        ).collect()
    }
    # -5 -> bucket 0 (below); 0 and 24.9 -> bucket 1; 25.0 -> bucket 2
    # (boundary goes up); 499.9 -> bucket 20; 500 and 600 -> bucket 21
    # (at/above hi); None dropped
    assert out == {0: 1, 1: 2, 2: 1, 20: 1, 21: 2}


def test_dedup_rate_report_counts(spark):
    rows = [
        Row(doc_id=0, text="same text"),
        Row(doc_id=1, text="  SAME   text  ".replace("   ", " ")),  # ws/case variant? no: fingerprint is lower+trim only
        Row(doc_id=2, text="other"),
    ]
    out = dedup.dedup_rate_report(spark.createDataFrame(rows)).collect()[0]
    assert out["n_docs"] == 3
    # doc 1 collapses to "same text" under lower+trim -> exact dup of 0
    assert out["n_unique"] == 2
    # dup_rate is dround(6) of 1 - unique/total
    assert abs(out["dup_rate"] - (1 - 2 / 3)) < 1e-6


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------

def test_winnow_guarantee_shared_run(spark):
    """Any shared token run of >= W + K - 1 = 6 tokens must yield at
    least one shared fingerprint (the winnowing recall guarantee)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"unrelated prefix words {shared} tail one"),
            Row(doc_id=1, text=f"{shared} and a totally different ending here"),
            Row(doc_id=2, text="no overlap with anything else at all friend"),
        ]
    )
    fps = winnow.winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"
    assert not (by_doc[2] & (by_doc[0] | by_doc[1]))

    pairs = winnow.winnow_shared_pairs(docs, min_shared=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}


def test_winnow_short_doc_single_window(spark):
    """Docs with fewer than W grams contribute exactly the global-min
    selection (one window spanning all grams)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    docs = spark.createDataFrame([Row(doc_id=7, text="tiny doc here")])
    # 3 tokens -> 1 gram -> exactly one fingerprint at gram_pos 0
    fps = winnow.winnow_fingerprints(docs).collect()
    assert len(fps) == 1 and fps[0]["gram_pos"] == 0


def test_winnow_density(spark):
    """Selected fingerprints must be far fewer than grams (expected
    density 2/(W+1)) and every selection must be a window minimum."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    words = [f"w{i % 17}x{i % 5}" for i in range(200)]
    docs = spark.createDataFrame([Row(doc_id=0, text=" ".join(words))])
    n_grams = 198
    fps = winnow.winnow_fingerprints(docs).collect()
    assert 0 < len(fps) < n_grams * 0.75
    assert all(0 <= r["gram_pos"] < n_grams for r in fps)


def test_cms_never_undercounts_and_merges(spark):
    """CMS estimate >= true count for every probed token; identical
    corpora summarize to identical sketches (determinism)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions import sketches

    rows = [
        Row(doc_id=i, text="common common common rare" + f" filler{i % 7}" * 3)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows)
    out = {r["token"]: r for r in sketches.cms_heavy_hitters(docs, top_k=5).collect()}
    assert out["common"]["true_cnt"] == 120
    for r in out.values():
        assert r["cms_est"] >= r["true_cnt"]
    out2 = {r["token"]: r for r in sketches.cms_heavy_hitters(docs, top_k=5).collect()}
    assert {k: (v["true_cnt"], v["cms_est"]) for k, v in out.items()} == {
        k: (v["true_cnt"], v["cms_est"]) for k, v in out2.items()
    }


def test_bloom_decontaminate_no_false_negatives(spark):
    """Every doc the exact probe flags must be bloom-flagged with
    n_exact_hits >= its true overlap > 0 (Bloom filters never miss)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import decontam

    bench_text = "the secret benchmark passage that must never leak out"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=bench_text, source="bench"),
            Row(doc_id=1, text=f"leading words {bench_text} trailing words", source="train"),
            Row(doc_id=2, text="fully clean document with no overlap at all here", source="train"),
        ]
    )
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in decontam.decontaminate(docs, "source = 'bench'").collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in decontam.bloom_decontaminate(docs, "source = 'bench'").collect()
    }
    assert exact[1] > 0
    assert 1 in bloom and bloom[1]["n_exact_hits"] == exact[1]
    assert bloom[1]["n_bloom_hits"] >= bloom[1]["n_exact_hits"]
    assert exact[2] == 0 and (2 not in bloom or bloom[2]["n_exact_hits"] == 0)


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import decontam

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text=base, source="bench"),
            Row(doc_id=11, text=base + " nu", source="train"),  # near-dup of bench
            Row(doc_id=12, text="entirely different content words here for testing", source="train"),
        ]
    )
    out = decontam.fuzzy_decontaminate(docs, "source = 'bench'").collect()
    assert {(r["doc_id"], r["bench_doc_id"]) for r in out} == {(11, 10)}
    assert all(r["jaccard"] >= 0.5 for r in out)


def test_knn_graph_exact_neighbors(spark):
    """Known geometry: ranks follow cosine desc with id-asc tie-break;
    every vector gets exactly min(k, n-1) neighbors."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import similarity

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0] + [0.0] * 62),
        Row(vec_id=1, embedding=[1.0, 0.1] + [0.0] * 62),   # closest to 0
        Row(vec_id=2, embedding=[0.0, 1.0] + [0.0] * 62),   # orthogonal to 0
        Row(vec_id=3, embedding=[-1.0, 0.0] + [0.0] * 62),  # opposite of 0
    ]
    emb = spark.createDataFrame(rows)
    out = similarity.knn_graph(emb, k=2)
    got = {
        (r["vec_id"], r["rank"]): r["neighbor_id"] for r in out.collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2
    # 3's neighbors by cosine: 2 (0.0) > 1 (-0.995) > 0 (-1.0)
    assert got[(3, 1)] == 2 and got[(3, 2)] == 1
    counts = out.groupBy("vec_id").count().collect()
    assert all(r["count"] == 2 for r in counts)


def test_pagerank_regular_graph_fixed_point(spark):
    """On a k-regular dup graph (triangle of identical docs) the
    uniform rank is PageRank's fixed point: base + damping exactly
    reproduce PR_SCALE every iteration."""
    same = "the exact same document text repeated across three rows here"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=same) for i in range(3)]
        + [Row(doc_id=9, text="an unrelated singleton document with other words")]
    )
    out = {r["doc_id"]: r["pagerank_scaled"] for r in cluster.pagerank_near_dups(docs).collect()}
    assert out == {0: 1_000_000, 1: 1_000_000, 2: 1_000_000}  # 9 is edge-free


def test_pagerank_driver_matches_distributed(spark):
    """The bounded-collect driver loop and the distributed loop are the
    same fixed point (same contract as connected_components)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " iota"),
        Row(doc_id=3, text="unrelated totally different words in this document"),
    ]
    docs = spark.createDataFrame(rows)
    drv = {
        (r["doc_id"], r["pagerank_scaled"])
        for r in cluster.pagerank_near_dups(docs).collect()
    }
    dist = {
        (r["doc_id"], r["pagerank_scaled"])
        for r in cluster.pagerank_near_dups(docs, max_driver_edges=0).collect()
    }
    assert drv == dist and len(drv) == 3


def test_containment_catches_quote_subset(spark):
    """A short doc fully quoted inside a long one: containment 1.0 even
    though Jaccard is small."""
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    long_doc = (
        "padding words one two three four five six seven eight nine ten "
        + quote
        + " more padding eleven twelve thirteen fourteen fifteen sixteen"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=quote),
            Row(doc_id=1, text=long_doc),
            Row(doc_id=2, text="nothing in common with those documents here"),
        ]
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.containment_pairs(docs, threshold=0.8).collect()
    }
    assert (0, 1) in out
    assert out[(0, 1)]["cont_a_in_b"] == 1.0   # every quote shingle in the long doc
    assert out[(0, 1)]["cont_b_in_a"] < 0.5
    assert not any(2 in p for p in out)


def test_dup_span_stats_localizes(spark):
    """Identical docs are 100% duplicated; a half-shared doc sits in
    between; a unique doc is 0%."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared),
            Row(doc_id=1, text=shared),
            Row(doc_id=2, text=shared + " unique tail words here now okay"),
            Row(doc_id=3, text="entirely original content with no overlap at all"),
        ]
    )
    out = {r["doc_id"]: r for r in winnow.dup_span_stats(docs).collect()}
    assert out[0]["dup_fraction"] == 1.0 and out[1]["dup_fraction"] == 1.0
    assert 0 < out[2]["dup_fraction"] < 1.0
    assert out[3]["dup_fraction"] == 0.0


def test_ngram_novelty_orders_by_ingest(spark):
    """First doc is 100% novel; an exact re-ingest is 0%; partial
    overlap sits between."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import winnow

    base = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=base),
            Row(doc_id=1, text=base),  # re-ingest: nothing new
            Row(doc_id=2, text=base + " fresh tail words here"),
        ]
    )
    out = {r["doc_id"]: r for r in winnow.ngram_novelty(docs).collect()}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert 0 < out[2]["novelty"] < 1.0


def test_embedding_near_dup_size_dispatch(spark, sf_dir):
    """The corpus-size dispatch (VERDICT r5 #6): under the threshold the
    operator IS the exact all-pairs plan; above it, it IS the LSH
    bucketed plan — same rows as calling each path directly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    key = lambda r: (r["vec_a"], r["vec_b"], r["cos_sim"])  # noqa: E731
    exact = {key(r) for r in similarity.embedding_near_dup_exact(emb).collect()}
    # default threshold (20k) >> fixture size: dispatches to exact
    assert {
        key(r) for r in similarity.embedding_near_dup(emb).collect()
    } == exact
    # force the scale path: dispatches to LSH (subset of exact —
    # band-collision candidates verified with the same exact cosine)
    lsh = {key(r) for r in similarity.embedding_near_dup_lsh(emb).collect()}
    assert {
        key(r)
        for r in similarity.embedding_near_dup(emb, exact_max_rows=0).collect()
    } == lsh
    assert lsh <= exact


def test_dedup_keep_best_keeps_highest_quality_per_cluster(spark, sf_dir):
    """Quality-aware canonicalization: exactly one doc survives per
    near-dup cluster, and it is the cluster's max-quality member
    (ties -> min doc_id)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import cluster, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = cluster.near_dup_clusters(docs)
    qual = {
        r["doc_id"]: (r["q"], r["doc_id"])
        for r in docs.select(
            "doc_id", text.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    members = {}
    for r in clusters.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    release_cached(clusters)

    kept = cluster.dedup_keep_best(docs)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    release_cached(kept)

    for cid, ids in members.items():
        expected = max(ids, key=lambda d: (qual[d][0], -d))
        surviving = kept_ids & set(ids)
        assert surviving == {expected}, (cid, ids, surviving, expected)


def test_source_overlap_matches_bruteforce(spark, sf_dir):
    """source_overlap's inverted-index pair counts equal brute-force
    per-source shingle-set intersections."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat = dedup._flat_shingles(docs, "text", extra_cols=("source",))
    sets: dict[str, set] = {}
    for r in flat.select("source", "s").distinct().collect():
        sets.setdefault(r["source"], set()).add(r["s"])

    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_shared"], r["jaccard"]
        )
        for r in dedup.source_overlap(docs).collect()
    }
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            na, nb = len(sets[a]), len(sets[b])
            ga, gb, gi, gj = got[(a, b)]
            assert (ga, gb, gi) == (na, nb, inter)
            import math
            assert gj == math.floor(inter / (na + nb - inter) * 1e6 + 0.5) / 1e6


def test_near_dup_recall_s_curve_and_consistency(spark):
    """near_dup_recall measures pure banding loss: (1) on a graded
    corpus the recall table IS the LSH S-curve (deterministic — pinned);
    (2) total caught == the production near_dup_pairs output (the
    verified LSH pairs are the caught set, precision 1 by
    construction)."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import dedup

    rows, did = [], 0
    for i in range(40):
        base = [f"w{i}x{j}" for j in range(24)]
        k = 2 + (i % 11)
        var = base[:-k] + [f"v{i}y{j}" for j in range(k)]
        rows.append((did, "s", " ".join(base))); did += 1
        rows.append((did, "s", " ".join(var))); did += 1
    docs = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    out = dedup.near_dup_recall(docs, threshold=0.3)
    got = [tuple(r) for r in out.collect()]
    release_cached(out)
    # deterministic end-to-end: the banded-recall table is pinned
    assert got == [
        (3, 6, 0, 0),
        (4, 7, 1, 142857),
        (5, 8, 3, 375000),
        (6, 8, 5, 625000),
        (7, 4, 1, 250000),
        (8, 4, 3, 750000),
    ]
    # structural invariants: caught <= true, recall arithmetic exact
    for band, n_true, n_caught, rec in got:
        assert 0 <= n_caught <= n_true
        assert rec == 10**6 * n_caught // n_true
    # consistency with the production pipeline: total caught pairs ==
    # |near_dup_pairs| at the same threshold/cap
    nd = dedup.near_dup_pairs(docs, threshold=0.3)
    n_prod = nd.count()
    release_cached(nd)
    assert sum(c for _, _, c, _ in got) == n_prod


def test_key_skew_report_semantics(spark):
    """Exact shares and skew multiples on a constructed skewed table."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import skewreport

    # key "hot" 60 rows, "warm" 30, "cold" 10 -> 100 rows, 3 keys
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10 + [(None,)]
    df = spark.createDataFrame(rows, "k STRING")
    out = [tuple(r) for r in skewreport.key_skew_report(df, "k", top_k=2).collect()]
    # share_e6 = 1e6*n//100; skew_x_e2 = 100*n*3//100 = 3n
    assert out == [
        ("hot", 60, 600000, 180),
        ("warm", 30, 300000, 90),
    ]
    # empty input -> empty report, no division error
    empty = df.filter("k = 'nope'")
    assert skewreport.key_skew_report(empty, "k").count() == 0


def test_compression_signal_separates_entropy_classes(spark):
    """r11: template spam compresses far better than prose, prose far
    better than near-random hex — the ordering the curation filter
    relies on; empty text is defined incompressible."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators import text as T

    corpus = T.synthesize_compression_corpus(spark, n=18)
    got = {
        r["doc_id"]: r["ratio_e6"]
        for r in T.compression_signals(corpus).collect()
    }
    assert got == {
        i: T.compression_stats(T.make_compression_doc(i))[2]
        for i in range(18)
    }
    import statistics

    spam = [got[i] for i in range(18) if i % 3 == 0]
    prose = [got[i] for i in range(18) if i % 3 == 1]
    rand = [got[i] for i in range(18) if i % 3 == 2]
    # ratio co-varies with length, so classes are compared by median
    # (the filter thresholds against a length-bucketed baseline);
    # near-random is separable outright
    assert statistics.median(spam) < statistics.median(prose)
    assert max(prose) < min(rand)
    assert T.compression_stats("") == (0, 0, 10**6)
