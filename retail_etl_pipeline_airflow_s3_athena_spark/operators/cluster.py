"""Near-duplicate clustering: connected components over the near-dup
pair graph, plus the canonical keep-list that actual corpus dedup needs.

The reference stops at the duplicate *check* (scripts/data_quality.py:22);
``operators/dedup.py`` finds near-dup PAIRS; this module closes the loop:
pairs form an undirected graph, each connected component is one
"duplicate cluster", and dedup keeps exactly one canonical document per
cluster (the minimum doc_id — deterministic, engine-independent).

Algorithm: iterative min-label propagation (Pregel-style).  Every node
starts labeled with its own doc_id; each round, a node adopts the
minimum label among itself and its neighbors; at fixpoint every node in
a component carries the component's minimum doc_id.  The fixpoint is
unique regardless of iteration order, so the result is deterministic
and oracle-checkable (DuckDB computes the same fixpoint with a
recursive CTE).

Plan-shape / 100 TB notes:
- The iteration runs ONLY over nodes that touch an edge.  Near-dup
  edges are a tiny fraction of a deduplicated corpus (collision pairs,
  not rows), so the loop's working set is orders of magnitude smaller
  than the corpus; untouched docs are appended afterwards as
  singleton clusters with a single cheap anti-join — no per-iteration
  cost scales with corpus size.
- Each round is one shuffle (edge ⋈ label on dst, groupBy src MIN) —
  partial aggregation collapses neighbor lists map-side.  Rounds needed
  = graph diameter; near-dup clusters are shallow (pairwise-similar
  docs), so a handful of rounds converges.  ``max_iter`` bounds the
  worst case; a driver-side count checks convergence per round (an
  aggregate, not a data collect).
- Labels persist per round and unpersist the previous round, keeping
  lineage flat (each round reads the cached previous round, not the
  full history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
    attach_cached_deps,
    carried_deps,
    release_cached,
)
from retail_etl_pipeline_airflow_s3_athena_spark.operators.dedup import (
    near_dup_pairs,
    oracle_near_dup_pairs_sql,
)


DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_components(pairs: list) -> list[tuple[int, int]]:
    """Union-find over a BOUNDED edge list: (doc_id, min doc_id of its
    component) for every edge-touched node — the same fixpoint the
    distributed loop converges to, so the two paths are
    interchangeable.  Union by size + path compression: effectively
    O(edges)."""
    parent: dict[int, int] = {}
    size: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if size.get(ra, 1) < size.get(rb, 1):
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] = size.get(ra, 1) + size.get(rb, 1)

    nodes = {n for pair in pairs for n in pair}
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        if n < comp_min.get(r, n + 1):
            comp_min[r] = n
    return [(n, comp_min[find(n)]) for n in sorted(nodes)]


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    max_driver_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Min-label connected components over the edge-touched node set.

    ``edges``: (doc_a, doc_b) undirected pairs.  Returns (doc_id,
    cluster_id) for every node that appears in an edge, with cluster_id
    = min doc_id of its component.  Isolated nodes are the CALLER's
    singletons — handling them here would drag the full corpus through
    every iteration.

    TWO physical paths behind one contract, picked by the materialized
    edge count:

    - ``n_edges <= max_driver_edges``: driver union-find.  The edge
      list is a COLLECT-SAFE bounded set (1M directed pairs ≈ 16 MB —
      smaller than sides Spark routinely auto-broadcasts), and the
      distributed loop's per-round job overhead (join + groupBy + join
      + convergence action, times graph diameter) is orders of
      magnitude slower than linear union-find at this size.  Same
      fixpoint, test-enforced against the distributed path.
    - larger graphs: the Pregel-style min-label loop below.  Each round
      is one shuffle (edge ⋈ label on dst, groupBy src MIN) with
      map-side partial aggregation; rounds = graph diameter; labels
      persist per round and unpersist the previous round.  The loop
      runs at the fewest partitions that bound per-task edge counts
      (~100k edges/task) — at the threshold boundary that is a handful
      of partitions, scaling back up to full parallelism for genuinely
      large dup graphs.

    The returned label table is persisted (downstream consumers fan out
    over it); ownership transfers to the caller per the
    ``functions.caching`` contract."""
    # Both directions once; every round's join reads this cached table.
    base = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    spark = base.sparkSession
    # NOTE (r13, measured): a limit(N+1) probe looks like it merges the
    # count and the bounded collect into one action, but CollectLimit
    # executes as an INCREMENTAL multi-job scan (1, 4, 16, ... partition
    # batches) that leaves the persist partially materialized — the
    # full bench showed near_dup_clusters +1.2 s.  count-then-collect
    # (two single-pass jobs over the cache) stays.
    n_edges = base.count()
    if n_edges <= max_driver_edges:
        labeled = _driver_components(
            [(r["src"], r["dst"]) for r in base.collect()]
        )
        base.unpersist()
        out = spark.createDataFrame(
            labeled, "doc_id bigint, cluster_id bigint"
        ).persist()
        return attach_cached_deps(out, out)
    sc = spark.sparkContext
    p = int(max(1, min(sc.defaultParallelism, n_edges // 100_000 + 1)))
    und = base.repartition(p, "dst").persist()
    und.count()  # materialize from the cached base before dropping it
    base.unpersist()
    active = (
        und.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .repartition(p, "doc_id")
        .persist()
    )
    prev = active
    for _ in range(max_iter):
        nbr_min = (
            und.join(active, und.dst == active.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new = (
            active.join(nbr_min, active.doc_id == nbr_min.src, "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("old_label"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .persist()
        )
        # One action: materializes the round AND yields the change count.
        changed = new.agg(
            F.sum((F.col("cluster_id") != F.col("old_label")).cast("int"))
        ).first()[0]
        # unpersist the PERSISTED previous-round object (a derived
        # select would silently no-op and leak every round's cache)
        prev.unpersist()
        prev = new
        active = new.select("doc_id", "cluster_id")
        if not changed:
            break
    und.unpersist()
    return attach_cached_deps(active, prev)


def near_dup_clusters(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Duplicate clusters over the corpus: (doc_id, cluster_id,
    cluster_size, is_canonical).  ``is_canonical`` marks the one kept
    doc per cluster (min doc_id); filtering on it IS the dedup.

    Cluster sizes are aggregated over the edge-touched nodes only;
    untouched docs join in as size-1 singletons via one anti-join —
    the corpus-sized side of the plan is a single pass."""
    nd = near_dup_pairs(docs, text_col, threshold)
    # materialize the pair table before connected_components reads it
    # from both union branches (unpersisted, the band join + Jaccard
    # verify would run twice inside base's first action)
    pairs = nd.select("doc_a", "doc_b").persist()
    pairs.count()
    comp = connected_components(pairs)  # persisted; ownership tagged
    # components are materialized, so the shingle cache near_dup_pairs
    # owns — and the pair table itself — can be released here:
    # downstream reads comp, not the pair plan
    release_cached(nd)
    pairs.unpersist()
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    clustered = comp.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
    singletons = (
        docs.select("doc_id")
        .join(comp.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.lit(True).alias("is_canonical"),
        )
    )
    return attach_cached_deps(
        clustered.union(singletons), *carried_deps(comp)
    )


def dedup_keep(docs: DataFrame, text_col: str = "text",
               threshold: float = 0.5) -> DataFrame:
    """The deduplicated corpus: canonical doc per near-dup cluster.
    Non-canonical ids are a tiny set (edge-touched losers), so the
    corpus-side filter is one anti-join against a broadcastable list."""
    clusters = near_dup_clusters(docs, text_col, threshold)
    drop = clusters.filter(~F.col("is_canonical")).select("doc_id")
    return attach_cached_deps(
        docs.join(drop, "doc_id", "left_anti"), *carried_deps(clusters)
    )


def dedup_keep_best(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Quality-aware corpus dedup: per near-dup cluster keep the
    HIGHEST-quality document (``text.quality_score``; ties broken by
    min doc_id) instead of ``dedup_keep``'s min-id convention — what a
    production curation pipeline actually wants: when a template
    spawned many variants, retain the best-written one.

    Scale shape: quality is scored ONLY for edge-touched docs (the
    multi-doc clusters — a tiny fraction of the corpus), ranked with a
    per-cluster window over that bounded set, and the loser ids come
    back as one anti-join against the corpus — the full corpus is
    never windowed or scored.  Output: kept docs with their quality.
    """
    from pyspark.sql import Window

    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        quality_score,
    )

    clusters = near_dup_clusters(docs, text_col, threshold)
    touched = clusters.filter(F.col("cluster_size") > 1).select(
        "doc_id", "cluster_id"
    )
    scored = touched.join(docs, "doc_id").select(
        "doc_id", "cluster_id", quality_score(F.col(text_col)).alias("q")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("q"), F.asc("doc_id")
    )
    drop = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    kept = docs.join(drop, "doc_id", "left_anti").select(
        "doc_id",
        "source",
        "lang",
        quality_score(F.col(text_col)).alias("quality"),
    )
    return attach_cached_deps(kept, *carried_deps(clusters))


def oracle_dedup_keep_best_sql(
    table: str = "documents", t: str = "text", threshold: float = 0.5
) -> str:
    """DuckDB oracle: same ranked-by-quality canonical pick."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.text import (
        sql_quality_score,
    )

    clusters = oracle_near_dup_clusters_sql(table, t, threshold)
    q = sql_quality_score(f"d.{t}")
    qd = sql_quality_score(f"dd.{t}")
    return f"""
        WITH ranked AS (
            SELECT cl.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY cl.cluster_id
                       ORDER BY {qd} DESC, cl.doc_id ASC) AS rn
            FROM ({clusters}) cl
            JOIN {table} dd ON cl.doc_id = dd.doc_id
            WHERE cl.cluster_size > 1
        )
        SELECT d.doc_id, d.source, d.lang, {q} AS quality
        FROM {table} d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
    """


def oracle_dedup_keep_sql(
    table: str = "documents",
    t: str = "text",
    threshold: float = 0.5,
    select: str = "d.doc_id, d.source, d.lang",
) -> str:
    """DuckDB oracle for the deduplicated corpus: docs whose cluster
    row is canonical (singletons included — every doc appears in the
    cluster result)."""
    clusters = oracle_near_dup_clusters_sql(table, t, threshold)
    return f"""
        SELECT {select}
        FROM {table} d
        JOIN ({clusters}) cl ON d.doc_id = cl.doc_id
        WHERE cl.is_canonical
    """


def oracle_near_dup_clusters_sql(
    table: str = "documents", t: str = "text", threshold: float = 0.5
) -> str:
    """DuckDB oracle: same fixpoint via a recursive CTE — walk the
    undirected edge set from every node; MIN(reached label) per node is
    the component minimum (identical to the propagation fixpoint)."""
    nd = oracle_near_dup_pairs_sql(table, t, threshold)
    return f"""
        WITH RECURSIVE nd AS ({nd}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM nd
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM nd
        ),
        walk(doc_id, label) AS (
            SELECT doc_id, doc_id FROM {table}
            UNION
            SELECT e.dst, w.label
            FROM walk w JOIN edges e ON e.src = w.doc_id
        ),
        comp AS (
            SELECT doc_id, MIN(label) AS cluster_id FROM walk GROUP BY doc_id
        )
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               doc_id = cluster_id AS is_canonical
        FROM comp
    """


# ---------------------------------------------------------------------------
# PageRank (Page et al. 1999) over the near-duplicate graph — graph
# centrality beyond component membership: within a duplicate cluster,
# high-rank nodes are the "hub" variants (copied the most), a useful
# canonical-pick / provenance signal that cluster_size can't give.
#
# INTEGER-EXACT fixed-point arithmetic: ranks are scaled by 10^6 and
# every operation (the 0.85 damping product, the out-degree division)
# is 64-bit integer math with a pinned operation order, so Spark's
# partially-aggregated sums and DuckDB's serial sums agree bit-for-bit
# and the gate can hash-compare an ITERATIVE float-free algorithm.
# Fixed iteration count (unrolled as CTEs in the oracle) keeps the
# result engine-independent — no float-threshold convergence test.
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000   # rank fixed-point scale
PR_DAMP_NUM = 85       # damping 0.85 as 85/100
PR_DAMP_DEN = 100
PR_BASE = 150_000      # (1 - 0.85) * PR_SCALE
PR_ITERS = 3


def _driver_pagerank(
    pairs: list, iters: int
) -> list[tuple[int, int]]:
    """Fixed-point PageRank over a BOUNDED undirected edge list, in
    arbitrary-precision Python ints — bit-identical to the distributed
    loop and the oracle's BIGINT math (all values positive, division
    order pinned)."""
    from collections import defaultdict

    adj: dict[int, list[int]] = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    pr = {v: PR_SCALE for v in adj}
    for _ in range(iters):
        nxt = {v: PR_BASE for v in adj}
        for u, nbrs in adj.items():
            c = (pr[u] * PR_DAMP_NUM) // (len(nbrs) * PR_DAMP_DEN)
            for v in nbrs:
                nxt[v] += c
        pr = nxt
    return sorted(pr.items())


def pagerank_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    iters: int = PR_ITERS,
    max_driver_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """(doc_id, pagerank_scaled): fixed-point PageRank over the
    undirected near-dup graph's edge-touched nodes.

    Same dual-path contract as ``connected_components``: under the
    bounded-collect threshold the (tiny, edge-touched) pair list runs
    through a driver fixed-point loop — identical integer arithmetic,
    test-enforced against the distributed path — because a handful of
    Spark jobs over a few hundred cached rows costs more wall-clock
    than the entire computation.  Above it, the distributed loop: the
    directed edge table joins its out-degrees ONCE and persists at
    graph-sized partition counts; each iteration is then exactly one
    hash join plus one map-side-combinable SUM — iterations add plan
    depth, not extra scans.  The undirected graph has no dangling
    nodes (every edge-touched node has out-degree >= 1), so no
    dangling-mass correction term is needed."""
    # The pair table feeds FOUR lineage sites (two union branches, each
    # read by both the degree agg and the edge join) — persist and
    # materialize it first or the whole near-dup pipeline re-runs per
    # site (measured 12s vs ~4s at sf0.1).
    pairs = near_dup_pairs(docs, text_col, threshold).persist()
    n_pairs = pairs.count()
    spark = pairs.sparkSession
    if n_pairs <= max_driver_edges:
        ranked = _driver_pagerank(
            [(r["doc_a"], r["doc_b"]) for r in pairs.collect()], iters
        )
        release_cached(pairs)
        pairs.unpersist()
        return spark.createDataFrame(
            ranked, "doc_id bigint, pagerank_scaled bigint"
        )
    # doc_a < doc_b and distinct upstream: both directions union-ALL safe
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = edges.join(deg, "src").persist()
    n_edges = base.count()
    sc = spark.sparkContext
    p = int(max(1, min(sc.defaultParallelism, n_edges // 100_000 + 1)))
    e = base.repartition(p, "src").persist()
    e.count()
    base.unpersist()
    pr = (
        e.select("src")
        .distinct()
        .withColumnRenamed("src", "doc_id")
        .withColumn("pr", F.lit(PR_SCALE).cast("long"))
    )
    for _ in range(iters):
        contrib = e.join(pr, e.src == pr.doc_id).select(
            F.col("dst"),
            F.expr(
                f"CAST((pr * {PR_DAMP_NUM}) DIV (deg * {PR_DAMP_DEN}) "
                "AS BIGINT)"
            ).alias("c"),
        )
        pr = contrib.groupBy("dst").agg(
            (F.lit(PR_BASE) + F.sum("c")).cast("long").alias("pr")
        ).withColumnRenamed("dst", "doc_id")
    out = pr.select("doc_id", F.col("pr").alias("pagerank_scaled"))
    return attach_cached_deps(out, *carried_deps(pairs), pairs, e)


def oracle_pagerank_near_dups_sql(
    table: str = "documents",
    t: str = "text",
    threshold: float = 0.5,
    iters: int = PR_ITERS,
) -> str:
    nd = oracle_near_dup_pairs_sql(table, t, threshold)
    steps = []
    for i in range(iters):
        steps.append(
            f"""pr{i + 1} AS (
            SELECT e.dst AS doc_id,
                   CAST({PR_BASE} + SUM((p.pr * {PR_DAMP_NUM})
                        // (e.deg * {PR_DAMP_DEN})) AS BIGINT) AS pr
            FROM e JOIN pr{i} p ON e.src = p.doc_id
            GROUP BY e.dst
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH nd AS ({nd}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM nd
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM nd
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        e AS (SELECT edges.src, edges.dst, deg.deg
              FROM edges JOIN deg USING (src)),
        pr0 AS (SELECT src AS doc_id, CAST({PR_SCALE} AS BIGINT) AS pr
                FROM deg),
        {chain}
        SELECT doc_id, pr AS pagerank_scaled FROM pr{iters}
    """


def dup_triangles(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Per-node triangle counts over the near-dup graph:
    (doc_id, n_triangles) for every node participating in at least one
    triangle — the local clustering signal that separates tight
    mutual-duplicate cliques from star-shaped template families (a hub
    template pairs with many docs that do NOT pair with each other:
    zero triangles; a true 3-way duplicate group closes them).

    Plan: the ordered (a < b) pair table is materialized once, then
    triangles enumerate via the standard two-join wedge closure —
    every triangle a < b < c is counted exactly once as
    (ab ⋈ bc ⋈ ac).  Join keys are doc ids; with the df-capped pair
    generation upstream the edge list is duplicate-graph-sized, not
    corpus-sized."""
    pairs = near_dup_pairs(docs, text_col, threshold).persist()
    pairs.count()
    e = pairs.select("doc_a", "doc_b")
    ab = e.alias("ab")
    bc = e.alias("bc")
    ac = e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.doc_b") == F.col("bc.doc_a"))
        .join(
            ac,
            (F.col("ac.doc_a") == F.col("ab.doc_a"))
            & (F.col("ac.doc_b") == F.col("bc.doc_b")),
        )
        .select(
            F.col("ab.doc_a").alias("a"),
            F.col("ab.doc_b").alias("b"),
            F.col("bc.doc_b").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("doc_id"))
        .union(tri.select(F.col("b").alias("doc_id")))
        .union(tri.select(F.col("c").alias("doc_id")))
    )
    out = nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return attach_cached_deps(out, *carried_deps(pairs), pairs)


def oracle_dup_triangles_sql(
    table: str = "documents", t: str = "text", threshold: float = 0.5
) -> str:
    nd = oracle_near_dup_pairs_sql(table, t, threshold)
    return f"""
        WITH nd AS ({nd}),
        e AS (SELECT doc_a, doc_b FROM nd),
        tri AS (
            SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
            FROM e ab
            JOIN e bc ON ab.doc_b = bc.doc_a
            JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
        ),
        nodes AS (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY doc_id
    """


def cluster_size_histogram(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """(cluster_size, n_clusters, n_docs): the near-dup cluster-size
    distribution — the one-glance corpus-health chart (a heavy tail of
    giant clusters = template/boilerplate infestation; all-singletons =
    the dedup already happened).  Derived from near_dup_clusters with
    one extra tiny aggregate over the cluster table."""
    clusters = near_dup_clusters(docs, text_col, threshold)
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    out = per_cluster.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).cast("long").alias("n_docs"),
    )
    return attach_cached_deps(out, *carried_deps(clusters))


def oracle_cluster_size_histogram_sql(
    table: str = "documents", t: str = "text", threshold: float = 0.5
) -> str:
    clusters = oracle_near_dup_clusters_sql(table, t, threshold)
    return f"""
        WITH cl AS ({clusters}),
        per_cluster AS (
            SELECT cluster_id, COUNT(*) AS cluster_size
            FROM cl GROUP BY cluster_id
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM per_cluster GROUP BY cluster_size
    """
