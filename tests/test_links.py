"""WAT-style link extraction tests: parser, RFC 3986 resolution
branches, scheme filtering, and the distributed graph/frontier
operators on hand-built inputs."""

from __future__ import annotations

from retail_etl_pipeline_airflow_s3_athena_spark.operators import links as links_ops


def test_extract_hrefs_order_and_entities():
    html = (
        '<html><body><a href="/a?x=1&amp;y=2">one</a>'
        "<a>no-href</a><A HREF='/b'>caps</A>"
        '<a href="#frag">f</a></body></html>'
    )
    assert links_ops.extract_hrefs(html) == [
        "/a?x=1&y=2",
        "/b",
        "#frag",
    ]


def test_resolve_link_branches():
    base = "http://a.example.com/doc/3"
    assert (
        links_ops.resolve_link(base, "../doc/5")
        == "http://a.example.com/doc/5"
    )
    assert (
        links_ops.resolve_link(base, "/doc/7")
        == "http://a.example.com/doc/7"
    )
    assert (
        links_ops.resolve_link(base, "//cdn.example.net/lib/2")
        == "http://cdn.example.net/lib/2"
    )
    # fragment-only resolves to the base itself, fragment stripped
    assert links_ops.resolve_link(base, "#top") == base
    assert (
        links_ops.resolve_link(base, "https://other.test/x#y")
        == "https://other.test/x"
    )
    assert links_ops.resolve_link(base, "mailto:a@b.c") is None
    assert links_ops.resolve_link(base, "javascript:void(0)") is None
    assert links_ops.resolve_link(base, "data:text/plain,hi") is None


def test_page_links_distributed(spark):
    pages = spark.createDataFrame(
        [
            (
                1,
                "http://h.example/dir/page",
                '<a href="sub">s</a><a href="mailto:x@y">m</a>'
                '<a href="http://z.test/q?a=1#f">z</a>',
            ),
            (2, "http://h.example/", "<p>no links</p>"),
        ],
        ["doc_id", "url", "html"],
    )
    rows = sorted(
        (r["doc_id"], r["href"], r["dst_url"])
        for r in links_ops.page_links(pages).collect()
    )
    assert rows == [
        (1, "http://z.test/q?a=1#f", "http://z.test/q?a=1"),
        (1, "sub", "http://h.example/dir/sub"),
    ]


def test_graph_and_frontier(spark):
    links = spark.createDataFrame(
        [
            (1, "http://a.ex/p", "x", "http://b.ex/1"),
            (1, "http://a.ex/p", "y", "http://b.ex/2"),
            (2, "http://b.ex/1", "z", "http://b.ex/2"),
            (3, "http://b.ex/1", "w", "http://a.ex/p"),
        ],
        ["doc_id", "src_url", "href", "dst_url"],
    )
    captured = spark.createDataFrame(
        [("http://a.ex/p",), ("http://b.ex/1",)], ["url"]
    )
    graph = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in links_ops.host_link_graph(links).collect()
    }
    assert graph == {("a.ex", "b.ex"): 2, ("b.ex", "b.ex"): 1, ("b.ex", "a.ex"): 1}
    frontier = {
        r["dst_host"]: (r["n_new_urls"], r["in_degree"])
        for r in links_ops.crawl_frontier(links, captured).collect()
    }
    # b.ex/2 is discovered twice and never captured; everything else
    # anti-joins away
    assert frontier == {"b.ex": (1, 2)}


def _py_host_authority(edges, iters):
    """Independent pure-Python twin: edges = [(src, dst, w)]."""
    from retail_etl_pipeline_airflow_s3_athena_spark.operators.links import (
        PR_BASE,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    pr = {h: PR_SCALE for h in nodes}
    for _ in range(iters):
        dm = sum(p for h, p in pr.items() if h not in outw)
        nxt = {h: PR_BASE + (dm * PR_DAMP_NUM) // (len(nodes) * PR_DAMP_DEN)
               for h in nodes}
        for s, d, w in edges:
            nxt[d] += (pr[s] * PR_DAMP_NUM * w) // (outw[s] * PR_DAMP_DEN)
        pr = nxt
    return pr


def test_host_authority_fixed_point(spark):
    """Weighted contributions, dangling redistribution, and exact
    integer arithmetic against an independent local twin."""
    from retail_etl_pipeline_airflow_s3_athena_spark.functions.caching import (
        release_cached,
    )

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "a", 1)]
    graph = spark.createDataFrame(
        edges, ["src_host", "dst_host", "n_links"]
    )
    for iters in (1, 3):
        df = links_ops.host_authority(graph, iters=iters)
        got = {r["host"]: r["authority_scaled"] for r in df.collect()}
        release_cached(df)
        assert got == _py_host_authority(edges, iters)
    # hand-check one step: c is dangling with pr 1e6; its mass spreads
    # (1e6*85)//(3*100) to every node
    one = _py_host_authority(edges, 1)
    assert one["a"] == 150_000 + 850_000 + 283_333
    assert one["b"] == 150_000 + 566_666 + 283_333
    assert one["c"] == 150_000 + 283_333 + 283_333
