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
