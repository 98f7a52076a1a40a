"""HTML main-content extraction (operators/html.py)."""

from __future__ import annotations

from retail_etl_pipeline_airflow_s3_athena_spark.operators import html as H


def test_boilerplate_subtrees_dropped_content_kept():
    page = (
        "<html><head><title>T</title><script>var x = '<p>fake</p>';"
        "</script></head><body><nav>Home About</nav>"
        "<main><p>real   content</p><p>more</p></main>"
        "<footer>legal</footer></body></html>"
    )
    text, kept, dropped = H.extract_text(page)
    assert text == "real content more"
    # dropped chars: title + the whole script body (markup inside a
    # script is CDATA, not elements) + nav + footer
    assert dropped == len("T") + len("var x = '<p>fake</p>';") + len(
        "Home About"
    ) + len("legal")


def test_nested_drop_and_entities():
    page = (
        "<body><aside>skip <div>this too</div> entirely</aside>"
        "<p>a &amp; b &lt;c&gt;</p></body>"
    )
    text, _k, _d = H.extract_text(page)
    assert text == "a & b <c>"


def test_void_elements_do_not_unbalance_the_drop_stack():
    page = "<body><nav>menu<br>more</nav><p>keep</p></body>"
    text, _k, _d = H.extract_text(page)
    assert text == "keep"


def test_wrap_extract_roundtrip_with_special_chars(spark):
    rows = [
        (1, "a & b < c > d", "en", "srcX", 13),
        (2, "plain words here", "en", "srcY", 16),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {
        r["doc_id"]: r
        for r in H.html_extract_roundtrip(docs).collect()
    }
    for did, text, _l, src, _n in rows:
        assert out[did]["text"] == text
        assert out[did]["source"] == src
        assert out[did]["boilerplate_e4"] > 0


def test_boilerplate_formula_matches_operator(spark, sf_dir):
    """The oracle's closed-form dropped-char count equals the
    operator's measured one for every fixture doc."""
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir).limit(50)
    for r in H.html_extract_roundtrip(docs).collect():
        dropped = 83 + 2 * len(str(r["doc_id"])) + len(r["source"])
        want = dropped * 10**4 // (len(r["text"]) + dropped)
        assert r["boilerplate_e4"] == want
