"""HTML main-content extraction — the step between a web crawl and a
document table (the trafilatura/jusText tier of a training-data
pipeline: strip scripts, styles, and navigation boilerplate; keep the
article text).

Deterministic stdlib implementation (``html.parser.HTMLParser``):

- DROP subtrees rooted at ``script``, ``style``, ``noscript``,
  ``nav``, ``header``, ``footer``, ``aside``, ``template`` — the
  boilerplate tags the readability heuristics all start from;
- KEEP character data elsewhere, entity-unescaped (the parser does
  RFC-standard entity resolution), whitespace-normalized: runs of
  whitespace collapse to one space, output trimmed — the
  normalization every text pipeline applies before tokenization;
- count kept vs dropped characters so the operator also emits the
  BOILERPLATE RATIO (scaled integer e4) — the quality signal CCNet-
  style filters threshold on.

The round-trip gate (`html_extract_docs`): the documents table is
wrapped distributed into realistic page templates (title, script,
style, nav list, main/p content, footer — built with NATIVE concat
expressions, codegen end-to-end), then the extractor must recover
EXACTLY the whitespace-normalized original text.  The oracle is plain
SQL over ``documents`` — any dropped word, leaked boilerplate, broken
entity, or whitespace drift flips the value hash.

Scale shape: wrapping is a pure projection; extraction is the codec-
tier Arrow ``mapInPandas`` projection (HTMLParser is a byte-loop —
honest Python, the lxml swap-in point).  No shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DROP_TAGS = {
    "script", "style", "noscript", "nav", "header", "footer",
    "aside", "template", "title",
}

# void elements never push/pop the drop stack (they cannot nest text)
_VOID = {"br", "hr", "img", "meta", "link", "input"}

# block-level boundaries contribute a whitespace separator so adjacent
# blocks ("<p>a</p><p>b</p>") don't fuse into one word; the collapse
# pass then normalizes every run to a single space
_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "table", "tr", "td", "th", "main",
    "section", "article", "blockquote", "br", "h1", "h2", "h3", "h4",
    "h5", "h6",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.kept: list[str] = []
        self.dropped_chars = 0
        self._drop_depth = 0

    def _block_sep(self, tag: str) -> None:
        if self._drop_depth == 0 and tag in _BLOCK_TAGS:
            self.kept.append(" ")

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS and tag not in _VOID:
            self._drop_depth += 1
        else:
            self._block_sep(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS and self._drop_depth > 0:
            self._drop_depth -= 1
        else:
            self._block_sep(tag)

    def handle_data(self, data: str) -> None:
        if self._drop_depth > 0:
            self.dropped_chars += len(data)
        else:
            self.kept.append(data)


def extract_text(html: str) -> tuple[str, int, int]:
    """-> (normalized main text, kept_chars, dropped_chars).  The
    text is entity-unescaped, whitespace-collapsed, trimmed."""
    p = _Extractor()
    p.feed(html)
    p.close()
    raw = "".join(p.kept)
    text = " ".join(raw.split())
    return text, len(text), p.dropped_chars


EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("boilerplate_e4", T.LongType()),
    ]
)


def html_extract(pages: DataFrame) -> DataFrame:
    """(doc_id, source, html) -> (doc_id, source, text,
    boilerplate_e4) where boilerplate_e4 = dropped/(dropped+kept)
    scaled 1e4 (truncating integer division — hash-exact)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, src, page in zip(
                pdf["doc_id"], pdf["source"], pdf["html"]
            ):
                text, kept, dropped = extract_text(str(page))
                denom = kept + dropped
                rows.append(
                    (
                        int(did),
                        str(src),
                        text,
                        (dropped * 10**4) // denom if denom else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXTRACT_SCHEMA.fields]
            )

    return pages.mapInPandas(batches, EXTRACT_SCHEMA)


def html_page_expr() -> "F.Column":
    """The page template as a reusable column expression over
    (doc_id, text, source) — shared by wrap_docs_as_pages and the
    fused crawl pipeline (plans/crawl.py), which needs to carry extra
    columns (the capture URL) alongside the page."""
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var tracker = 'id-"),
        F.col("doc_id").cast("string"),
        F.lit("';</script><style>.m{margin:0}</style></head><body>"),
        F.lit("<nav><ul><li>Home</li><li>About</li><li>Archive</li>"
              "</ul></nav><main><p>"),
        esc,
        F.lit("</p></main><footer>&copy; corpus "),
        F.col("source"),
        F.lit(" &middot; all rights reserved</footer></body></html>"),
    )


def wrap_docs_as_pages(docs: DataFrame) -> DataFrame:
    """Wrap each document's text in a realistic page template — pure
    native concat expressions (codegen), with entity escaping of the
    payload (&, <, > — the three HTML must escape) so arbitrary text
    survives the round-trip."""
    return docs.select("doc_id", "source", html_page_expr().alias("html"))


def html_extract_roundtrip(docs: DataFrame) -> DataFrame:
    """The gate query: wrap -> extract; must reproduce the original
    text exactly (whitespace-normalized), with a nonzero boilerplate
    share from the nav/footer.  Oracle: plain SQL over documents."""
    return html_extract(wrap_docs_as_pages(docs))


def oracle_html_roundtrip_sql() -> str:
    """DuckDB twin: text comes straight from the table (the fixture
    corpus is already whitespace-normal — asserted in tests);
    boilerplate_e4 re-derives the template's dropped-character count
    in closed form (83 fixed chars + the doc id twice + the source —
    title, script, style, nav, footer data after entity unescape)."""
    dropped = "(83 + 2 * strlen(CAST(doc_id AS VARCHAR)) + strlen(source))"
    return f"""
        SELECT doc_id, source, text,
               CAST(({dropped} * 10000)
                    // (strlen(text) + {dropped}) AS BIGINT)
                   AS boilerplate_e4
        FROM documents ORDER BY doc_id
    """
