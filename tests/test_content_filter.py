"""Content-filter tests — ported from the reference's own suite
(tests/async/test_content_filter_prune.py) plus BM25 and Spark-stage
coverage."""

from __future__ import annotations

from crawl4ai_spark.functions.content_filter import (
    bm25_filter_blocks,
    clean_tokens,
    extract_page_query,
    extract_text_chunks,
    fit_markdown_stage,
    prune_filter_blocks,
)
from crawl4ai_spark.functions.scrape import parse_dom

BASIC_HTML = """
<html>
    <body>
        <article>
            <h1>Main Article</h1>
            <p>This is a high-quality paragraph with substantial text content. It contains enough words to pass the threshold and has good text density without too many links. This kind of content should survive the pruning process.</p>
            <div class="sidebar">Low quality sidebar content</div>
            <div class="social-share">Share buttons</div>
        </article>
    </body>
</html>
"""

LINK_HEAVY_HTML = """
<html>
    <body>
        <div class="content">
            <p>Good content paragraph that should remain.</p>
            <div class="links">
                <a href="#">Link 1</a>
                <a href="#">Link 2</a>
                <a href="#">Link 3</a>
                <a href="#">Link 4</a>
            </div>
        </div>
    </body>
</html>
"""

MIXED_HTML = """
<html>
    <body>
        <article>
            <h1>Article Title</h1>
            <p class="summary">Short summary.</p>
            <div class="content">
                <p>Long high-quality paragraph with substantial content that should definitely survive the pruning process. This content has good text density and proper formatting which makes it valuable for retention.</p>
            </div>
            <div class="comments">
                <p>Short comment 1</p>
                <p>Short comment 2</p>
            </div>
        </article>
    </body>
</html>
"""


class TestPruning:
    def test_basic_pruning(self):
        contents = prune_filter_blocks(BASIC_HTML, min_word_threshold=5)
        combined = " ".join(contents).lower()
        assert "high-quality paragraph" in combined
        assert "sidebar content" not in combined
        assert "share buttons" not in combined

    def test_min_word_threshold(self):
        contents = prune_filter_blocks(MIXED_HTML, min_word_threshold=10)
        combined = " ".join(contents).lower()
        assert "short summary" not in combined
        assert "long high-quality paragraph" in combined
        assert "short comment" not in combined

    def test_threshold_types_differ(self):
        """Dynamic thresholds relax for high-importance tags: a
        link-only <p> scoring between the fixed threshold and the
        modifier-adjusted dynamic one survives only under dynamic
        (fixed 0.6 removes score .588; dynamic th = .6*0.8*1.2 = .576)."""
        html = (
            "<body><article>\n"
            "<p>This is a long high quality paragraph with plenty of running"
            " text that scores far above any threshold because of its density"
            " and length and clean structure and more words here.</p>\n"
            '<p><a href="/x">links here</a></p>\n'
            "</article></body>"
        )
        fixed = prune_filter_blocks(html, threshold_type="fixed", threshold=0.6)
        dynamic = prune_filter_blocks(html, threshold_type="dynamic", threshold=0.6)
        assert "href" not in " ".join(fixed)
        assert "href" in " ".join(dynamic)

    def test_link_density_impact(self):
        contents = prune_filter_blocks(LINK_HEAVY_HTML, threshold_type="dynamic")
        combined = " ".join(contents).lower()
        assert "good content paragraph" in combined
        assert len([c for c in contents if "href" in c]) < 2

    def test_tag_importance(self):
        contents = prune_filter_blocks(MIXED_HTML, threshold_type="dynamic")
        assert any("article" in c.lower() or "h1" in c.lower() for c in contents)

    def test_empty_input(self):
        assert prune_filter_blocks("") == []
        assert prune_filter_blocks(None) == []

    def test_malformed_html(self):
        out = prune_filter_blocks("<div>Unclosed div<p>Nested<span>content</div>")
        assert isinstance(out, list)


class TestBM25Filter:
    def test_query_relevant_blocks_survive(self):
        html = """
        <html><head><title>spark engines</title></head><body>
        <h1>spark engines overview</h1>
        <p>spark engines process queries with spark runtime spark optimizer
           spark executors and more spark spark spark details here.</p>
        <p>bananas oranges apples grapes pears melons kiwis plums.</p>
        </body></html>
        """
        blocks = bm25_filter_blocks(html, bm25_threshold=0.5)
        combined = " ".join(blocks).lower()
        assert "spark" in combined
        assert "bananas" not in combined

    def test_no_query_no_metadata_no_blocks(self):
        assert bm25_filter_blocks("<body><p>tiny</p></body>") == []

    def test_user_query_overrides(self):
        html = "<body><p>alpha beta gamma delta epsilon content words</p></body>"
        blocks = bm25_filter_blocks(html, user_query="gamma delta")
        assert len(blocks) >= 0  # runs; scoring path exercised

    def test_document_order_preserved(self):
        html = """
        <html><head><title>query terms</title></head><body>
        <p>second chunk mentions query terms terms query lightly here.</p>
        <h2>query terms heading</h2>
        <p>third block query terms query terms query terms again.</p>
        </body></html>
        """
        blocks = bm25_filter_blocks(html, bm25_threshold=0.1)
        text = " ".join(blocks)
        assert text.find("second") < text.find("third") or "second" not in text


class TestChunkExtraction:
    def test_inline_tags_do_not_break(self):
        """Inline elements accumulate into one chunk. NOTE: the
        reference strips each string piece and joins with '' (then
        whitespace-normalizes), so inline boundaries lose their spaces
        — 'startboldandlinkend.' is the reference's actual output and
        we reproduce it faithfully."""
        body = parse_dom(
            "<body><p>start <b>bold</b> and <a href='/x'>link</a> end.</p>"
            "<h2>Header Text</h2></body>"
        )
        chunks = extract_text_chunks(body)
        assert chunks[0][1] == "startboldandlinkend."
        assert ("Header Text", "header") == (chunks[1][1], chunks[1][2])

    def test_page_query_fallback_paragraph(self):
        html = "<body><p>" + "word " * 40 + "</p></body>"
        root = parse_dom(html)
        q = extract_page_query(root, root)
        assert q.startswith("word word")
        assert len(q) <= 150

    def test_clean_tokens(self):
        toks = clean_tokens(["the", "spark", "and", "engine", "it", "up", "ab"])
        assert toks == ["spark", "engine"]


def test_fit_markdown_stage_spark(spark, sf_dir):
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, sf_dir).limit(10)
    out = fit_markdown_stage(pages, html_col="html", url_col="url").collect()
    assert len(out) == 10
    for r in out:
        assert r["fit_html"] is not None
        assert r["fit_markdown"] is not None
        # boilerplate (nav/script) never survives the pruning filter
        assert "<nav>" not in r["fit_html"]
        assert "tracker" not in r["fit_markdown"]


def test_bm25_stemming_differential():
    """Inflected terms must match the query only when stemming is on —
    the reference's default (content_filter_strategy.py:408)."""
    from crawl4ai_spark.functions.content_filter import bm25_filter_blocks

    html = (
        "<html><head><title>connection guide</title></head><body>"
        "<p>connected connecting connections everywhere in this text</p>"
        "<p>utterly unrelated filler words about zebras galore</p>"
        "<p>more filler prose discussing pelicans and granite quarries</p>"
        "<p>further filler sentences covering kilns and tidal estuaries</p>"
        "</body></html>"
    )
    stemmed = bm25_filter_blocks(html, bm25_threshold=0.4, use_stemming=True)
    plain = bm25_filter_blocks(html, bm25_threshold=0.4, use_stemming=False)
    assert any("connected" in b for b in stemmed)
    assert not any("connected" in b for b in plain)


def test_bm25_stemming_default_on():
    import inspect

    from crawl4ai_spark.functions.content_filter import (
        bm25_filter_blocks,
        fit_markdown_stage,
    )

    assert inspect.signature(bm25_filter_blocks).parameters[
        "use_stemming"
    ].default is True
    assert inspect.signature(fit_markdown_stage).parameters[
        "use_stemming"
    ].default is True
