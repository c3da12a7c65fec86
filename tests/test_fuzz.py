"""Property-based robustness: the per-page scalar pipeline must never
raise on arbitrary input — a crawler eats the web's worst HTML."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.functions.content_filter import (
    bm25_filter_blocks,
    prune_filter_blocks,
)
from crawl4ai_spark.functions.markdown import html_to_markdown, links_to_citations
from crawl4ai_spark.functions.schema_extract import json_css_extract
from crawl4ai_spark.functions.scrape import scrape_one
from crawl4ai_spark.functions.tables import extract_data_tables
from crawl4ai_spark.functions.urls import canonicalize_url, get_base_domain_py

# text that looks vaguely like broken markup
_tagchars = st.sampled_from(list("<>/=\"'& abcdefghij\n\t!-[]()#*_`."))
fuzzy_html = st.text(alphabet=_tagchars, max_size=400)
any_text = st.text(max_size=300)

SCHEMA = {
    "baseSelector": "div",
    "fields": [
        {"name": "t", "selector": "p", "type": "text"},
        {"name": "l", "selector": "a", "type": "attribute", "attribute": "href"},
    ],
}


@settings(max_examples=200, deadline=None)
@given(fuzzy_html)
def test_markdown_never_raises(html):
    out = html_to_markdown(html, "https://x.com/a/b.html")
    assert isinstance(out, str)
    cit, refs = links_to_citations(out, "https://x.com/a/b.html")
    assert isinstance(cit, str) and isinstance(refs, str)


@settings(max_examples=200, deadline=None)
@given(fuzzy_html)
def test_scrape_never_raises(html):
    r = scrape_one(html, "https://x.com/p")
    assert isinstance(r["links"], list)
    assert isinstance(r["text"], str)


@settings(max_examples=100, deadline=None)
@given(fuzzy_html)
def test_filters_and_tables_never_raise(html):
    assert isinstance(prune_filter_blocks(html), list)
    assert isinstance(bm25_filter_blocks(html), list)
    assert isinstance(extract_data_tables(html), list)
    assert isinstance(json_css_extract(html, SCHEMA), list)


@settings(max_examples=200, deadline=None)
@given(any_text, any_text)
def test_canonicalize_never_raises(href, base):
    try:
        out = canonicalize_url(href, "https://base.example.com/" + base)
    except ValueError:
        return  # invalid base is an accepted, typed failure
    assert out is None or isinstance(out, str)
    get_base_domain_py("https://h.example.com/" + href)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_scrape_binary_garbage(b):
    r = scrape_one(b, "https://x.com/p")
    assert r["success"] in (True, False)


@given(any_text)
@settings(max_examples=300, deadline=None)
def test_stemmer_never_raises(word):
    from crawl4ai_spark.functions.stemmer import stem_word

    out = stem_word(word)
    assert isinstance(out, str)


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_pdf_parser_never_raises(blob):
    from crawl4ai_spark.functions.pdf import parse_pdf

    res = parse_pdf(b"%PDF-1.4\n" + blob)
    assert isinstance(res["pages"], list)
    assert parse_pdf(blob)["metadata"]["n_pages"] >= 0


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_der_parser_never_raises(blob):
    from crawl4ai_spark.functions.ssl_cert import parse_certificate

    res = parse_certificate(b"\x30" + blob)
    assert res is None or isinstance(res, dict)


@given(fuzzy_html, st.text(alphabet=list("/@=[]'\"abcp*(). 0123|:-!<>$"), max_size=60))
@settings(max_examples=300, deadline=None)
def test_xpath_engine_rejects_or_evaluates(html, expr):
    """Any expression either evaluates or raises ValueError at compile
    time — never an unhandled crash mid-DOM."""
    from crawl4ai_spark.functions.schema_extract import xpath_select
    from crawl4ai_spark.functions.scrape import parse_dom

    root = parse_dom(html)
    try:
        out = xpath_select(root, expr)
    except ValueError:
        return
    assert isinstance(out, list)


@given(fuzzy_html)
@settings(max_examples=150, deadline=None)
def test_schema_infer_never_raises(html):
    from crawl4ai_spark.functions.schema_infer import infer_schema

    schema = infer_schema(html)
    assert schema is None or "baseSelector" in schema


_XP_PIECES = st.sampled_from([
    "//", "/", "..", "p", "a", "*", "text()", "@href",
    "[1]", "[last()]", "[position()<=2]", "[@a]", "[@a='v']", "[@a!='v']",
    "[contains(@a, 'x')]", "[starts-with(@a, 'x')]", "[contains(., 'x')]",
    "[not(@a)]", "[p]", "parent::", "ancestor::", "following-sibling::",
    "preceding-sibling::", " | ",
])


@given(fuzzy_html, st.lists(_XP_PIECES, min_size=1, max_size=8))
@settings(max_examples=300, deadline=None)
def test_xpath_grammar_pieces_reject_or_evaluate(html, pieces):
    """Random concatenations of VALID grammar fragments — many are
    syntactically broken; all must compile-error or evaluate."""
    from crawl4ai_spark.functions.schema_extract import xpath_select
    from crawl4ai_spark.functions.scrape import parse_dom

    expr = "".join(pieces)
    root = parse_dom(html)
    try:
        out = xpath_select(root, expr)
    except ValueError:
        return
    assert isinstance(out, list)


@given(st.text(alphabet=list("abcdef ghij"), max_size=600),
       st.integers(min_value=2, max_value=40))
@settings(max_examples=200, deadline=None)
def test_topic_chunks_py_partition_property(text, w):
    """Topic chunks are a PARTITION of the token stream: rejoining
    them reproduces ' '.join(tokens), chunk boundaries sit on
    pseudo-sentence edges, and no chunk is empty."""
    from crawl4ai_spark.functions.chunking import topic_chunks_py

    chunks = topic_chunks_py(text, w=w)
    toks = text.split()
    assert " ".join(chunks) == " ".join(toks)
    assert all(c for c in chunks)
    acc = 0
    for c in chunks[:-1]:
        acc += len(c.split())
        assert acc % w == 0, "boundary off a pseudo-sentence edge"


@given(st.text(alphabet=list("Ua*$%/#:.-\n ex�😀DisalowCrw"), max_size=400))
@settings(max_examples=300, deadline=None)
def test_robots_parser_never_raises(body):
    """parse_robots_txt + rule compilation accept arbitrary garbage."""
    from crawl4ai_spark.operators.robots import _compile_rule, parse_robots_txt

    r = parse_robots_txt(body)
    assert isinstance(r["disallow"], list) and isinstance(r["allow"], list)
    for rule in r["disallow"] + r["allow"]:
        p, rx, ln = _compile_rule(rule)
        assert ln == len(rule)
        if rx is not None:
            import re as _re

            _re.compile(rx)  # every compiled pattern must be valid
