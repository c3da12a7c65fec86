"""LinkPreview operator: filter pipeline, head join, relevance and
merge-back semantics (reference link_preview.py:71-380)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.link_preview import (
    LinkPreviewConfig,
    link_preview_stage,
)

LINKS_TYPE = (
    "array<struct<href:string,text:string,title:string,"
    "base_domain:string,is_internal:boolean>>"
)


def _results(spark, rows):
    return spark.createDataFrame(rows, f"url string, links {LINKS_TYPE}")


def _link(href, internal=True, text="t"):
    return (href, text, None, "example.com", internal)


@pytest.fixture(scope="module")
def base(spark):
    results = _results(
        spark,
        [
            (
                "https://a.example.com/p",
                [
                    _link("https://a.example.com/one.html"),
                    _link("https://a.example.com/two.html"),
                    _link("https://a.example.com/skip.pdf"),
                    _link("https://ext.other.net/x", internal=False),
                    _link("https://a.example.com/gone.html"),
                ],
            )
        ],
    )
    heads = spark.createDataFrame(
        [
            ("https://a.example.com/one.html",
             "<head><title>spark guide</title></head>"),
            ("https://a.example.com/two.html",
             "<head><title>zebra news</title></head>"),
            ("https://ext.other.net/x",
             "<head><title>external spark</title></head>"),
        ],
        "url string, head_html string",
    )
    return results, heads


def _by_href(df):
    return {r["href"]: r for r in df.collect()}


def test_patterns_and_miss(spark, base):
    results, heads = base
    cfg = LinkPreviewConfig(include_patterns=("*.html",))
    out = _by_href(link_preview_stage(results, heads, cfg))
    assert out["https://a.example.com/one.html"]["status"] == "valid"
    assert out["https://a.example.com/one.html"]["head_title"] == "spark guide"
    assert out["https://a.example.com/skip.pdf"]["status"] == "skipped"
    assert out["https://ext.other.net/x"]["status"] == "skipped"
    # filtered-in but not in the heads table = unreachable/timeout
    assert out["https://a.example.com/gone.html"]["status"] == "miss"


def test_exclude_patterns_and_external(spark, base):
    results, heads = base
    cfg = LinkPreviewConfig(
        include_external=True, exclude_patterns=("*two*",)
    )
    out = _by_href(link_preview_stage(results, heads, cfg))
    assert out["https://a.example.com/two.html"]["status"] == "skipped"
    assert out["https://ext.other.net/x"]["status"] == "valid"


def test_max_links_cap_internal_first(spark, base):
    results, heads = base
    cfg = LinkPreviewConfig(include_external=True, max_links=2)
    out = _by_href(link_preview_stage(results, heads, cfg))
    # cap applies in (internal-first, document-order): one.html, two.html
    assert out["https://a.example.com/one.html"]["status"] == "valid"
    assert out["https://a.example.com/two.html"]["status"] == "valid"
    assert out["https://ext.other.net/x"]["status"] == "skipped"


def test_query_relevance_and_threshold(spark, base):
    results, heads = base
    cfg = LinkPreviewConfig(
        include_patterns=("*.html",), query="spark guide",
        score_threshold=0.1,
    )
    out = _by_href(link_preview_stage(results, heads, cfg))
    one = out["https://a.example.com/one.html"]
    two = out["https://a.example.com/two.html"]
    assert one["status"] == "valid" and one["relevance_score"] > 0
    assert two["status"] == "below_threshold"
    assert two["head_title"] is None
    # total = 0.7*intrinsic(0 default) + 0.3*min(rel*10, 10)
    assert one["total_score"] == pytest.approx(
        min(one["relevance_score"] * 10.0, 10.0) * 0.3, abs=1e-6
    )


def test_duplicate_href_fetched_once(spark):
    results = _results(
        spark,
        [("p", [_link("https://a.example.com/d.html"),
                _link("https://a.example.com/d.html")])],
    )
    heads = spark.createDataFrame(
        [("https://a.example.com/d.html", "<head><title>x</title></head>")],
        "url string, head_html string",
    )
    out = link_preview_stage(results, heads, LinkPreviewConfig()).collect()
    statuses = sorted(r["status"] for r in out)
    assert statuses == ["skipped", "valid"]
