"""The reference's own scrape-stage test intent, ported (VERDICT r4
item 8): tests/async/test_content_scraper_strategy.py runs one rich
page through a matrix of kwargs combos (Basic / Exclude Tags / Word
Threshold / CSS Selector / Link Exclusions / Media Handling / Text
Only) and checks the result surface (success, media/link counts,
markdown length) stays consistent. lxml is absent here, so instead of
byte-diffing against the reference we assert the cross-case relations
its matrix implies on a deterministic page."""

import pytest

from crawl4ai_spark.functions.scrape import ScrapeOptions, scrape_one

URL = "https://en.example.org/wiki/Test"

PAGE = (
    "<html><head><title>Test page</title>"
    '<meta name="description" content="a test page"></head><body>'
    '<nav><a href="/nav1">n1</a> <a href="/nav2">n2</a></nav>'
    '<div class="infobox"><table><tr><td>k</td><td>v</td></tr></table>'
    "short</div>"
    '<div class="mw-parser-output">'
    "<p>First paragraph with plenty of useful words for the threshold "
    "checks to chew on across the matrix of cases.</p>"
    "<p>tiny</p>"
    '<p>Second long paragraph that likewise carries enough words to '
    "survive a generous word count threshold in the filtered run.</p>"
    '<img src="https://upload.example.org/photo.jpg" width="400" '
    'height="300" alt="a photo">'
    '<img src="https://cdn.other.com/banner.png" width="400" '
    'height="300" alt="ext banner">'
    '<a href="https://en.example.org/wiki/Other">internal</a>'
    '<a href="https://facebook.com/share">social</a>'
    '<a href="https://partner.com/x">external</a>'
    "</div>"
    "<form><input name='q'></form>"
    "<p><b>bold</b> and <em>emphasis</em> inline</p>"
    "</body></html>"
)


def _counts(r):
    internal = sum(1 for l in r["links"] if l["is_internal"])
    external = len(r["links"]) - internal
    return {
        "success": r["success"],
        "images": len(r["images"]),
        "internal": internal,
        "external": external,
        "text_len": len(r["text"] or ""),
    }


def test_basic_extraction_baseline():
    r = scrape_one(PAGE, URL, opts=ScrapeOptions(remove_forms=True))
    c = _counts(r)
    assert c["success"] and c["images"] == 2
    assert c["internal"] == 3 and c["external"] == 2
    assert r["title"] == "Test page"


def test_exclude_tags_case_reduces_surface():
    base = scrape_one(PAGE, URL, opts=ScrapeOptions(remove_forms=True))
    r = scrape_one(
        PAGE, URL,
        opts=ScrapeOptions(excluded_tags=frozenset({"table", "nav"})),
    )
    c = _counts(r)
    assert c["success"]
    # nav links gone, content links intact
    assert c["internal"] == _counts(base)["internal"] - 2
    assert "<table" not in r["cleaned_html"]
    assert c["text_len"] < _counts(base)["text_len"]


def test_word_threshold_case_prunes_small_blocks():
    base = scrape_one(PAGE, URL, opts=ScrapeOptions(remove_forms=True))
    r = scrape_one(PAGE, URL, opts=ScrapeOptions(word_count_threshold=5))
    assert r["success"]
    assert "tiny" not in r["cleaned_html"]
    assert "First paragraph" in r["cleaned_html"]
    assert len(r["cleaned_html"]) < len(base["cleaned_html"])


def test_css_selector_case_focuses_content():
    r = scrape_one(
        PAGE, URL, opts=ScrapeOptions(css_selector="div.mw-parser-output > p")
    )
    assert r["success"]
    assert "First paragraph" in r["text"]
    assert "n1" not in r["text"]  # nav outside the projection
    assert r["cleaned_html"].startswith('<div class="crawl4ai-result">')


def test_link_exclusions_case():
    r = scrape_one(
        PAGE, URL,
        opts=ScrapeOptions(
            exclude_external_links=True,
            exclude_social_media_links=True,
            exclude_domains=frozenset({"facebook.com", "twitter.com"}),
        ),
    )
    c = _counts(r)
    assert c["success"] and c["external"] == 0
    assert c["internal"] == 3  # internals untouched


def test_media_handling_case():
    r = scrape_one(
        PAGE, URL,
        opts=ScrapeOptions(
            media=True,
            exclude_external_images=True,
            image_description_min_word_threshold=20,
        ),
    )
    assert r["success"]
    srcs = [v["src"] for v in r["media"]["images"]]
    assert srcs == ["https://upload.example.org/photo.jpg"]
    # 20-word description threshold: no ancestor qualifies
    assert r["media"]["images"][0]["desc"] is None
    assert "cdn.other.com" not in r["cleaned_html"]


def test_text_only_case():
    r = scrape_one(
        PAGE, URL, opts=ScrapeOptions(only_text=True, remove_forms=True)
    )
    assert r["success"]
    assert "<form" not in r["cleaned_html"]
    assert "<b>" not in r["cleaned_html"]
    assert "bold" in r["text"] and "emphasis" in r["text"]


def test_matrix_success_is_uniform():
    """The reference harness's core check: every kwargs combo succeeds
    on the same page."""
    combos = [
        ScrapeOptions(remove_forms=True),
        ScrapeOptions(excluded_tags=frozenset({"table", "nav"})),
        ScrapeOptions(word_count_threshold=5),
        ScrapeOptions(css_selector="div.mw-parser-output > p"),
        ScrapeOptions(exclude_external_links=True,
                      exclude_social_media_links=True),
        ScrapeOptions(media=True, exclude_external_images=True),
        ScrapeOptions(only_text=True, remove_forms=True,
                      strip_attrs=True, keep_data_attributes=True),
    ]
    for opts in combos:
        assert scrape_one(PAGE, URL, opts=opts)["success"], opts
