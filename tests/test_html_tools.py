"""X4/X9/X11 scalar utility tests (reference-parity where the reference
function is pure Python — sanitize/escape/srcset/dimension are
byte-compared against local re-executions of the reference logic)."""

from __future__ import annotations

from crawl4ai_spark.functions.html_tools import (
    escape_json_string,
    fit_html_stage,
    parse_dimension,
    parse_srcset,
    preprocess_html_for_schema,
    sanitize_input_encode,
)


def test_sanitize():
    assert sanitize_input_encode("") == ""
    assert sanitize_input_encode(None) == ""
    assert sanitize_input_encode("héllo") == "héllo"
    assert sanitize_input_encode("ok\ud800bad") == "okbad"  # lone surrogate


def test_escape_json_string():
    assert escape_json_string('a"b') == 'a\\"b'
    assert escape_json_string("a\\b") == "a\\\\b"
    assert escape_json_string("a\nb\tc") == "a\\nb\\tc"
    assert escape_json_string("x\x01y") == "x\\u0001y"


def test_parse_srcset():
    assert parse_srcset(None) == []
    assert parse_srcset("a.jpg 480w, b.jpg 800w") == [
        {"url": "a.jpg", "width": "480"},
        {"url": "b.jpg", "width": "800"},
    ]
    assert parse_srcset("c.jpg") == [{"url": "c.jpg", "width": None}]
    assert parse_srcset("d.jpg 2x") == [{"url": "d.jpg", "width": None}]


def test_parse_dimension():
    assert parse_dimension("150px") == (150, "px")
    assert parse_dimension("42") == (42, "px")
    assert parse_dimension("10em") == (10, "em")
    assert parse_dimension(None) == (None, None)
    assert parse_dimension("auto") == (None, None)


def test_preprocess_html_for_schema():
    html = (
        "<html><head><title>T</title></head><body>"
        '<div class="card" data-x="1" style="color:red" onclick="x()">'
        "<p>" + "long text " * 30 + "</p></div>"
        '<div class="card">' + "long text " * 30 + "</div>'"
        "<script>junk</script><svg>vector</svg>"
        '<div class="card">' + "long text " * 30 + "</div>"
        "</body></html>"
    )
    out = preprocess_html_for_schema(html)
    assert "<head>" not in out and "<script>" not in out and "<svg>" not in out
    assert 'style=' not in out and "onclick" not in out
    assert 'data-x="1"' in out  # data-* kept
    assert "..." in out  # long text truncated
    # repeated (tag, class, text) elements deduped to first occurrence
    assert out.count('class="card"') < 3


def test_preprocess_size_cap():
    html = "<p>" + "x" * 50 + "</p>" * 3000
    out = preprocess_html_for_schema(html, max_size=500)
    assert len(out) <= 504


def test_fit_html_stage_spark(spark, sf_dir):
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, sf_dir).limit(5)
    out = fit_html_stage(pages, html_col="html").collect()
    for r in out:
        assert r["fit_html"]
        assert "<script>" not in r["fit_html"]
        assert "<title>" not in r["fit_html"]  # head stripped
