"""Filter golden tests — cases ported from the reference's own suite
(/root/reference/tests/general/test_deep_crawl_filters.py) plus the
path-boundary rule (filters.py:236-244)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.filters import (
    content_type_filter,
    domain_filter,
    filter_chain,
    filter_stats,
    seo_url_quality_score,
    url_pattern_filter,
)


def _eval(spark, urls, pred_factory):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select("url", pred_factory(F.col("url")).alias("ok")).collect()
    return {r["url"]: r["ok"] for r in rows}


PATTERN_CASES = [
    ("*.html", {
        "https://example.com/page.html": True,
        "https://example.com/path/doc.html": True,
        "https://example.com/page.htm": False,
        "https://example.com/page.html?param=1": True,
    }),
    ("*/article/*", {
        "https://example.com/article/123": True,
        "https://example.com/blog/article/456": True,
        "https://example.com/articles/789": False,
        "https://example.com/article": False,
    }),
    ("blog-*-[0-9]", {
        "https://example.com/blog-post-1": True,
        "https://example.com/blog-test-9": True,
        "https://example.com/blog-post": False,
        "https://example.com/blog-post-x": False,
    }),
    (["*.pdf", "*/download/*"], {
        "https://example.com/doc.pdf": True,
        "https://example.com/download/file.txt": True,
        "https://example.com/path/download/doc": True,
        "https://example.com/uploads/file.txt": False,
    }),
    ("*", {
        "https://example.com": True,
        "http://test.com/path": True,
    }),
    (r"^https?://.*\.example\.com/\d+", {
        "https://sub.example.com/123": True,
        "http://test.example.com/456": True,
        "https://example.com/789": False,
        "https://sub.example.com/abc": False,
    }),
]


def test_url_pattern_filter_golden(spark):
    for patterns, cases in PATTERN_CASES:
        got = _eval(spark, list(cases), lambda c, p=patterns: url_pattern_filter(c, p))
        for url, expected in cases.items():
            assert got[url] == expected, f"pattern={patterns} url={url}"


def test_url_pattern_filter_reverse(spark):
    cases = {"https://example.com/page.html": False, "https://example.com/x.txt": True}
    got = _eval(spark, list(cases), lambda c: url_pattern_filter(c, "*.html", reverse=True))
    for url, expected in cases.items():
        assert got[url] == expected, url


def test_prefix_path_boundary(spark):
    # filters.py:236-244 — '/api/*' must not match '/apiv2/...'
    cases = {
        "https://x.com/api/v1": True,
        "https://x.com/api": True,
        "https://x.com/apiv2/v1": False,
    }
    got = _eval(
        spark, list(cases), lambda c: url_pattern_filter(c, "https://x.com/api/*")
    )
    for url, expected in cases.items():
        assert got[url] == expected, url


DOMAIN_CASES = [
    ({"allowed": "example.com"}, {
        "https://example.com/page": True,
        "http://example.com": True,
        # NOTE: reference test expects sub.example.com False with a bare
        # allowed list?  filters.py:489-494 allows subdomains — the
        # reference test file predates that change; we match the CODE:
        "https://sub.example.com": True,
        "https://other.com": False,
    }),
    ({"allowed": ["example.com", "test.com"]}, {
        "https://example.com/page": True,
        "https://test.com/home": True,
        "https://other.com": False,
    }),
    ({"blocked": "malicious.com"}, {
        "https://malicious.com": False,
        "https://safe.com": True,
        "http://malicious.com/login": False,
    }),
    ({"blocked": ["spam.com", "ads.com"]}, {
        "https://spam.com": False,
        "https://ads.com/banner": False,
        "https://example.com": True,
    }),
    ({"allowed": "example.com", "blocked": "sub.example.com"}, {
        "https://example.com": True,
        "https://sub.example.com": False,
        "https://other.com": False,
    }),
]


def test_domain_filter_golden(spark):
    for params, cases in DOMAIN_CASES:
        got = _eval(
            spark,
            list(cases),
            lambda c, p=params: domain_filter(
                c, allowed_domains=p.get("allowed"), blocked_domains=p.get("blocked")
            ),
        )
        for url, expected in cases.items():
            assert got[url] == expected, f"params={params} url={url}"


def test_content_type_filter(spark):
    cases = {
        "https://example.com/page.html": True,
        "https://example.com/doc.pdf": False,
        "https://example.com/noext": True,  # extension-less passes
        "https://example.com/pic.jpg": False,
        "https://example.com/a.txt": True,
    }
    got = _eval(spark, list(cases), lambda c: content_type_filter(c, ["text"]))
    for url, expected in cases.items():
        assert got[url] == expected, url


def test_filter_chain_and_stats(spark):
    urls = [
        "https://example.com/a.html",
        "https://example.com/b.pdf",
        "https://blocked.com/c.html",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    p1 = url_pattern_filter(F.col("url"), "*.html")
    p2 = domain_filter(F.col("url"), blocked_domains="blocked.com")
    out = df.filter(filter_chain(p1, p2)).collect()
    assert [r["url"] for r in out] == ["https://example.com/a.html"]

    stats = filter_stats(df, {"pattern": p1, "domain": p2}).collect()[0]
    assert stats["total_urls"] == 3
    assert stats["pattern_passed"] == 2
    assert stats["domain_passed"] == 2


def test_seo_url_quality(spark):
    # filters.py:655-668: query param -> *0.6; 4-digit number -> *0.8;
    # underscore -> *0.9; len>80 -> *0.7
    cases = {
        "https://x.com/clean-path": 1.0,
        "https://x.com/post-2024": 0.8,
        "https://x.com/a_b": 0.9,
        "https://x.com/a?q=1": 0.6,
    }
    got = _eval(spark, list(cases), seo_url_quality_score)
    for url, expected in cases.items():
        assert abs(got[url] - expected) < 1e-9, url


def test_crawler_trap_detection(spark):
    from crawl4ai_spark.operators.filters import is_crawler_trap

    cases = [
        # (url, is_trap)
        ("https://a.com/blog/post.html", False),
        ("https://a.com/a/b/c/d/e/f.html", False),
        ("https://a.com/cal/cal/cal/page", True),            # repeated segs
        ("https://a.com/x/" + "/".join("abcdefghijklm"), True),  # depth 14
        ("https://a.com/p?" + "&".join(f"k{i}=v" for i in range(12)), True),
        ("https://a.com/p?a=1&b=2&c=3", False),
        ("https://a.com/p?s=1&s=2&s=3&s=4", True),           # param loop
        ("https://a.com/2026/01/15/post", False),            # one date ok
        ("https://a.com/2026/01/2025/12/2024/11/x", True),   # calendar walk
        ("https://a.com/q?x=" + "y" * 2100, True),           # absurd length
        ("https://a.com/archive/2026/page", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["trap"]
        for r in df.select("url", is_crawler_trap("url").alias("trap")).collect()
    }
    for u, want in cases:
        assert got[u] == want, u
