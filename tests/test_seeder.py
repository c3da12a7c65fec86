"""URL seeder tests: sitemap recursion, CC source, nonsense filter,
full pipeline with relevance scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.functions.headpeek import head_section
from crawl4ai_spark.sources.seeder import (
    expand_sitemaps,
    is_nonsense_url,
    seed_urls,
    synthetic_cc_index,
    synthetic_sitemaps,
)
from crawl4ai_spark.synth import generate_pages


def test_nonsense_filter_rules(spark):
    cases = [
        ("https://x.com/robots.txt", True),
        ("https://x.com/sitemap.xml", True),
        ("https://x.com/sitemap/news.xml", True),
        ("https://x.com/favicon.ico", True),
        ("https://x.com/.well-known/security.txt", True),
        ("https://x.com/.git/config", True),
        ("https://x.com/wp-admin/page", True),
        ("https://x.com/article?print=1", True),
        ("https://x.com/a", True),  # path too short
        ("https://x.com/en", False),  # whitelisted short path
        ("https://x.com/en/article.html", False),
        ("https://x.com/blog/post-123", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select("url", is_nonsense_url("url").alias("n")).collect()
    }
    for u, want in cases:
        assert got[u] == want, u


def test_sitemap_recursion_covers_corpus(spark, sf_dir):
    sitemaps, roots = synthetic_sitemaps(spark, sf_dir)
    urls = expand_sitemaps(spark, sitemaps, roots)
    all_pages = {r["url"] for r in generate_pages(spark, sf_dir).select("url").collect()}
    got = {r["url"] for r in urls.collect()}
    assert got == all_pages  # index recursion + flat sitemaps = full corpus


def test_seed_pipeline_filters_noise_and_caps(spark, sf_dir):
    cc = synthetic_cc_index(spark, sf_dir)
    out = seed_urls(spark, cc_index=cc, pattern="*.html", max_urls=100)
    rows = out.collect()
    assert len(rows) == 100
    for r in rows:
        assert r["url"].endswith(".html")
        assert "robots" not in r["url"] and "wp-admin" not in r["url"]
        # deterministic order: url asc when unscored
    urls = [r["url"] for r in rows]
    assert urls == sorted(urls)


def test_seed_pipeline_relevance_ranking(spark, sf_dir):
    pages = generate_pages(spark, sf_dir)
    heads = pages.select(
        "url",
        head_section(F.decode("html", "utf-8")).alias("head"),
    )
    cc = synthetic_cc_index(spark, sf_dir)
    out = seed_urls(
        spark, cc_index=cc, heads=heads, query="slow merge join",
        score_threshold=0.01, max_urls=50,
    )
    rows = out.collect()
    assert 0 < len(rows) <= 50
    scores = [r["relevance_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.01 for s in scores)


def test_seed_domain_scoping(spark, sf_dir):
    cc = synthetic_cc_index(spark, sf_dir)
    out = seed_urls(spark, cc_index=cc, domain="h4.example.com")
    rows = out.collect()
    assert rows
    assert all("//h4.example.com/" in r["url"] for r in rows)


def test_robots_declared_sitemaps_fallback(spark):
    """Reference parity (async_url_seeder.py:768, 807-826): hosts whose
    direct sitemap probe produced no root fall back to the Sitemap:
    lines of their robots.txt; probed hosts ignore their robots lines."""
    from crawl4ai_spark.sources.seeder import robots_sitemap_locs

    dim = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml",
             "<urlset><loc>https://a.com/page1</loc><loc>https://a.com/page2</loc></urlset>"),
            ("https://a.com/decoy.xml",
             "<urlset><loc>https://a.com/DECOY</loc></urlset>"),
            ("https://b.com/deep/sm.xml",
             "<urlset><loc>https://b.com/page1</loc><loc>https://b.com/page2</loc></urlset>"),
        ],
        "sitemap_url string, xml string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\nSitemap: https://a.com/decoy.xml\n"),
            ("b.com", "User-agent: *\n  sitemap:\thttps://b.com/deep/sm.xml\n"),
        ],
        "host string, body string",
    )
    out = seed_urls(
        spark,
        sitemaps=dim,
        sitemap_roots=["https://a.com/sitemap.xml"],
        robots_bodies=robots,
    )
    urls = {r["url"] for r in out.collect()}
    assert urls == {
        "https://a.com/page1", "https://a.com/page2",
        "https://b.com/page1", "https://b.com/page2",
    }

    # column function: case-insensitive, group-independent, multi-line
    locs = spark.range(1).select(
        robots_sitemap_locs(
            F.lit("SiteMap: https://x/s1.xml\nUser-agent: g\nsitemap: https://x/s2.xml")
        ).alias("l")
    ).collect()[0]["l"]
    assert locs == ["https://x/s1.xml", "https://x/s2.xml"]

    # parser surface: sitemaps ride along parse_robots_txt globally
    from crawl4ai_spark.operators.robots import parse_robots_txt

    parsed = parse_robots_txt(
        "User-agent: a\nDisallow: /\nSitemap: https://h/s.xml\n"
        "User-agent: b\nSitemap: https://h/t.xml\n",
        ua="b",
    )
    assert parsed["sitemaps"] == ["https://h/s.xml", "https://h/t.xml"]


def test_sitemap_entries_full_protocol(spark):
    from datetime import datetime

    from crawl4ai_spark.sources.seeder import changefreq_lambda, sitemap_entries

    xml = (
        "<urlset>"
        "<url><loc>https://a.com/page1</loc><lastmod>2026-03-04</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.com/page2</loc>"
        "<lastmod>2026-01-02T10:20:30+00:00</lastmod></url>"
        "<url><loc>https://a.com/page3</loc></url>"
        "</urlset>"
    )
    rows = spark.range(1).select(
        F.explode(sitemap_entries(F.lit(xml))).alias("e")
    ).select("e.*").collect()
    assert [r["loc"] for r in rows] == [
        "https://a.com/page1", "https://a.com/page2", "https://a.com/page3"
    ]
    assert rows[0]["lastmod"] == datetime(2026, 3, 4)
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] == datetime(2026, 1, 2)  # W3C datetime date part
    assert rows[2]["lastmod"] is None and rows[2]["priority"] is None

    # junk <priority> must not kill the job under ANSI mode
    junk = ("<urlset><url><loc>https://a.com/x</loc>"
            "<priority>high</priority></url></urlset>")
    row = spark.range(1).select(
        F.explode(sitemap_entries(F.lit(junk))).alias("e")
    ).select("e.*").first()
    assert row["loc"] == "https://a.com/x" and row["priority"] is None

    lams = spark.createDataFrame(
        [("daily",), ("WEEKLY",), ("bogus",), (None,)], "cf string"
    ).select(changefreq_lambda("cf").alias("lam")).collect()
    assert [r["lam"] for r in lams] == [
        1.0, 1.0 / 7.0, 1.0 / 30.0, 1.0 / 30.0
    ]


def test_robots_fallback_survives_schemeless_root(spark):
    """A scheme-less sitemap root parses to hostname None; a None in
    the probed-host isin() list made the NOT-IN predicate NULL for
    every unprobed host, silently disabling the whole robots fallback."""
    dim = spark.createDataFrame(
        [
            ("https://b.com/sm.xml",
             "<urlset><loc>https://b.com/page1</loc></urlset>"),
        ],
        "sitemap_url string, xml string",
    )
    robots = spark.createDataFrame(
        [("b.com", "User-agent: *\nSitemap: https://b.com/sm.xml\n")],
        "host string, body string",
    )
    out = seed_urls(
        spark,
        sitemaps=dim,
        sitemap_roots=["a.com/sitemap.xml"],  # scheme-less: hostname None
        robots_bodies=robots,
    )
    assert {r["url"] for r in out.collect()} == {"https://b.com/page1"}
