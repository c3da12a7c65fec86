"""Crawler-hub tier: registry semantics (hub.py:12-69), Google SERP
crawler (crawlers/google_search/crawler.py:11-131), Amazon stub
(crawlers/amazon_product/crawler.py:10-20)."""

import json
import os

import pytest

from crawl4ai_spark.hub import (
    AmazonProductCrawler,
    BaseCrawler,
    CrawlerHub,
    GoogleSearchCrawler,
)
from crawl4ai_spark.operators.fetch import PagesJoinFetcher


def _item(title, href, snippet, date):
    return (
        f'<div class="g"><h3 class="title">{title}</h3>'
        f'<a class="lnk" href="{href}">visit</a>'
        f'<span class="snippet">{snippet}</span>'
        f'<span class="date">{date}</span></div>'
    )


def _story(title, href, source, date):
    return (
        f'<div class="story"><h4 class="title">{title}</h4>'
        f'<a class="lnk" href="{href}">go</a>'
        f'<span class="source">{source}</span>'
        f'<span class="date">{date}</span></div>'
    )


SERP_HTML = (
    "<html><body><div id=\"search\">"
    + _item("Result One", "https://a.example/1", "first snippet", "1 hour ago")
    + _item("Result Two", "https://a.example/2", "second snippet", "2 hours ago")
    + _item("Result Three", "https://a.example/3", "third snippet", "1 day ago")
    + '</div><div id="top-stories">'
    + _story("Story One", "https://n.example/1", "Insider Monkey", "1 hour ago")
    + _story("Story Two", "https://n.example/2", "Daily Graph", "3 hours ago")
    + '</div><div id="suggested">'
    + '<div class="qsug"><span class="query">a for apple</span></div>'
    + '<div class="qsug"><span class="query">b for banana</span></div>'
    + "</div></body></html>"
)


def _pages(spark, url, html=SERP_HTML):
    return spark.createDataFrame([(url, html)], "url string, html string")


# -- URL builder: exact mirrors of crawler.py:26-30 (incl. the quirks:
#    query not URL-encoded, page_start multiplied by 10) -----------------

def test_build_url_goldens():
    assert (
        GoogleSearchCrawler.build_url("spark")
        == "https://www.google.com/search?q=spark&gl=sg&hl=en"
    )
    assert (
        GoogleSearchCrawler.build_url("spark", "image")
        == "https://www.google.com/search?q=spark&gl=sg&hl=en&tbs=qdr:d&udm=2"
    )
    assert (
        GoogleSearchCrawler.build_url("spark", "text", page_start=3)
        == "https://www.google.com/search?q=spark&gl=sg&hl=en&start=30"
    )
    assert (
        GoogleSearchCrawler.build_url("spark", "text", page_length=20)
        == "https://www.google.com/search?q=spark&gl=sg&hl=en&num=20"
    )
    assert (
        GoogleSearchCrawler.build_url("spark", "text", 2, 20)
        == "https://www.google.com/search?q=spark&gl=sg&hl=en&start=20&num=20"
    )


# -- registry (hub.py:37-69) ---------------------------------------------

def test_hub_get_and_meta():
    assert CrawlerHub.get("google_search") is GoogleSearchCrawler
    assert CrawlerHub.get("amazon_product") is AmazonProductCrawler
    assert CrawlerHub.get("does_not_exist") is None
    assert GoogleSearchCrawler.meta["version"] == "1.0.0"
    assert AmazonProductCrawler.meta["schema"] == {
        "product": ["name", "price"]
    }


def test_register_custom_crawler(spark):
    class MiniCrawler(BaseCrawler):
        __meta__ = {"version": "0.1"}

        def run(self, spark, url="", **kwargs):
            return spark.createDataFrame(
                [(url, "{}")], "url string, extracted string"
            )

    CrawlerHub.register("mini", MiniCrawler)
    assert CrawlerHub.get("mini") is MiniCrawler
    assert MiniCrawler.meta == {"version": "0.1"}
    with pytest.raises(TypeError):
        CrawlerHub.register("bad", dict)
    # an early register() must not hide the builtins (discovery is
    # idempotent and runs on every get)
    CrawlerHub._crawlers = {}
    CrawlerHub.register("mini", MiniCrawler)
    assert CrawlerHub.get("google_search") is GoogleSearchCrawler
    assert CrawlerHub.get("mini") is MiniCrawler


def test_subclass_signature_enforced():
    # hub.py:30-31 — run must accept (self, spark, url, **kwargs)
    with pytest.raises(TypeError):
        class NoUrl(BaseCrawler):
            def run(self, spark, **kwargs):  # missing url positional
                return None

    # hub.py:34 polarity flip: async run is the error here
    with pytest.raises(TypeError):
        class AsyncRun(BaseCrawler):
            async def run(self, spark, url="", **kwargs):
                return None


# -- Google SERP end-to-end (crawler.py:24-64) ----------------------------

def test_google_run_extracts(spark):
    url = GoogleSearchCrawler.build_url("spark")
    g = GoogleSearchCrawler(fetcher=PagesJoinFetcher(_pages(spark, url)))
    rows = g.run(spark, query="spark").collect()
    assert len(rows) == 1 and rows[0]["url"] == url
    out = json.loads(rows[0]["extracted"])
    organic = out["organic_schema"]
    assert [o["title"] for o in organic] == [
        "Result One", "Result Two", "Result Three"
    ]
    assert organic[0]["lnk_href"] == "https://a.example/1"
    assert organic[0]["snippet"] == "first snippet"
    assert organic[2]["date"] == "1 day ago"
    stories = out["top_stories_schema"]
    assert [s["source"] for s in stories] == ["Insider Monkey", "Daily Graph"]
    sugg = out["suggested_query_schema"]
    assert [s["query"] for s in sugg] == ["a for apple", "b for banana"]


def test_schema_cache_roundtrip(spark, tmp_path):
    url = GoogleSearchCrawler.build_url("cached")
    fetcher = PagesJoinFetcher(_pages(spark, url))
    g = GoogleSearchCrawler(fetcher=fetcher)
    g.run(spark, query="cached", schema_cache_path=str(tmp_path)).collect()
    schema_dir = tmp_path / "schema"
    names = sorted(os.listdir(schema_dir))
    assert names == [
        "organic_schema.json",
        "suggested_query_schema.json",
        "top_stories_schema.json",
    ]
    # crawler.py:75-77 — an existing cache file wins over regeneration
    hand = {
        "baseSelector": "div.g",
        "fields": [
            {"name": "only_title", "selector": "h3.title", "type": "text"}
        ],
    }
    (schema_dir / "organic_schema.json").write_text(json.dumps(hand))
    rows = g.run(
        spark, query="cached", schema_cache_path=str(tmp_path)
    ).collect()
    out = json.loads(rows[0]["extracted"])
    assert out["organic_schema"] == [
        {"only_title": "Result One"},
        {"only_title": "Result Two"},
        {"only_title": "Result Three"},
    ]


def test_image_search_returns_error_json(spark):
    g = GoogleSearchCrawler()
    rows = g.run(spark, query="cats", search_type="image").collect()
    out = json.loads(rows[0]["extracted"])
    assert "browser" in out["error"]
    assert rows[0]["url"].endswith("&tbs=qdr:d&udm=2")


def test_fetch_miss_returns_error_json(spark):
    empty = spark.createDataFrame([], "url string, html string")
    g = GoogleSearchCrawler(fetcher=PagesJoinFetcher(empty))
    rows = g.run(spark, query="nothing").collect()
    out = json.loads(rows[0]["extracted"])
    assert out == {"error": "miss"}


def test_run_batch_many_pages(spark):
    urls = [GoogleSearchCrawler.build_url(q) for q in ("q1", "q2", "q3")]
    pages = spark.createDataFrame(
        [(u, SERP_HTML) for u in urls], "url string, html string"
    )
    g = GoogleSearchCrawler(fetcher=PagesJoinFetcher(pages))
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = g.run_batch(spark, urls_df).collect()
    assert len(rows) == 3
    for r in rows:
        out = json.loads(r["extracted"])
        assert len(out["organic_schema"]) == 3


def test_amazon_stub(spark):
    a = AmazonProductCrawler()
    rows = a.run(spark, url="https://amazon.com/dp/B0TEST").collect()
    assert json.loads(rows[0]["extracted"]) == {
        "product": {"name": "Test Amazon Product"}
    }


def test_hub_google_serp_catalog_roundtrip(spark, sf_dir):
    """Catalog entry: SERP pages synthesized from documents.parquet
    survive the infer->extract round trip field-for-field."""
    from crawl4ai_spark.catalog import PYTEST_ONLY_QUERIES, _docs

    out = PYTEST_ONLY_QUERIES["hub_google_serp"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in _docs(spark, sf_dir)
        .select("doc_id", "text")
        .filter("doc_id < 60")
        .collect()
    }
    assert len(out) == len(docs) > 0
    for row in out:
        page = int(row["url"].split("q=p")[1].split("&")[0])
        did = page * 3 + row["pos"]
        assert row["title"] == f"doc {did}"
        assert row["link"] == f"https://ex.test/{did}"
        assert row["snippet"] == docs[did][:40].strip()
        assert row["result_date"] == f"{did % 24} hours ago"


def test_run_batch_fetches_each_url_once(spark, tmp_path):
    """The schema sample must not re-run the fetch lineage (double
    live HTTP traffic); run_batch checkpoints the fetch."""
    import glob

    from crawl4ai_spark.operators.fetch import MapFetcher

    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()
    urls = [GoogleSearchCrawler.build_url(f"u{i}") for i in range(6)]
    body = SERP_HTML.encode()

    def fn(url, extra=None):
        # one marker file per fetch call (executor-local == driver-local
        # on local[N])
        import os
        import uuid

        open(os.path.join(str(calls_dir), uuid.uuid4().hex), "w").close()
        return {"status": 200, "body": body}

    g = GoogleSearchCrawler(fetcher=MapFetcher(fn))
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = g.run_batch(spark, urls_df).collect()
    assert len(rows) == len(urls)
    assert len(glob.glob(str(calls_dir / "*"))) == len(urls)
