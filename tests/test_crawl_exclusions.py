"""Engine-level F10 flags + scrape-options plumbing through the crawl
round (reference content_scraping_strategy.py:661-691, 1152-1165 +
config.py SOCIAL_MEDIA_DOMAINS; VERDICT r4 item 4)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
from crawl4ai_spark.synth import generate_pages, page_url

N_DOCS = 500


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    pages = generate_pages(spark, sf_dir)
    pages.cache()
    pages.count()
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    yield pages, langs
    pages.unpersist()


def _crawl_urls(spark, pages, seeds, wd, cfg):
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=2)
    run = CrawlRun(spark, pages, wd, cfg)
    return {r["url"] for r in run.results().select("url").collect()}


def test_exclude_domains_is_setminus_of_unflagged_crawl(
    spark, corpus, tmp_path
):
    """The verdict's acceptance shape: flagged crawl == unflagged crawl
    minus the excluded-domain links."""
    pages, langs = corpus
    seeds = [page_url(2, langs[2])]
    base_cfg = CrawlConfig(
        max_depth=1, include_external=True, round_seconds=64.0
    )
    urls_base = _crawl_urls(spark, pages, seeds, str(tmp_path / "b"), base_cfg)
    flag_cfg = CrawlConfig(
        max_depth=1, include_external=True, round_seconds=64.0,
        exclude_domains=("other.net",),
    )
    urls_flag = _crawl_urls(spark, pages, seeds, str(tmp_path / "f"), flag_cfg)
    excluded = {u for u in urls_base if ".other.net/" in u}
    assert excluded  # the corpus really has external links
    assert urls_flag == urls_base - excluded


def test_exclude_social_media_links_flag(spark, tmp_path):
    """Social links never enter the frontier when the flag is set; the
    domain list matches the reference's SOCIAL_MEDIA_DOMAINS."""
    html = (
        '<html><body><a href="https://www.facebook.com/p">f</a>'
        '<a href="https://x.com/u">x</a>'
        '<a href="https://partner.net/ok">p</a></body></html>'
    )
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("https://example.com/seed", html, ts),
         ("https://partner.net/ok", "<html><body>leaf</body></html>", ts)],
        "url string, html string, warc_ts timestamp",
    )
    seeds = ["https://example.com/seed"]
    cfg = CrawlConfig(
        max_depth=1, include_external=True, round_seconds=64.0,
        exclude_social_media_links=True,
    )
    urls = _crawl_urls(spark, pages, seeds, str(tmp_path / "s"), cfg)
    assert urls == {"https://example.com/seed", "https://partner.net/ok"}


def test_scrape_options_flow_through_crawl(spark, corpus, tmp_path):
    """CrawlConfig(scrape_options=...) reaches the per-round scrape:
    excluding <nav> drops the 3 nav links from every page (7 -> 4)."""
    from crawl4ai_spark.functions.scrape import ScrapeOptions

    pages, langs = corpus
    seeds = [page_url(2, langs[2])]
    cfg = CrawlConfig(
        max_depth=1, round_seconds=64.0,
        scrape_options=ScrapeOptions(excluded_tags=frozenset({"nav"})),
    )
    wd = str(tmp_path / "opts")
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=2)
    run = CrawlRun(spark, pages, wd, cfg)
    res = run.results().filter(F.col("success"))
    n_links = {r["n_links"] for r in res.select("n_links").collect()}
    assert n_links == {4}  # 3 list + 1 external; navs gone


def test_scrape_options_recorded_in_config_json():
    """Round manifests must distinguish runs that differ only in
    scrape shaping: to_json carries a deterministic JSON view of
    scrape_options (None when unset)."""
    import json

    from crawl4ai_spark.functions.scrape import ScrapeOptions

    assert CrawlConfig().to_json()["scrape_options"] is None
    a = CrawlConfig(
        scrape_options=ScrapeOptions(excluded_tags=frozenset({"nav"}))
    ).to_json()
    b = CrawlConfig(scrape_options=ScrapeOptions()).to_json()
    assert a != b
    assert a["scrape_options"]["excluded_tags"] != b["scrape_options"]["excluded_tags"]
    # JSON-serializable and deterministic (frozensets sorted)
    assert json.dumps(a) == json.dumps(
        CrawlConfig(
            scrape_options=ScrapeOptions(excluded_tags=frozenset({"nav"}))
        ).to_json()
    )
