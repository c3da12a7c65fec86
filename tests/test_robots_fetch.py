"""Live robots.txt acquisition (operators/robots.py
fetch_robots_rules + CrawlConfig.robots_fetch): the distributed
reshape of the reference RobotsParser's cache-then-fetch
(utils.py:313-353). Parity pin: a crawl that discovers its rules by
fetching robots.txt per host must equal the same crawl handed those
rules as a static table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.fetch import MapFetcher
from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
from crawl4ai_spark.operators.robots import (
    ROBOTS_CACHE_SCHEMA,
    fetch_robots_rules,
    rules_table,
    synthetic_robots,
)
from crawl4ai_spark.synth import generate_pages


RESULT_COLS = [
    "url", "round", "depth", "fetch_status", "success", "n_links",
]


def _corpus(spark, sf_dir):
    pages = generate_pages(spark, sf_dir).cache()
    corpus = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }
    # synthetic_robots takes SHORT names ("h4") and keys its bodies by
    # the full host ("h4.example.com") itself
    hosts = sorted({u.split("/")[2].split(".")[0] for u in corpus})
    robots = synthetic_robots(hosts)
    return pages, corpus, hosts, robots


def _fetch_fn(corpus, robots):
    def fn(url):
        if url.endswith("/robots.txt"):
            host = url.split("/")[2]
            body = robots.get(host)
            if body is None:
                return {"status": 404, "body": b"not here"}
            return {"status": 200, "body": body.encode()}
        body = corpus.get(url)
        return {"status": 200, "body": body} if body else {"error": "miss"}

    return fn


def _results(spark, wd):
    return [
        tuple(r)
        for r in spark.read.parquet(f"{wd}/results")
        .select(*RESULT_COLS)
        .orderBy("round", "url")
        .collect()
    ]


def test_robots_fetch_crawl_equals_static_rules(spark, sf_dir):
    pages, corpus, hosts, robots = _corpus(spark, sf_dir)
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(5).collect()
    ]
    # hosts num%8==4 carry a wildcard Disallow for /p1* docs (allow
    # override on p13*): seed a few so the live-fetched gate visibly
    # blocks, not just vacuously matches
    seeds += [
        u
        for u in sorted(corpus)
        if "h4." in u and "/p1" in u and "/p13" not in u
    ][:3]
    fn = _fetch_fn(corpus, robots)
    scheme = seeds[0].split("://")[0]

    wd_static = tempfile.mkdtemp(prefix="robots_static_")
    shutil.rmtree(wd_static, ignore_errors=True)
    run_crawl(
        spark, pages, seeds, wd_static,
        CrawlConfig(
            max_depth=3,
            robots_rules=rules_table(spark, robots),
            fetcher=MapFetcher(fn),
        ),
        max_rounds=3,
    )
    wd_live = tempfile.mkdtemp(prefix="robots_live_")
    shutil.rmtree(wd_live, ignore_errors=True)
    run_crawl(
        spark, pages, seeds, wd_live,
        CrawlConfig(
            max_depth=3, robots_fetch=True, robots_scheme=scheme,
            fetcher=MapFetcher(fn),
        ),
        max_rounds=3,
    )
    static_res = _results(spark, wd_static)
    live_res = _results(spark, wd_live)
    assert static_res == live_res
    # the gate actually bit: synthetic_robots disallows /de/ on every
    # 4th host, so some URLs must be robots-blocked
    blocked = [r for r in live_res if r[3] == "robots_blocked"]
    assert blocked, "expected robots-blocked rows in the parity corpus"

    # cache increments: round 0 fetched the seed hosts; later rounds
    # fetch only hosts not seen before (disjoint per-round host sets)
    per_round = {}
    for name in sorted(os.listdir(f"{wd_live}/robots")):
        inc = spark.read.schema(ROBOTS_CACHE_SCHEMA).parquet(
            f"{wd_live}/robots/{name}"
        )
        per_round[name] = {r["host"] for r in inc.select("host").collect()}
    assert per_round["r0"]  # seeds' hosts fetched in round 0
    seen: set = set()
    for name, hs in sorted(per_round.items()):
        assert not (hs & seen), f"{name} refetched cached hosts"
        seen |= hs
    shutil.rmtree(wd_static, ignore_errors=True)
    shutil.rmtree(wd_live, ignore_errors=True)


def test_robots_fetch_miss_is_cached_allow_all(spark):
    """404 / error hosts cache an EMPTY rules row (allow-all) with the
    status recorded — aging out via the TTL instead of refetching
    every round (documented divergence from the reference, which does
    not cache misses)."""
    hosts = spark.createDataFrame(
        [("ok.example",), ("gone.example",), ("down.example",)], ["host"]
    )
    bodies = {"ok.example": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2"}

    def fn(url):
        h = url.split("/")[2]
        if h == "down.example":
            raise ConnectionError("refused")
        body = bodies.get(h)
        if body is None:
            return {"status": 404, "body": b"nope"}
        return {"status": 200, "body": body.encode()}

    inc = fetch_robots_rules(
        hosts, MapFetcher(fn), scheme="https", round_no=7
    )
    rows = {r["host"]: r for r in inc.collect()}
    ok = rows["ok.example"]
    assert [d["p"] for d in ok["disallow"]] == ["/private/"]
    assert ok["crawl_delay"] == 2.0 and ok["robots_status"] == 200
    assert ok["fetched_round"] == 7
    gone = rows["gone.example"]
    assert gone["disallow"] == [] and gone["allow"] == []
    assert gone["robots_status"] == 404 and gone["crawl_delay"] is None
    down = rows["down.example"]
    assert down["disallow"] == [] and down["robots_status"] is None


def test_robots_ttl_refetches_expired_hosts(spark, sf_dir):
    pages, corpus, hosts, robots = _corpus(spark, sf_dir)
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(5).collect()
    ]
    fn = _fetch_fn(corpus, robots)
    scheme = seeds[0].split("://")[0]
    wd = tempfile.mkdtemp(prefix="robots_ttl_")
    shutil.rmtree(wd, ignore_errors=True)
    run_crawl(
        spark, pages, seeds, wd,
        CrawlConfig(
            max_depth=3, robots_fetch=True, robots_scheme=scheme,
            robots_ttl_rounds=1, fetcher=MapFetcher(fn),
        ),
        max_rounds=3,
    )
    r0 = {
        r["host"]
        for r in spark.read.schema(ROBOTS_CACHE_SCHEMA)
        .parquet(f"{wd}/robots/r0").collect()
    }
    r1 = {
        r["host"]
        for r in spark.read.schema(ROBOTS_CACHE_SCHEMA)
        .parquet(f"{wd}/robots/r1").collect()
    }
    # ttl=1: round-0 rows are expired by round 1, so any round-0 host
    # still in the round-1 frontier must be REfetched
    assert r0 & r1, "expected expired hosts to be refetched"
    shutil.rmtree(wd, ignore_errors=True)


def test_robots_fetch_requires_a_fetcher(spark, sf_dir):
    pages = generate_pages(spark, sf_dir)
    wd = tempfile.mkdtemp(prefix="robots_nofetcher_")
    shutil.rmtree(wd, ignore_errors=True)
    with pytest.raises(ValueError, match="robots_fetch requires"):
        run_crawl(
            spark, pages,
            [pages.select("url").orderBy("url").head()["url"]],
            wd, CrawlConfig(robots_fetch=True), max_rounds=1,
        )
    shutil.rmtree(wd, ignore_errors=True)


def test_robots_fetch_rewind_replays_identically(spark, sf_dir):
    pages, corpus, hosts, robots = _corpus(spark, sf_dir)
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(4).collect()
    ]
    fn = _fetch_fn(corpus, robots)
    scheme = seeds[0].split("://")[0]
    wd = tempfile.mkdtemp(prefix="robots_rewind_")
    shutil.rmtree(wd, ignore_errors=True)
    cfg = CrawlConfig(
        max_depth=3, robots_fetch=True, robots_scheme=scheme,
        fetcher=MapFetcher(fn),
    )
    run = CrawlRun(spark, pages, wd, cfg)
    run.seed(seeds)
    run.run(max_rounds=3)
    before = _results(spark, wd)
    run.rewind_to_round(0)
    assert not os.path.isdir(f"{wd}/robots/r1")  # in-round state forgotten
    assert os.path.isdir(f"{wd}/robots/r0")  # round 0 kept
    run.run(max_rounds=3)
    assert _results(spark, wd) == before
    shutil.rmtree(wd, ignore_errors=True)


def test_discovered_sitemaps_feed_the_seeder(spark, sf_dir):
    """Crawl -> robots cache -> Sitemap: lines -> seeder expansion:
    the loop the reference runs per-domain (async_url_seeder.py
    robots fallback), closed over the crawl's own live robots cache."""
    from crawl4ai_spark.sources.seeder import expand_sitemaps, sitemap_locs

    pages, corpus, hosts, robots = _corpus(spark, sf_dir)
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(3).collect()
    ]
    host0 = seeds[0].split("/")[2]
    robots = dict(robots)
    robots[host0] = (
        robots.get(host0, "User-agent: *\n")
        + f"\nSitemap: https://{host0}/sitemap.xml"
    )
    fn = _fetch_fn(corpus, robots)
    wd = tempfile.mkdtemp(prefix="robots_sm_")
    shutil.rmtree(wd, ignore_errors=True)
    run = CrawlRun(
        spark, pages, wd,
        CrawlConfig(max_depth=2, robots_fetch=True,
                    robots_scheme=seeds[0].split("://")[0],
                    fetcher=MapFetcher(fn)),
    )
    run.seed(seeds)
    run.run(max_rounds=2)
    sm = run.discovered_sitemaps()
    got = {(r["host"], r["sitemap_url"]) for r in sm.collect()}
    assert (host0, f"https://{host0}/sitemap.xml") in got
    # the pairs drop straight into the seeder's sitemap expansion
    xml = (
        "<urlset>"
        + "".join(f"<url><loc>{u}</loc></url>" for u in sorted(corpus)[:4])
        + "</urlset>"
    )
    dim = spark.createDataFrame(
        [(f"https://{host0}/sitemap.xml", xml)], "sitemap_url string, xml string"
    ).withColumn("locs", sitemap_locs("xml"))
    roots = [r["sitemap_url"] for r in sm.collect()]
    urls = expand_sitemaps(spark, dim, roots)
    assert urls.count() == 4
    shutil.rmtree(wd, ignore_errors=True)
