"""SeederCache (S13): per-domain TTL cache semantics mirroring the
reference's seeder disk cache (async_url_seeder.py:241-260)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.sources.seeder_cache import SeederCache, seed_urls_cached

T0 = 1_700_000_000


def _discover_counter(calls):
    def discover(stale_df):
        doms = sorted(r["domain"] for r in stale_df.collect())
        calls.append(doms)
        spark = stale_df.sparkSession
        return spark.createDataFrame(
            [(d, f"https://{d}/p{i}.html") for d in doms for i in range(3)],
            "domain string, url string",
        )
    return discover


def test_read_through_and_hit(spark, tmp_path):
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=3600)
    calls = []
    out1 = seed_urls_cached(
        spark, cache, "cc", ["a.com", "b.com"], T0, _discover_counter(calls)
    )
    assert out1.count() == 6
    assert calls == [["a.com", "b.com"]]  # both missed

    calls2 = []
    out2 = seed_urls_cached(
        spark, cache, "cc", ["a.com", "b.com"], T0 + 100, _discover_counter(calls2)
    )
    assert out2.count() == 6
    assert calls2 == []  # full hit: discover never invoked


def test_ttl_expiry_refetches(spark, tmp_path):
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=3600)
    calls = []
    disc = _discover_counter(calls)
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0, disc).count()
    # inside TTL: hit; after TTL: refetch
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0 + 3599, disc).count()
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0 + 3601, disc).count()
    assert calls == [["a.com"], ["a.com"]]


def test_partial_hit_fetches_only_stale(spark, tmp_path):
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=3600)
    calls = []
    disc = _discover_counter(calls)
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0, disc).count()
    out = seed_urls_cached(spark, cache, "cc", ["a.com", "b.com"], T0 + 10, disc)
    assert out.count() == 6
    assert calls == [["a.com"], ["b.com"]]  # only the miss refetched


def test_newest_generation_wins(spark, tmp_path):
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=10**9)
    g1 = spark.createDataFrame([("a.com", "https://a.com/old.html")],
                               "domain string, url string")
    g2 = spark.createDataFrame([("a.com", "https://a.com/new.html")],
                               "domain string, url string")
    cache.write("cc", g1, T0)
    cache.write("cc", g2, T0 + 500)
    req = spark.createDataFrame([("a.com",)], "domain string")
    fresh, stale = cache.split_fresh("cc", req, T0 + 1000)
    urls = [r["url"] for r in fresh.collect()]
    assert urls == ["https://a.com/new.html"]
    assert stale.count() == 0


def test_force_bypasses_cache(spark, tmp_path):
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=3600)
    calls = []
    disc = _discover_counter(calls)
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0, disc).count()
    seed_urls_cached(spark, cache, "cc", ["a.com"], T0 + 1, disc,
                     force=True).count()
    assert calls == [["a.com"], ["a.com"]]


def test_domain_partition_pruning(spark, tmp_path):
    """The cache scan for k domains must prune to those partitions."""
    cache = SeederCache(spark, str(tmp_path / "sc"), ttl_seconds=10**9)
    rows = spark.createDataFrame(
        [(f"d{i}.com", f"https://d{i}.com/x.html") for i in range(20)],
        "domain string, url string",
    )
    cache.write("cc", rows, T0)
    req = spark.createDataFrame([("d3.com",)], "domain string")
    fresh, _ = cache.split_fresh("cc", req, T0 + 1)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert fresh.count() == 1
    # the broadcast-join against the requested domain list feeds the
    # scan through dynamic/static pruning; at minimum the filter exists
    assert "domain" in plan
