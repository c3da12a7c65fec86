"""Proxy rotation (operators/proxy.py): ProxyConfig parsing parity
with the reference (proxy_strategy.py:10-117), deterministic hash-mod
rotation as the distributed stand-in for RoundRobinProxyStrategy
(proxy_strategy.py:135-158, advanced at async_webcrawler.py:297-307),
per-row proxy routing in UrllibFetcher against a LIVE stdlib HTTP
proxy, and CrawlConfig(proxies=...) plumbing through the crawl loop."""

from __future__ import annotations

import http.server
import shutil
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.fetch import (
    MapFetcher,
    UrllibFetcher,
    fetch_stage,
)
from crawl4ai_spark.operators.frontier import CrawlConfig, run_crawl
from crawl4ai_spark.operators.proxy import ProxyConfig, assign_proxies
from crawl4ai_spark.synth import generate_pages


# ---------------------------------------------------------------- config

def test_proxy_config_from_string_four_part():
    p = ProxyConfig.from_string("10.0.0.1:8080:alice:s3cret")
    assert p.server == "http://10.0.0.1:8080"
    assert p.username == "alice" and p.password == "s3cret"
    assert p.ip == "10.0.0.1"


def test_proxy_config_from_string_two_part():
    p = ProxyConfig.from_string("10.0.0.2:3128")
    assert p.server == "http://10.0.0.2:3128"
    assert p.username is None and p.ip == "10.0.0.2"


def test_proxy_config_from_string_invalid():
    with pytest.raises(ValueError):
        ProxyConfig.from_string("not-a-proxy")


def test_proxy_config_from_env(monkeypatch):
    monkeypatch.setenv(
        "PROXIES", "1.1.1.1:80,2.2.2.2:81:u:p,,bogus"
    )
    ps = ProxyConfig.from_env()
    assert [p.server for p in ps] == ["http://1.1.1.1:80", "http://2.2.2.2:81"]
    assert ps[1].username == "u"


def test_proxy_config_clone_and_ip_extraction():
    p = ProxyConfig(server="http://proxy.example:9999")
    assert p.ip == "proxy.example"
    q = p.clone(username="u2")
    assert q.username == "u2" and q.server == p.server
    assert p.username is None  # clone didn't mutate


def test_request_url_embeds_quoted_credentials():
    p = ProxyConfig(
        server="http://h:1", username="a@b", password="p:w d"
    )
    assert p.request_url() == "http://a%40b:p%3Aw%20d@h:1"
    assert ProxyConfig(server="http://h:1").request_url() == "http://h:1"


# ------------------------------------------------------------ assignment

def test_assign_proxies_even_and_deterministic(spark):
    urls = [(f"http://h{i % 7}.test/p{i}",) for i in range(900)]
    df = spark.createDataFrame(urls, "url string")
    pool = ["10.0.0.1:1", "10.0.0.2:2", "10.0.0.3:3"]
    a = assign_proxies(df, pool)
    counts = {
        r["proxy_server"]: r["n"]
        for r in a.groupBy("proxy_server").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {
        "http://10.0.0.1:1", "http://10.0.0.2:2", "http://10.0.0.3:3"
    }
    # even within a loose band (hash-mod over 900 urls)
    assert all(900 / 3 * 0.6 <= n <= 900 / 3 * 1.4 for n in counts.values())
    # deterministic: same input -> same assignment
    m1 = dict(a.select("url", "proxy_server").collect())
    m2 = dict(assign_proxies(df, pool).select("url", "proxy_server").collect())
    assert m1 == m2


def test_assign_proxies_per_host_is_sticky(spark):
    urls = [(f"http://h{i % 5}.test/p{i}",) for i in range(100)]
    df = spark.createDataFrame(urls, "url string")
    a = assign_proxies(df, ["1.1.1.1:1", "2.2.2.2:2"], per="host")
    per_host = (
        a.withColumn("host", F.regexp_extract("url", r"//([^/]+)/", 1))
        .groupBy("host")
        .agg(F.count_distinct("proxy_server").alias("k"))
        .collect()
    )
    assert per_host and all(r["k"] == 1 for r in per_host)


def test_assign_proxies_empty_pool_and_bad_per(spark):
    df = spark.createDataFrame([("http://a/",)], "url string")
    assert assign_proxies(df, []).collect()[0]["proxy_server"] is None
    with pytest.raises(ValueError):
        assign_proxies(df, ["1.1.1.1:1"], per="request")


def test_assigned_proxy_reaches_fetcher_rows(spark):
    """The column a fetcher row sees is exactly the assignment."""
    df = spark.createDataFrame(
        [(f"http://h{i}.test/",) for i in range(20)], "url string"
    )
    pool = ["10.0.0.1:1", "10.0.0.2:2"]
    a = assign_proxies(df, pool)
    expect = dict(a.select("url", "proxy_server").collect())

    def fn(url, extra):
        return {
            "status": 200,
            "body": (extra.get("proxy_server") or "direct").encode(),
        }

    out = fetch_stage(a, MapFetcher(fn, pass_cols=("proxy_server",)))
    for r in out.select("url", "html").collect():
        assert r["html"] == expect[r["url"]]


# ------------------------------------------------------------- live proxy

class _ProxyHandler(http.server.BaseHTTPRequestHandler):
    """A minimal forward proxy: for proxied http requests the request
    line carries the ABSOLUTE URL, so `self.path` is the target —
    answer with it (plus the Proxy-Authorization echo) instead of
    forwarding, which is all the test needs."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        auth = self.headers.get("Proxy-Authorization", "")
        body = f"<html>via-proxy {self.path} auth={auth}</html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def proxy_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ProxyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_urllib_fetcher_routes_through_proxy(spark, proxy_base):
    """Rows carrying proxy_server go through the proxy (the target host
    is never resolved — .invalid would fail DNS if it were); rows
    without one go direct (and fail on the unresolvable host)."""
    df = spark.createDataFrame(
        [
            ("http://upstream.invalid/page", f"http://u:p@{proxy_base}"),
            ("http://upstream.invalid/direct", None),
        ],
        "url string, proxy_server string",
    )
    out = fetch_stage(df.coalesce(1), UrllibFetcher(timeout=5.0))
    rows = {r["url"]: r for r in out.collect()}

    via = rows["http://upstream.invalid/page"]
    assert via["http_status"] == 200
    assert "via-proxy http://upstream.invalid/page" in via["html"]
    # urllib emitted Proxy-Authorization from the URL userinfo
    assert "auth=Basic" in via["html"]

    direct = rows["http://upstream.invalid/direct"]
    assert direct["http_status"] is None and direct["fetch_error"]


# ------------------------------------------------------------ crawl loop

def test_crawl_config_proxies_plumbs_and_drops_column(spark, sf_dir):
    """CrawlConfig(proxies=...) assigns per-row proxies that the
    fetcher consumes, and the proxy column never reaches results."""
    pages = generate_pages(spark, sf_dir)
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(2).collect()
    ]
    bodies = {
        r["url"]: r["html"] for r in pages.select("url", "html").collect()
    }

    def fn(url, extra):
        html = bodies.get(url)
        if html is None:
            return {"status": 404, "body": b"<html>nope</html>"}
        if isinstance(html, bytes):
            html = html.decode("utf-8", "replace")
        stamp = f"<p>proxy={extra.get('proxy_server') or 'direct'}</p>"
        return {
            "status": 200,
            "body": html.replace("</body>", stamp + "</body>").encode(),
        }

    cfg = CrawlConfig(
        fetcher=MapFetcher(fn, pass_cols=("proxy_server",)),
        proxies=["10.9.9.1:1:u:p", "10.9.9.2:2"],
    )
    wd = tempfile.mkdtemp(prefix="proxy_crawl_")
    shutil.rmtree(wd, ignore_errors=True)
    try:
        run_crawl(spark, pages, seeds, wd, cfg, max_rounds=2)
        res = spark.read.parquet(f"{wd}/results")
        assert "proxy_server" not in res.columns
        stamps = [
            r["text_extracted"]
            for r in res.filter(F.col("success")).collect()
        ]
        assert stamps and all(
            "proxy=http://" in t and "10.9.9." in t for t in stamps
        )
        # both proxies appear across the crawl (rotation, not constant)
        assert any("proxy=http://u:p@10.9.9.1:1" in t for t in stamps)
        assert any("proxy=http://10.9.9.2:2" in t for t in stamps)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
