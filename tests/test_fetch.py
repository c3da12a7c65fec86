"""Pluggable fetch seam (operators/fetch.py): crawl-over-fetcher ==
crawl-over-join, per-row error degradation, and a LIVE UrllibFetcher
exercise against a local http.server (redirect / 404-with-body /
header-charset / connection-refused) mirroring the reference
AsyncHTTPCrawlerStrategy._handle_http semantics
(async_crawler_strategy.py:2346-2419)."""

from __future__ import annotations

import http.server
import shutil
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.fetch import (
    MapFetcher,
    PagesJoinFetcher,
    UrllibFetcher,
    fetch_stage,
)
from crawl4ai_spark.operators.frontier import CrawlConfig, run_crawl
from crawl4ai_spark.synth import generate_pages


def _crawl_results(spark, pages, cfg, seeds):
    wd = tempfile.mkdtemp(prefix="fetch_crawl_")
    shutil.rmtree(wd, ignore_errors=True)
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=2)
    rows = (
        spark.read.parquet(f"{wd}/results")
        .select(
            "url", "round", "depth", "fetch_status", "success", "n_links",
            "title", "text_extracted",
        )
        .orderBy("round", "url")
        .collect()
    )
    shutil.rmtree(wd, ignore_errors=True)
    return [tuple(r) for r in rows]


def test_crawl_over_map_fetcher_equals_join(spark, sf_dir):
    """The engine's default pages-join and a MapFetcher resolving from
    the same corpus must produce bit-identical crawl results."""
    pages = generate_pages(spark, sf_dir).cache()
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(5).collect()
    ]
    corpus = {  # synth html is a binary column: raw page bytes
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }

    def fake_http(url):
        body = corpus.get(url)
        if body is None:
            return {"status": 404}
        return {"status": 200, "body": body}

    base = _crawl_results(spark, pages, CrawlConfig(max_depth=3), seeds)
    via_fetcher = _crawl_results(
        spark, pages, CrawlConfig(max_depth=3, fetcher=MapFetcher(fake_http)),
        seeds,
    )
    assert base == via_fetcher
    assert any(r[3] == "fetched" for r in base)


def test_pages_join_fetcher_matches_inline_join(spark, sf_dir):
    pages = generate_pages(spark, sf_dir).cache()
    f = PagesJoinFetcher(pages)
    df = pages.select("url").limit(20).union(
        spark.createDataFrame([("https://nowhere.example/zz",)], "url string")
    )
    out = f.fetch(df).collect()
    hits = [r for r in out if r["fetch_error"] is None]
    miss = [r for r in out if r["fetch_error"] == "miss"]
    assert len(hits) == 20 and len(miss) == 1
    assert all(r["http_status"] == 200 and r["html"] for r in hits)
    assert miss[0]["html"] is None and miss[0]["http_status"] is None


def test_map_fetcher_exception_becomes_error_row(spark):
    def flaky(url):
        if url.endswith("boom"):
            raise RuntimeError("kaput")
        return {"status": 200, "body": b"<html>ok</html>"}

    df = spark.createDataFrame(
        [("https://a/x",), ("https://a/boom",)], "url string"
    )
    rows = {r["url"]: r for r in fetch_stage(df, flaky).collect()}
    assert rows["https://a/x"]["html"] == "<html>ok</html>"
    assert rows["https://a/boom"]["fetch_error"] == "RuntimeError: kaput"
    assert rows["https://a/boom"]["html"] is None


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/ok":
            body = "<html><title>fine</title>plain utf-8</html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
        elif self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
            return
        elif self.path == "/cp1252":
            body = "<html>“fancy” quotes</html>".encode("windows-1252")
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/html; charset=windows-1252"
            )
        else:
            body = b"<html>not here</html>"
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_urllib_fetcher_live(spark, http_base):
    urls = [
        f"{http_base}/ok", f"{http_base}/redir", f"{http_base}/cp1252",
        f"{http_base}/gone",
        "http://127.0.0.1:9/refused",  # port 9 (discard): refused
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = fetch_stage(df.coalesce(1), UrllibFetcher(timeout=5.0))
    rows = {r["url"]: r for r in out.collect()}

    ok = rows[f"{http_base}/ok"]
    assert ok["http_status"] == 200 and "plain utf-8" in ok["html"]
    assert ok["final_url"] == f"{http_base}/ok"

    redir = rows[f"{http_base}/redir"]
    assert redir["http_status"] == 200
    assert redir["final_url"] == f"{http_base}/ok"  # followed
    assert "plain utf-8" in redir["html"]

    cp = rows[f"{http_base}/cp1252"]
    assert cp["http_status"] == 200
    assert "“fancy”" in cp["html"]  # header charset honored

    gone = rows[f"{http_base}/gone"]
    assert gone["http_status"] == 404  # status captured, not raised
    assert "not here" in gone["html"]  # non-2xx body kept

    refused = rows["http://127.0.0.1:9/refused"]
    assert refused["http_status"] is None
    assert refused["fetch_error"] and "Connection" in refused["fetch_error"]
