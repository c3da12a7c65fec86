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
            # mirror PagesJoinFetcher's unresolved-lookup semantics
            # (a 404 would be an ANSWER -> fetch_status='http_error')
            return {"error": "miss"}
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
        if self.path == "/cond":
            # conditional GET: ETag v1 / a fixed Last-Modified; a
            # matching validator gets 304 with no body (RFC 9110 §13)
            if (
                self.headers.get("If-None-Match") == '"v1"'
                or self.headers.get("If-Modified-Since")
                == "Wed, 01 Jan 2025 00:00:00 GMT"
            ):
                self.send_response(304)
                self.send_header("ETag", '"v1"')
                self.end_headers()
                return
            body = b"<html>versioned</html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("ETag", '"v1"')
            self.send_header(
                "Last-Modified", "Wed, 01 Jan 2025 00:00:00 GMT"
            )
        elif self.path == "/ok":
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


def test_non2xx_body_is_http_error_and_links_not_followed(spark, sf_dir):
    """A non-2xx response WITH an html body must surface as
    fetch_status='http_error', success=false, and its links must not
    enter the next frontier — the reference raises HTTPStatusError for
    non-2xx instead of treating the error page as content."""
    pages = generate_pages(spark, sf_dir).cache()
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(3).collect()
    ]
    corpus = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }
    bad = seeds[0]

    def soft_error(url):
        body = corpus.get(url)
        if body is None:
            return {"status": 404}
        return {"status": 503 if url == bad else 200, "body": body}

    wd = tempfile.mkdtemp(prefix="fetch_non2xx_")
    shutil.rmtree(wd, ignore_errors=True)
    run_crawl(
        spark, pages, seeds, wd,
        CrawlConfig(max_depth=2, fetcher=MapFetcher(soft_error)),
        max_rounds=2,
    )
    res = spark.read.parquet(f"{wd}/results")
    r0 = {r["url"]: r for r in res.filter(F.col("round") == 0).collect()}
    assert r0[bad]["fetch_status"] == "http_error"
    assert r0[bad]["success"] is False
    assert r0[bad]["http_status"] == 503
    ok = [r for u, r in r0.items() if u != bad]
    assert ok and all(
        r["fetch_status"] == "fetched" and r["http_status"] == 200 for r in ok
    )
    # no round-1 row descends from the error page
    bad_hash = r0[bad]["url_hash"]
    children = res.filter(
        (F.col("round") == 1) & (F.col("parent_url_hash") == bad_hash)
    ).count()
    assert children == 0
    # ...but the healthy seeds' links were followed
    assert res.filter(F.col("round") == 1).count() > 0
    shutil.rmtree(wd, ignore_errors=True)


def test_fetcher_redirect_resolves_links_against_final_url(spark):
    """Relative links in a redirected page belong to the POST-redirect
    URL (reference: redirected_url): href='leaf.html' served after a
    redirect to /sub/dir/index.html must enqueue /sub/dir/leaf.html,
    not /leaf.html."""
    start = "https://a.example/start"
    final = "https://a.example/sub/dir/index.html"

    def redirecting(url):
        if url == start:
            return {
                "status": 200,
                "body": b'<html><body><a href="leaf.html">x</a></body></html>',
                "final_url": final,
            }
        return {"status": 404}

    pages = generate_pages(spark, "/root/testdata/sf0.001")
    wd = tempfile.mkdtemp(prefix="fetch_redir_")
    shutil.rmtree(wd, ignore_errors=True)
    run_crawl(
        spark, pages, [start], wd,
        CrawlConfig(max_depth=2, fetcher=MapFetcher(redirecting)),
        max_rounds=2,
    )
    res = spark.read.parquet(f"{wd}/results")
    seed_row = res.filter(F.col("round") == 0).collect()[0]
    assert seed_row["final_url"] == final
    round1 = [r["url"] for r in res.filter(F.col("round") == 1).collect()]
    assert round1 == ["https://a.example/sub/dir/leaf.html"]
    shutil.rmtree(wd, ignore_errors=True)


def test_fetch_stage_replaces_stale_fetch_columns(spark):
    """Re-fetching rows that already carry html/http_status/... (read
    back from a results table) must not produce duplicate columns."""
    df = spark.createDataFrame(
        [("https://a/x", "<old/>", 500, "stale")],
        "url string, html string, http_status int, fetch_error string",
    )
    out = fetch_stage(df, lambda url: {"status": 200, "body": b"<html>new</html>"})
    assert len(out.columns) == len(set(out.columns))
    row = out.collect()[0]
    assert row["html"] == "<html>new</html>"
    assert row["http_status"] == 200 and row["fetch_error"] is None


def test_pages_join_fetcher_decodes_binary_html(spark, sf_dir):
    """The contract says html is a decoded STRING — a binary pages
    column (WARC shape) must come out decoded, same as MapFetcher."""
    pages = generate_pages(spark, sf_dir)  # html is binary in synth
    assert dict(pages.dtypes)["html"] == "binary"
    out = PagesJoinFetcher(pages).fetch(pages.select("url").limit(3))
    assert dict(out.dtypes)["html"] == "string"
    assert all(r["html"].startswith("<") for r in out.collect())


def test_urllib_fetcher_labels_wrapped_timeouts(spark, monkeypatch):
    """urllib surfaces connect-phase timeouts as
    URLError(reason=TimeoutError) — they must keep the documented
    ConnectionTimeoutError label, not the generic ConnectionError."""
    import urllib.error

    f = UrllibFetcher(timeout=0.1)
    import urllib.request

    def boom(req, timeout=None):
        raise urllib.error.URLError(TimeoutError("timed out"))

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    r = f._get("http://10.255.255.1/never")
    assert r["error"].startswith("ConnectionTimeoutError")


def test_map_fetcher_concurrency_overlaps_hosts_not_within_host(spark):
    """concurrency>1: distinct hosts fetch in parallel inside one task,
    a single host's URLs stay strictly sequential (politeness), and the
    Arrow contract (input order, same results) holds. Timings are
    carried back through the body bytes because the callable runs in
    the Python worker process, not the test process."""
    import time

    def timed(url):
        s = time.monotonic()
        time.sleep(0.2)  # wide window: pool-thread startup jitter on a
        # loaded host must not be able to serialize the groups
        e = time.monotonic()
        return {"status": 200, "body": f"{s:.6f},{e:.6f}".encode(),
                "final_url": url, "charset": "ascii"}

    urls = [
        (f"http://h{i % 4}.example/p{i}",) for i in range(8)
    ]  # 4 hosts x 2 urls
    df = spark.createDataFrame(urls, "url string").repartition(1)
    rows = (
        MapFetcher(timed, concurrency=4)
        .fetch(df)
        .select("url", "html", "http_status", "fetch_error")
        .collect()
    )
    assert [r["url"] for r in rows] == [u for (u,) in urls]  # order kept
    assert all(r["http_status"] == 200 and r["fetch_error"] is None
               for r in rows)
    spans = {}
    for r in rows:
        host = r["url"].split("/")[2]
        s, e = map(float, r["html"].split(","))
        spans.setdefault(host, []).append((s, e))
    # within a host: no two intervals overlap
    for ivs in spans.values():
        ivs.sort()
        assert all(a[1] <= b[0] + 1e-6 for a, b in zip(ivs, ivs[1:]))
    # across hosts: at least two intervals overlap somewhere
    flat = sorted(iv for ivs in spans.values() for iv in ivs)
    assert any(a[1] > b[0] for a, b in zip(flat, flat[1:]))


def test_map_fetcher_concurrent_matches_sequential(spark, sf_dir):
    """Same fn, concurrency 1 vs 6 — identical output rows (and errors
    still degrade per-row, never kill the task)."""
    def fn(url):
        if url.endswith("7"):
            raise ValueError("boom")
        return {"status": 200, "body": f"<p>{url}</p>".encode(),
                "final_url": url + "#f", "charset": "utf-8"}

    df = spark.createDataFrame(
        [(f"http://h{i % 3}.ex/a{i}",) for i in range(20)], "url string"
    )
    seq = MapFetcher(fn, concurrency=1).fetch(df).orderBy("url").collect()
    par = MapFetcher(fn, concurrency=6).fetch(df).orderBy("url").collect()
    assert [r.asDict() for r in seq] == [r.asDict() for r in par]
    assert sum(1 for r in par if r["fetch_error"]) == 2  # a7, a17


def test_live_fetcher_keeps_each_host_in_one_partition(spark, sf_dir):
    """A host_exclusive fetcher must see every URL of a host inside a
    single task — the salted hot-host spread would turn per-task
    sequential fetching into up to `salt` concurrent request streams
    per host, violating crawl-delay politeness."""
    import shutil
    import tempfile

    pages = generate_pages(spark, "/root/testdata/sf0.001")

    def fake(url):
        return {"status": 200, "body": b"<html><body>x</body></html>"}

    assert MapFetcher(fake).host_exclusive
    assert not PagesJoinFetcher(pages).host_exclusive

    wd = tempfile.mkdtemp(prefix="fetch_hostexcl_")
    shutil.rmtree(wd, ignore_errors=True)
    seeds = [r["url"] for r in pages.limit(12).collect()]
    run_crawl(
        spark, pages, seeds, wd,
        CrawlConfig(max_depth=3, salt=8, fetcher=MapFetcher(fake)),
        max_rounds=2,
    )
    res = spark.read.parquet(f"{wd}/results").filter(
        F.col("fetch_status").isin("fetched", "http_error", "error")
    )
    per_host = (
        res.groupBy("host")
        .agg(F.countDistinct("partition_id").alias("nparts"))
        .collect()
    )
    assert per_host and all(r["nparts"] == 1 for r in per_host)
    shutil.rmtree(wd, ignore_errors=True)


def test_map_fetcher_host_interval_spaces_same_host_requests(spark):
    """host_interval is a per-host floor between request starts — both
    in the threaded path (same-host sequential) and across hosts it
    must NOT serialize distinct hosts."""
    import time

    urls = (
        [f"https://a.example.com/p{i}" for i in range(4)]
        + [f"https://b.example.com/p{i}" for i in range(4)]
    )

    def timed(url):
        return {
            "status": 200,
            "body": f"<html><body>{time.monotonic()}</body></html>".encode(),
        }

    df = spark.createDataFrame([(u,) for u in urls], ["url"]).coalesce(1)
    out = (
        MapFetcher(timed, concurrency=4, host_interval=0.15)
        .fetch(df)
        .select("url", "html")
        .collect()
    )
    stamps: dict[str, list[float]] = {}
    for r in out:
        host = r["url"].split("/")[2]
        stamps.setdefault(host, []).append(
            float(r["html"].split("<body>")[1].split("</body>")[0])
        )
    for host, ts in stamps.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert all(g >= 0.14 for g in gaps), (host, gaps)
    # distinct hosts overlapped: total wall is ~one host's chain, not two
    allts = sorted(t for ts in stamps.values() for t in ts)
    assert allts[-1] - allts[0] < 0.15 * 7


def test_map_fetcher_per_row_interval_column(spark):
    """host_interval_col: a per-row delay (e.g. robots Crawl-delay)
    raises the spacing floor for that host; null/NaN rows fall back to
    the global interval."""
    import time

    rows = (
        [(f"https://slow.example.com/p{i}", 0.2) for i in range(3)]
        + [(f"https://fast.example.com/p{i}", None) for i in range(3)]
    )

    def timed(url):
        return {
            "status": 200,
            "body": f"<html><body>{time.monotonic()}</body></html>".encode(),
        }

    df = spark.createDataFrame(
        rows, "url string, robots_crawl_delay double"
    ).coalesce(1)
    out = (
        MapFetcher(
            timed, concurrency=4, host_interval_col="robots_crawl_delay"
        )
        .fetch(df)
        .collect()
    )
    stamps: dict[str, list[float]] = {}
    for r in out:
        stamps.setdefault(r["url"].split("/")[2], []).append(
            float(r["html"].split("<body>")[1].split("</body>")[0])
        )
    slow = sorted(stamps["slow.example.com"])
    fast = sorted(stamps["fast.example.com"])
    assert all(b - a >= 0.19 for a, b in zip(slow, slow[1:]))
    assert fast[-1] - fast[0] < 0.15  # unpaced host ran back-to-back


def test_crawl_respects_robots_delay_column_plumbing(spark, sf_dir):
    """Crawl with a fetcher that declares host_interval_col: the
    robots_crawl_delay column rides into the fetch layout, is consumed
    there, and results match the undeclared-fetcher crawl exactly."""
    from crawl4ai_spark.operators.robots import rules_table, synthetic_robots

    pages = generate_pages(spark, sf_dir).cache()
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(5).collect()
    ]
    corpus = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }

    def fake_http(url):
        body = corpus.get(url)
        return {"status": 200, "body": body} if body else {"error": "miss"}

    # synthetic_robots takes SHORT names and appends .example.com
    hosts = sorted({u.split("/")[2].split(".")[0] for u in corpus})
    rules = rules_table(spark, synthetic_robots(hosts))
    base = _crawl_results(
        spark, pages,
        CrawlConfig(max_depth=3, robots_rules=rules,
                    fetcher=MapFetcher(fake_http)),
        seeds,
    )
    paced = _crawl_results(
        spark, pages,
        CrawlConfig(
            max_depth=3, robots_rules=rules,
            fetcher=MapFetcher(
                fake_http, host_interval_col="robots_crawl_delay"
            ),
        ),
        seeds,
    )
    assert base == paced and any(r[3] == "fetched" for r in base)


def test_map_fetcher_first_request_not_paced_against_boot_clock(spark):
    """A host's FIRST request must never sleep: the last-start dict
    starts empty, and 0.0 is a real monotonic point (seconds since
    boot), not a 'no previous request' sentinel. The giant interval
    makes the sentinel bug (wait = 0.0 + interval - monotonic()) hang
    on ANY host uptime, so completing at all proves the fix."""
    import time

    urls = [f"https://h{i}.example.com/only" for i in range(3)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).coalesce(1)
    t0 = time.monotonic()
    out = (
        MapFetcher(lambda u: {"status": 200, "body": b"<html>x</html>"},
                   concurrency=2, host_interval=1e9)
        .fetch(df)
        .collect()
    )
    assert len(out) == 3 and time.monotonic() - t0 < 60.0


def test_map_fetcher_hosts_beyond_concurrency_overlap_waits(spark):
    """Crawl-delay sleeps must not occupy pool workers: with more
    hosts than threads, every host's inter-request wait overlaps every
    other's (deadline scheduler), so wall ~= one host's chain — the
    whole-group-per-worker shape serialized host groups behind sleeps."""
    import time

    urls = [
        f"https://h{i}.example.com/p{j}" for i in range(8) for j in range(3)
    ]

    def timed(url):
        return {
            "status": 200,
            "body": f"<html><body>{time.monotonic()}</body></html>".encode(),
        }

    df = spark.createDataFrame([(u,) for u in urls], ["url"]).coalesce(1)
    out = (
        MapFetcher(timed, concurrency=2, host_interval=0.3)
        .fetch(df)
        .select("url", "html")
        .collect()
    )
    stamps: dict[str, list[float]] = {}
    for r in out:
        stamps.setdefault(r["url"].split("/")[2], []).append(
            float(r["html"].split("<body>")[1].split("</body>")[0])
        )
    for host, ts in stamps.items():
        ts.sort()
        assert all(b - a >= 0.29 for a, b in zip(ts, ts[1:])), host
    # in-task span (first stamp -> last stamp, excluding Spark job
    # overhead): 8 hosts x two 0.3s gaps each, all overlapped ~= 0.6s;
    # the whole-group-per-worker shape serialized 4 waves of sleeping
    # groups ~= 2.4s
    allts = sorted(t for ts in stamps.values() for t in ts)
    assert allts[-1] - allts[0] < 1.5, allts[-1] - allts[0]


def test_crawl_plumbs_any_declared_interval_col_name(spark, sf_dir):
    """The fetch layout must carry the robots Crawl-delay under
    WHATEVER name the fetcher declares (host_interval_col is an API,
    not the literal string 'robots_crawl_delay'); results match the
    undeclared-fetcher crawl exactly."""
    from crawl4ai_spark.operators.robots import rules_table, synthetic_robots

    pages = generate_pages(spark, sf_dir).cache()
    seeds = [
        r["url"] for r in pages.select("url").orderBy("url").limit(3).collect()
    ]
    corpus = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }

    def fake_http(url):
        body = corpus.get(url)
        return {"status": 200, "body": body} if body else {"error": "miss"}

    # synthetic_robots takes SHORT names and appends .example.com
    hosts = sorted({u.split("/")[2].split(".")[0] for u in corpus})
    rules = rules_table(spark, synthetic_robots(hosts))
    base = _crawl_results(
        spark, pages,
        CrawlConfig(max_depth=2, robots_rules=rules,
                    fetcher=MapFetcher(fake_http)),
        seeds,
    )
    custom = _crawl_results(
        spark, pages,
        CrawlConfig(
            max_depth=2, robots_rules=rules,
            fetcher=MapFetcher(fake_http, host_interval_col="crawl_delay"),
        ),
        seeds,
    )
    assert base == custom and any(r[3] == "fetched" for r in base)


def test_alias_redirects_blocks_refetch_of_redirect_target(spark):
    """CrawlConfig(alias_redirects=True): a successful fetch that
    redirected to final_url also marks final_url as seen, so a later
    direct link to the target is not refetched; with the flag off
    (reference parity) the target is crawled as its own row."""
    S = "https://a.example/s.html"
    A = "https://a.example/a.html"
    B = "https://a.example/b.html"
    C = "https://a.example/c.html"
    bodies = {
        S: f'<html><body><a href="{A}">a</a> <a href="{C}">c</a></body></html>',
        B: "<html><body>target content</body></html>",
        C: f'<html><body><a href="{B}">b</a></body></html>',
    }

    def fn(url):
        if url == A:  # permanent redirect A -> B, serving B's content
            return {"status": 200, "body": bodies[B].encode(), "final_url": B}
        b = bodies.get(url)
        return {"status": 200, "body": b.encode()} if b else {"status": 404}

    pages = spark.createDataFrame([], "url string, html binary")

    def crawl(alias):
        wd = tempfile.mkdtemp(prefix="alias_redir_")
        shutil.rmtree(wd, ignore_errors=True)
        run_crawl(
            spark, pages, [S], wd,
            CrawlConfig(
                max_depth=3, fetcher=MapFetcher(fn), alias_redirects=alias,
            ),
            max_rounds=4,
        )
        rows = {
            r["url"]: r
            for r in spark.read.parquet(f"{wd}/results").collect()
        }
        shutil.rmtree(wd, ignore_errors=True)
        return rows

    off = crawl(False)
    assert off[A]["final_url"] == B and off[A]["success"]
    assert B in off, "parity mode must crawl the direct link to B"

    on = crawl(True)
    assert on[A]["final_url"] == B and on[A]["success"]
    assert B not in on, "aliased target must not be refetched"
    assert C in on  # the rest of the crawl is unaffected


def test_urllib_fetcher_conditional_requests(spark, http_base):
    """UrllibFetcher captures response validators (ETag/Last-Modified)
    and, with pass_cols declared, sends If-None-Match /
    If-Modified-Since — a match comes back 304 with a null body."""
    df = spark.createDataFrame(
        [
            (f"{http_base}/cond", None, None),
            (f"{http_base}/cond", '"v1"', None),
            (f"{http_base}/cond", None, "Wed, 01 Jan 2025 00:00:00 GMT"),
        ],
        "url string, if_none_match string, if_modified_since string",
    ).coalesce(1)
    out = UrllibFetcher(
        timeout=5.0, pass_cols=("if_none_match", "if_modified_since")
    ).fetch(df)
    rows = out.select(
        "if_none_match", "if_modified_since", "http_status", "html", "etag",
        "last_modified",
    ).collect()
    by = {(r["if_none_match"], r["if_modified_since"]): r for r in rows}
    full = by[(None, None)]
    assert full["http_status"] == 200 and "versioned" in full["html"]
    assert full["etag"] == '"v1"'
    assert full["last_modified"] == "Wed, 01 Jan 2025 00:00:00 GMT"
    for key in (('"v1"', None), (None, "Wed, 01 Jan 2025 00:00:00 GMT")):
        not_mod = by[key]
        assert not_mod["http_status"] == 304 and not_mod["html"] is None


def test_revisit_crawl_with_validators_gets_not_modified(spark):
    """The revisit loop: crawl once (results carry etag/last_modified),
    build url_validators from those results, crawl again — unchanged
    pages answer 304 -> fetch_status='not_modified' (no links, no
    politeness backoff), changed pages refetch normally."""
    A = "https://a.example/a.html"
    B = "https://a.example/b.html"
    bodies = {
        A: '<html><body>alpha <a href="b.html">b</a></body></html>',
        B: "<html><body>beta</body></html>",
    }
    changed = {"v": False}

    def make_fn(b_changed):
        def fn(url, extra=None):
            ver = {"A": "e-a1", "B": "e-b2" if b_changed else "e-b1"}[
                "A" if url == A else "B"
            ]
            if extra and extra.get("if_none_match") == ver:
                return {"status": 304, "etag": ver}
            return {
                "status": 200,
                "body": bodies[url].encode(),
                "etag": ver,
            }
        return fn

    pages = spark.createDataFrame([], "url string, html binary")

    def crawl(fn, validators=None):
        wd = tempfile.mkdtemp(prefix="revisit_")
        shutil.rmtree(wd, ignore_errors=True)
        run_crawl(
            spark, pages, [A], wd,
            CrawlConfig(
                max_depth=2,
                fetcher=MapFetcher(
                    fn, pass_cols=("if_none_match", "if_modified_since")
                ),
                url_validators=validators,
            ),
            max_rounds=3,
        )
        res = spark.read.parquet(f"{wd}/results")
        state = spark.read.parquet(f"{wd}/politeness/round=1")
        out = (
            {r["url"]: r for r in res.collect()},
            {r["host"]: r for r in state.collect()},
        )
        shutil.rmtree(wd, ignore_errors=True)
        return out

    first, _ = crawl(make_fn(False))
    assert first[A]["fetch_status"] == "fetched" and first[A]["etag"] == "e-a1"
    assert first[B]["etag"] == "e-b1"

    validators = spark.createDataFrame(
        [(u, first[u]["etag"], None) for u in (A, B)],
        "url string, if_none_match string, if_modified_since string",
    )

    # nothing changed: every revisit answers 304, no links follow
    revisit, state = crawl(make_fn(False), validators)
    assert revisit[A]["fetch_status"] == "not_modified"
    assert revisit[A]["success"] is False and revisit[A]["n_links"] == 0
    assert B not in revisit  # A's links were not re-extracted
    # 304 is a politeness success: the host must stay at the base delay
    assert state["a.example"]["fail_count"] == 0

    # B changed: A still 304s, B refetches with the new etag — but B is
    # only reachable through A's links, so seed both in the revisit
    validators2 = validators
    def crawl_two(fn, validators):
        wd = tempfile.mkdtemp(prefix="revisit2_")
        shutil.rmtree(wd, ignore_errors=True)
        run_crawl(
            spark, pages, [A, B], wd,
            CrawlConfig(
                max_depth=2,
                fetcher=MapFetcher(
                    fn, pass_cols=("if_none_match", "if_modified_since")
                ),
                url_validators=validators,
            ),
            max_rounds=2,
        )
        res = {r["url"]: r for r in spark.read.parquet(f"{wd}/results").collect()}
        shutil.rmtree(wd, ignore_errors=True)
        return res

    mixed = crawl_two(make_fn(True), validators2)
    assert mixed[A]["fetch_status"] == "not_modified"
    assert mixed[B]["fetch_status"] == "fetched"
    assert mixed[B]["etag"] == "e-b2" and mixed[B]["success"]


def test_rate_limit_codes_back_off_only_on_429_503(spark):
    """CrawlConfig(rate_limit_codes=(429, 503)) reproduces the
    reference RateLimiter exactly (async_dispatcher.py:63-80): a 429
    host backs off and counts failures; a 404 host DECAYS toward the
    base delay with fail_count 0 — while the default (None) config
    backs off any unsuccessful host."""
    H429 = "https://h429.example/x.html"
    H404 = "https://h404.example/x.html"
    OK = "https://hok.example/x.html"

    def fn(url):
        if "h429" in url:
            return {"status": 429, "body": None}
        if "h404" in url:
            return {"status": 404, "body": b"<html>gone</html>"}
        return {"status": 200, "body": b"<html>fine</html>"}

    pages = spark.createDataFrame([], "url string, html binary")

    def state_after(codes):
        wd = tempfile.mkdtemp(prefix="ratelimit_")
        shutil.rmtree(wd, ignore_errors=True)
        run_crawl(
            spark, pages, [H429, H404, OK], wd,
            CrawlConfig(
                max_depth=1, fetcher=MapFetcher(fn),
                rate_limit_codes=codes,
            ),
            max_rounds=1,
        )
        st = {
            r["host"]: r
            for r in spark.read.parquet(f"{wd}/politeness/round=1").collect()
        }
        shutil.rmtree(wd, ignore_errors=True)
        return st

    ref = state_after((429, 503))
    assert ref["h429.example"]["fail_count"] == 1
    assert ref["h429.example"]["current_delay"] > 1.0
    assert ref["h404.example"]["fail_count"] == 0  # 404 is NOT rate-limited
    assert ref["h404.example"]["current_delay"] == 1.0
    assert ref["hok.example"]["fail_count"] == 0

    legacy = state_after(None)
    assert legacy["h429.example"]["fail_count"] == 1
    assert legacy["h404.example"]["fail_count"] == 1  # conservative default
