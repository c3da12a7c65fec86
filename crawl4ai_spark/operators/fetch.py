"""Pluggable fetch stage: the seam between the frontier and page bytes.

The engine's default "fetch" is a lookup join against a pages table
(the 100 TB shape: bodies already live in WARC/parquet storage and the
crawl re-visits them). This module makes that seam explicit and
pluggable so the same crawl loop can run over a LIVE fetcher — the
semantics of the reference's AsyncHTTPCrawlerStrategy._handle_http
(async_crawler_strategy.py:2346-2419): GET with redirect following,
status code + response headers captured, charset from the
Content-Type header else sniffed from the bytes, tolerant decode,
connection failures surfaced as typed errors rather than lost rows.

Fetcher contract — ``fetch(df, url_col)`` returns ``df`` plus:

- ``html string``        decoded body (null on miss/error)
- ``http_status int``    response status (null when no response)
- ``final_url string``   post-redirect URL (reference: redirected_url)
- ``fetch_error string`` typed error label, null on success

Implementations:

- :class:`PagesJoinFetcher` — the default lookup join (zero Python).
- :class:`MapFetcher` — wraps a per-URL callable in ONE Arrow-batched
  mapInPandas; the callable runs on executors. Live fetchers declare
  ``host_exclusive = True``, which makes the frontier lay out the
  round's URLs by host ONLY (no hot-host salt): a host's URLs land in
  exactly one task, so per-host sequential fetching is polite by
  construction. The salt would spread one host over up to ``salt``
  concurrently-fetching tasks — fine for a lookup join, a
  crawl-delay/429 violation for real requests. The skew cost is
  nominal: a hot host can't be fetched faster than its politeness
  budget allows no matter how many tasks it spans, and in-task thread
  concurrency still overlaps OTHER hosts' waits.
- :class:`UrllibFetcher` — a real HTTP client over stdlib urllib
  (sandbox has no aiohttp): redirects, timeout, status capture incl.
  non-2xx bodies, header-charset-else-sniff decode via
  functions/encoding.py.

Dispatch happens in ``operators/frontier.py`` via
``CrawlConfig(fetcher=...)``; crawl-over-fetcher == crawl-over-join is
pinned by tests/test_fetch.py.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.encoding import decode_html
from ..session import ensure_runtime_confs

FETCH_FIELDS = (
    "body binary, http_status int, final_url string, "
    "_hdr_charset string, fetch_error string, "
    "etag string, last_modified string"
)


class PagesJoinFetcher:
    """Default fetcher: resolve bodies from a pages table (url, html).

    A left join — misses keep their frontier row with null html, the
    exact behavior the engine had when the join was inlined. The pages
    side is a parquet scan, so Catalyst prunes it to (url, html) and
    AQE picks broadcast vs shuffle by size.
    """

    host_exclusive = False  # no live requests -> salted layout is fine

    def __init__(self, pages: DataFrame, html_col: str = "html"):
        self.pages = pages
        self.html_col = html_col

    def fetch(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        right = self.pages.select(
            F.col(url_col),
            F.col(self.html_col).alias("html"),
        )
        # honor the contract's "html string — decoded body": a binary
        # pages column (WARC-sourced) goes through the engine's WHATWG
        # sniff+decode, same as MapFetcher's byte path — so downstream
        # sees one type regardless of fetcher choice
        if dict(right.dtypes)["html"] == "binary":
            ensure_runtime_confs(right.sparkSession)
            right = right.withColumn("html", decode_html("html"))
        hit = F.col("html").isNotNull()
        return (
            df.join(right, url_col, "left")
            .withColumn(
                "http_status", F.when(hit, F.lit(200)).cast("int")
            )
            .withColumn("final_url", F.col(url_col))
            .withColumn(
                "fetch_error",
                F.when(~hit, F.lit("miss")).cast("string"),
            )
            .withColumn("etag", F.lit(None).cast("string"))
            .withColumn("last_modified", F.lit(None).cast("string"))
        )


class MapFetcher:
    """Wrap a per-URL callable into a distributed fetch stage.

    ``fn(url) -> {"status": int, "body": bytes, "final_url": str,
    "charset": str | None}`` or raises — exceptions become
    ``fetch_error`` rows (``TypeName: message``), never task failures:
    one dead URL must not kill a 100k-URL task (the same degradation
    contract as parse_dom).

    Decoding stays JVM-side: the stage emits raw bytes plus the
    header-declared charset, and ``html`` is produced by
    functions/encoding.py — header charset when the server sent one
    (reference: ``response.charset``), WHATWG byte sniff otherwise
    (reference: chardet fallback).

    ``concurrency`` > 1 overlaps network waits WITHIN a task the way the
    reference's MemoryAdaptiveDispatcher overlaps sessions
    (async_dispatcher.py semaphore slots) — but politeness-shaped: URLs
    are grouped by host and each host's group is fetched SEQUENTIALLY by
    one pool thread, so per-host request spacing survives while distinct
    hosts proceed in parallel. A fetch task is network-bound, not
    CPU-bound; thread concurrency is the right lever and keeps the
    Arrow batch contract (rows come back in input order).

    ``host_interval`` adds the reference RateLimiter's base-delay
    semantics (async_dispatcher.py): a floor in seconds between
    request starts to the same host, enforced across the task's whole
    partition (stamps persist across Arrow batches). Combined with
    ``host_exclusive`` partitioning this is a true per-host rate
    limit, not a per-thread one.
    """

    host_exclusive = True  # live requests: a host must stay in ONE task

    def __init__(
        self,
        fn: Callable[[str], dict],
        concurrency: int = 1,
        host_interval: float = 0.0,
        host_interval_col: str | None = None,
        pass_cols: tuple = (),
    ):
        self.fn = fn
        self.concurrency = max(1, int(concurrency))
        # input columns forwarded to fn as a second dict argument —
        # fn(url, {col: value, ...}) — e.g. conditional-request
        # validators ("if_none_match", "if_modified_since") joined
        # into the fetch layout by CrawlConfig(url_validators=...).
        # The arity contract is fixed at CONSTRUCTION: with pass_cols
        # declared, fn always receives the second argument (None when
        # a frame lacks the columns — e.g. the robots.txt fetch) so a
        # two-positional-arg fn never TypeErrors into error rows on
        # one path while working on another. With pass_cols empty, fn
        # keeps its one-argument contract.
        self.pass_cols = tuple(pass_cols)
        # minimum seconds between request STARTS to the same host
        # within a task (the reference's RateLimiter base delay,
        # async_dispatcher.py) — host_exclusive partitioning makes this
        # a true per-host floor, since no other task shares the host
        self.host_interval = max(0.0, float(host_interval))
        # optional per-ROW delay column (e.g. the frontier's
        # robots_crawl_delay): the effective floor for a request is
        # max(host_interval, row value) — how a robots Crawl-delay
        # becomes actual request spacing, not just round budgeting.
        # The crawl loop keeps this column in the fetch layout when the
        # fetcher declares it (operators/frontier.py).
        self.host_interval_col = host_interval_col

    def fetch(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        import pandas as pd

        fn = self.fn
        concurrency = self.concurrency
        interval = self.host_interval
        icol = (
            self.host_interval_col
            if self.host_interval_col in (df.columns or [])
            else None
        )
        pcols = [c for c in self.pass_cols if c in (df.columns or [])]
        declared = bool(self.pass_cols)
        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        schema = f"{fields}, {FETCH_FIELDS}"

        def one(url, extra=None):
            try:
                r = fn(url, extra) if declared else fn(url)
                return (
                    r.get("body"),
                    r.get("status"),
                    r.get("final_url", url),
                    r.get("charset"),
                    r.get("error"),
                    r.get("etag"),
                    r.get("last_modified"),
                )
            except Exception as e:  # degradation contract
                return (
                    None, None, url, None,
                    f"{type(e).__name__}: {e}"[:500], None, None,
                )

        def host_of(u):
            from urllib.parse import urlsplit

            try:
                return urlsplit(u).netloc or ""
            except Exception:
                return ""

        def run_batch(urls, ivs, extras, last):
            import time

            def iv_of(j):
                iv = interval
                v = ivs[j] if ivs is not None else None
                if v is not None and v == v:  # skip None AND pandas NaN
                    try:
                        iv = max(iv, float(v))
                    except (TypeError, ValueError):
                        pass
                return iv

            def paced(j):
                u = urls[j]
                iv = iv_of(j)
                if iv > 0:
                    h = host_of(u)
                    prev = last.get(h)
                    # a host's FIRST request is never delayed — the
                    # stamp dict starts empty, and 0.0 is a real point
                    # on the monotonic axis, not "no previous request"
                    if prev is not None:
                        wait = prev + iv - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                    last[h] = time.monotonic()
                return one(u, extras[j] if extras else None)

            paced_at_all = interval > 0 or ivs is not None
            if concurrency <= 1 or len(urls) <= 1:
                return [
                    paced(j) if paced_at_all
                    else one(u, extras[j] if extras else None)
                    for j, u in enumerate(urls)
                ]

            from concurrent.futures import (
                FIRST_COMPLETED, ThreadPoolExecutor, wait as _fwait,
            )

            # deadline scheduler: per-host FIFO queues + next-allowed
            # stamps. Only the SCHEDULER sleeps; worker threads do
            # nothing but network I/O, so a long Crawl-delay on one
            # host never serializes unrelated hosts behind it (with
            # whole-group workers, hosts beyond `concurrency` queued
            # behind sleeping groups). A host stays sequential: at most
            # one of its requests is in flight, and its stamp is taken
            # at the ACTUAL request start inside the worker.
            queues: dict[str, list[int]] = {}
            for idx, u in enumerate(urls):
                queues.setdefault(host_of(u), []).append(idx)
            results: list[tuple | None] = [None] * len(urls)

            def started(j, h):
                last[h] = time.monotonic()
                return j, one(urls[j], extras[j] if extras else None)

            inflight: dict = {}  # future -> host
            busy: set[str] = set()
            with ThreadPoolExecutor(max_workers=concurrency) as ex:
                while queues or inflight:
                    now = time.monotonic()
                    next_due = None
                    for h in list(queues):
                        if h in busy:
                            continue
                        prev = last.get(h)
                        due = now if prev is None else prev + iv_of(
                            queues[h][0]
                        )
                        if due <= now:
                            j = queues[h].pop(0)
                            if not queues[h]:
                                del queues[h]
                            busy.add(h)
                            inflight[ex.submit(started, j, h)] = h
                        elif next_due is None or due < next_due:
                            next_due = due
                    if inflight:
                        timeout = (
                            None if next_due is None
                            else max(0.0, next_due - time.monotonic())
                        )
                        done, _ = _fwait(
                            set(inflight), timeout=timeout,
                            return_when=FIRST_COMPLETED,
                        )
                        for fut in done:
                            busy.discard(inflight.pop(fut))
                            j, r = fut.result()
                            results[j] = r
                    elif next_due is not None:
                        time.sleep(max(0.0, next_due - time.monotonic()))
            return results

        def run(batches):
            cols = (
                "body", "http_status", "final_url", "_hdr_charset",
                "fetch_error", "etag", "last_modified",
            )
            # per-host last-request-start stamps persist across the
            # task's Arrow batches, so the spacing floor holds over the
            # whole partition, not just within one batch
            last: dict[str, float] = {}
            for pdf in batches:
                ivs = list(pdf[icol]) if icol else None
                extras = None
                if pcols:
                    extras = [
                        {
                            c: (None if v is None or v != v else v)
                            for c, v in zip(pcols, vals)
                        }
                        for vals in zip(*(list(pdf[c]) for c in pcols))
                    ]
                rows = run_batch(list(pdf[url_col]), ivs, extras, last)
                pdf = pdf.copy()
                for j, k in enumerate(cols):
                    pdf[k] = pd.Series(
                        [r[j] for r in rows], index=pdf.index, dtype=object
                    )
                yield pdf

        raw = df.mapInPandas(run, schema)
        ensure_runtime_confs(df.sparkSession)
        body_ok = F.col("body").isNotNull()
        return (
            raw.withColumn(
                "html",
                F.when(
                    body_ok & F.col("_hdr_charset").isNotNull(),
                    decode_html("body", F.col("_hdr_charset")),
                ).when(body_ok, decode_html("body")),
            )
            .drop("body", "_hdr_charset")
        )


# per-python-worker opener cache for proxied requests (see
# UrllibFetcher._get); keyed by the proxy URL string
_PROXY_OPENERS: dict = {}


class UrllibFetcher(MapFetcher):
    """Live HTTP fetcher on stdlib urllib (GET, redirects followed,
    total timeout, UA header) mirroring the reference's aiohttp
    defaults. Non-2xx responses keep their status AND body (the
    reference raises HTTPStatusError; here the status column carries
    the signal and downstream decides — rows, not exceptions);
    connection/timeout failures become typed ``fetch_error`` labels
    (ConnectionTimeoutError / ConnectionError equivalents)."""

    def __init__(
        self,
        timeout: float = 30.0,
        user_agent: str = "crawl4ai-spark/1.0",
        max_body_bytes: int = 10 * 1024 * 1024,
        concurrency: int = 1,
        host_interval: float = 0.0,
        host_interval_col: str | None = None,
        pass_cols: tuple = (),
    ):
        self.timeout = float(timeout)
        self.user_agent = user_agent
        self.max_body_bytes = int(max_body_bytes)
        # proxy_server is always declared: rows carrying one (from
        # operators/proxy.assign_proxies or CrawlConfig(proxies=...))
        # route through that proxy; rows without it go direct. Cost of
        # declaring it on frames that lack the column is nil (extra
        # arrives as None).
        if "proxy_server" not in pass_cols:
            pass_cols = tuple(pass_cols) + ("proxy_server",)
        super().__init__(
            self._get,
            concurrency=concurrency,
            host_interval=host_interval,
            host_interval_col=host_interval_col,
            pass_cols=pass_cols,
        )

    @staticmethod
    def _charset_of(content_type: str | None) -> str | None:
        if not content_type:
            return None
        for part in content_type.split(";")[1:]:
            k, _, v = part.strip().partition("=")
            if k.strip().lower() == "charset" and v:
                return v.strip().strip("\"'").lower()
        return None

    def _get(self, url: str, extra: dict | None = None) -> dict:
        import urllib.error
        import urllib.request

        headers = {"User-Agent": self.user_agent}
        # conditional-request validators (RFC 9110 §13): declared via
        # pass_cols=("if_none_match", "if_modified_since") and joined
        # into the layout by CrawlConfig(url_validators=...); a 304
        # means "reuse your cached copy" and carries no body
        if extra:
            if extra.get("if_none_match"):
                headers["If-None-Match"] = str(extra["if_none_match"])
            if extra.get("if_modified_since"):
                headers["If-Modified-Since"] = str(extra["if_modified_since"])
        req = urllib.request.Request(url, headers=headers)
        # per-row proxy routing (reference rotation seam,
        # async_webcrawler.py:297-307): the assignment is a column —
        # operators/proxy.assign_proxies — so speculative re-execution
        # reuses the same proxy per URL. ProxyHandler consumes userinfo
        # credentials from the URL as Proxy-Authorization.
        proxy = extra.get("proxy_server") if extra else None
        if proxy:
            # one opener per proxy string, cached per python worker
            # (module-level: openers aren't picklable, and the fetcher
            # itself is serialized into the mapInPandas closure):
            # build_opener constructs the whole handler chain, and doing
            # that per request puts ~10 object constructions on the
            # executor hot path for nothing
            opener = _PROXY_OPENERS.get(proxy)
            if opener is None:
                opener = urllib.request.build_opener(
                    urllib.request.ProxyHandler(
                        {"http": str(proxy), "https": str(proxy)}
                    )
                )
                _PROXY_OPENERS[proxy] = opener
            open_ = lambda: opener.open(req, timeout=self.timeout)  # noqa: E731
        else:
            open_ = lambda: urllib.request.urlopen(  # noqa: E731
                req, timeout=self.timeout
            )
        try:
            with open_() as resp:
                body = resp.read(self.max_body_bytes)
                return {
                    "status": int(resp.status),
                    "body": body,
                    "final_url": resp.geturl(),
                    "charset": self._charset_of(
                        resp.headers.get("Content-Type")
                    ),
                    "etag": resp.headers.get("ETag"),
                    "last_modified": resp.headers.get("Last-Modified"),
                }
        except urllib.error.HTTPError as e:  # non-2xx WITH a response
            body = e.read(self.max_body_bytes) if e.fp else None
            return {
                "status": int(e.code),
                # 304 Not Modified has no representation — normalize
                # any empty probe read to a null body
                "body": None if int(e.code) == 304 else body,
                "final_url": e.geturl() or url,
                "charset": self._charset_of(e.headers.get("Content-Type")),
                "etag": e.headers.get("ETag"),
                "last_modified": e.headers.get("Last-Modified"),
            }
        except TimeoutError as e:
            return {"error": f"ConnectionTimeoutError: {e}"[:500]}
        except urllib.error.URLError as e:
            # urllib wraps connect-phase timeouts as
            # URLError(reason=socket.timeout) — keep the documented
            # timeout label for them instead of the generic one
            if isinstance(e.reason, TimeoutError) or (
                "timed out" in str(e.reason).lower()
            ):
                return {"error": f"ConnectionTimeoutError: {e.reason}"[:500]}
            return {"error": f"ConnectionError: {e.reason}"[:500]}


def fetch_status_expr(fetch_ok) -> F.Column:
    """The engine's fetch_status classification — the single source
    for the batch crawl loop and the streaming extract path:

    - ``fetched``       fetch_ok (body present, 2xx-or-unreported)
    - ``not_modified``  304: the conditional request succeeded and the
                        cached copy is valid (no body by design)
    - ``http_error``    the server ANSWERED non-2xx, with/without body
    - ``error``         a typed fetch_error (connection, timeout, ...)
    - ``miss``          never resolved (reserved for lookup misses)
    """
    return (
        F.when(fetch_ok, "fetched")
        .when(F.col("http_status") == 304, "not_modified")
        .when(
            F.col("http_status").isNotNull()
            & ~F.col("http_status").between(200, 299),
            "http_error",
        )
        .when(
            F.col("fetch_error").isNotNull() & (F.col("fetch_error") != "miss"),
            "error",
        )
        .otherwise("miss")
    )


def fetch_stage(
    df: DataFrame, fetcher=None, url_col: str = "url"
) -> DataFrame:
    """Run ``fetcher`` (an object with ``.fetch``, or a bare per-URL
    callable, or None for a no-op error column set) over ``df``.

    Columns the stage emits (``html``/``http_status``/``final_url``/
    ``fetch_error`` plus the internal ``body``/``_hdr_charset``) REPLACE
    any same-named input columns — re-fetching rows read back from a
    results table must not produce duplicate/ambiguous columns."""
    stale = [
        c
        for c in (
            "html", "http_status", "final_url", "fetch_error",
            "body", "_hdr_charset", "etag", "last_modified",
        )
        if c in df.columns
    ]
    if stale:
        df = df.drop(*stale)
    if fetcher is None:
        return (
            df.withColumn("html", F.lit(None).cast("string"))
            .withColumn("http_status", F.lit(None).cast("int"))
            .withColumn("final_url", F.col(url_col))
            .withColumn("etag", F.lit(None).cast("string"))
            .withColumn("last_modified", F.lit(None).cast("string"))
            .withColumn("fetch_error", F.lit("no fetcher configured"))
        )
    if callable(fetcher) and not hasattr(fetcher, "fetch"):
        fetcher = MapFetcher(fetcher)
    return fetcher.fetch(df, url_col)
