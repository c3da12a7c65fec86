"""Best-first / DFS traversal strategies and CacheMode gating tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
from crawl4ai_spark.synth import generate_pages, outlink_targets, page_url


def _langs(spark, sf_dir):
    return {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }


def test_best_first_batch_cap(spark, sf_dir, tmp_path):
    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    seeds = [page_url(d, langs[d]) for d in range(20)]
    cfg = CrawlConfig(
        max_depth=3, strategy="best_first", batch_size=10,
        round_seconds=1e6, keywords=("en",),
    )
    wd = str(tmp_path / "bff")
    ms = run_crawl(spark, pages, seeds, wd, cfg, max_rounds=3)
    for m in ms:
        assert m["selected"] <= 10  # every round capped at batch_size
    # the cap defers, not drops: deferred rows re-enter later rounds
    assert ms[0]["deferred"] == 10


def test_dfs_matches_recursive_simulator(spark, sf_dir, tmp_path):
    """DFS mode crawls one url per round in LIFO preorder; compare the
    crawl sequence against a recursive depth-first walk of the link
    graph with first-discovered-first order."""
    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    n_docs = 500
    seed_doc = 5
    seeds = [page_url(seed_doc, langs[seed_doc])]
    max_depth = 2
    rounds = 8

    cfg = CrawlConfig(max_depth=max_depth, strategy="dfs", round_seconds=1e6)
    wd = str(tmp_path / "dfs")
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=rounds)
    run = CrawlRun(spark, pages, wd, cfg)
    got = [
        r["url"]
        for r in run.results()
        .orderBy("round")
        .select("url", "round")
        .collect()
    ]

    # recursive reference: preorder DFS, visited-check at expansion time
    visited = set(seeds)
    order: list[str] = []

    def dfs(url: str, depth: int) -> None:
        if len(order) >= rounds:
            return
        order.append(url)
        if depth + 1 > max_depth:
            return
        doc = int(url.rsplit("/p", 1)[1].removesuffix(".html"))
        for t in outlink_targets(doc, n_docs):
            tu = page_url(t, langs[t])
            if tu not in visited:
                visited.add(tu)
                # engine dedups links per page first-seen AND keeps only
                # unvisited ones; recurse immediately (LIFO)
                if len(order) < rounds:
                    dfs(tu, depth + 1)

    dfs(seeds[0], 0)
    assert got == order[: len(got)]


def test_cache_modes(spark, sf_dir, tmp_path):
    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    seeds = [page_url(d, langs[d]) for d in range(8)]
    cache_path = str(tmp_path / "result_cache")

    # first crawl with ENABLED: all fetches, cache populated
    cfg1 = CrawlConfig(max_depth=1, round_seconds=1e6,
                       cache_mode="enabled", cache_path=cache_path)
    wd1 = str(tmp_path / "c1")
    run_crawl(spark, pages, seeds, wd1, cfg1, max_rounds=2)
    r1 = CrawlRun(spark, pages, wd1, cfg1).results()
    assert r1.filter("fetch_status = 'cache_hit'").count() == 0
    n_cached = spark.read.parquet(cache_path).count()
    assert n_cached == r1.filter("success").count()

    # second crawl, same seeds, ENABLED: round-0 urls all served from cache
    wd2 = str(tmp_path / "c2")
    run_crawl(spark, pages, seeds, wd2, cfg1, max_rounds=2)
    r2 = CrawlRun(spark, pages, wd2, cfg1).results()
    hits = r2.filter("fetch_status = 'cache_hit'")
    assert hits.count() == r2.count()  # every url was cached by crawl 1
    # cached rows still carry extraction output
    assert hits.filter(F.col("raw_markdown").isNotNull()).count() == hits.count()

    # BYPASS ignores the cache entirely
    cfg3 = CrawlConfig(max_depth=1, round_seconds=1e6,
                       cache_mode="bypass", cache_path=cache_path)
    wd3 = str(tmp_path / "c3")
    run_crawl(spark, pages, seeds, wd3, cfg3, max_rounds=1)
    r3 = CrawlRun(spark, pages, wd3, cfg3).results()
    assert r3.filter("fetch_status = 'cache_hit'").count() == 0
    assert spark.read.parquet(cache_path).count() == n_cached  # no writes

    # WRITE_ONLY: no reads, but new urls get appended
    extra_seeds = [page_url(d, langs[d]) for d in range(300, 304)]
    cfg4 = CrawlConfig(max_depth=0, round_seconds=1e6,
                       cache_mode="write_only", cache_path=cache_path)
    wd4 = str(tmp_path / "c4")
    run_crawl(spark, pages, extra_seeds, wd4, cfg4, max_rounds=1)
    assert spark.read.parquet(cache_path).count() > n_cached


def test_cache_results_equivalent_to_fetch(spark, sf_dir, tmp_path):
    """A cache-served crawl must produce identical extraction output to
    a fetched crawl (same urls, same markdown bytes)."""
    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    seeds = [page_url(42, langs[42])]
    cache_path = str(tmp_path / "cache")
    cfg = CrawlConfig(max_depth=1, round_seconds=1e6,
                      cache_mode="enabled", cache_path=cache_path)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    run_crawl(spark, pages, seeds, a, cfg, max_rounds=2)
    run_crawl(spark, pages, seeds, b, cfg, max_rounds=2)
    cols = ["url", "round", "depth", "success", "raw_markdown", "n_links"]
    ra = sorted(map(tuple, CrawlRun(spark, pages, a, cfg).results().select(cols).collect()))
    rb = sorted(map(tuple, CrawlRun(spark, pages, b, cfg).results().select(cols).collect()))
    assert ra == rb


def test_cache_hits_counted_separately_and_skip_politeness(
    spark, sf_dir, tmp_path
):
    """Cache hits never touched the host: the round manifest reports
    them as cache_hits (not selected/fetched_ok), and the politeness
    fold ignores them — a host's backoff state after a fully
    cache-served round is exactly its prior state decayed by the
    no-contact rule, never the success-decay path."""
    from crawl4ai_spark.operators.politeness import PolitenessState

    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    seeds = [page_url(d, langs[d]) for d in range(8)]
    cache_path = str(tmp_path / "cache")

    cfg = CrawlConfig(max_depth=0, round_seconds=1e6,
                      cache_mode="enabled", cache_path=cache_path)
    wd1 = str(tmp_path / "w1")
    m1 = run_crawl(spark, pages, seeds, wd1, cfg, max_rounds=1)
    assert m1[0]["cache_hits"] == 0
    n_fetched = m1[0]["selected"]
    assert n_fetched == len(seeds)

    # second crawl: every URL cache-served
    wd2 = str(tmp_path / "w2")
    m2 = run_crawl(spark, pages, seeds, wd2, cfg, max_rounds=1)
    assert m2[0]["cache_hits"] == len(seeds)
    assert m2[0]["selected"] == 0       # no real fetches
    assert m2[0]["fetched_ok"] == 0     # hits are not fetch successes
    # politeness saw ZERO contacts: a fully cache-served round folds
    # no host rows into the state (before the fix, every hit host
    # appeared as a successfully-contacted host)
    st = PolitenessState(spark, str(tmp_path / "w2")).load(1)
    assert st is None or st.count() == 0


def test_url_validators_duplicate_keys_do_not_fan_out(spark, sf_dir, tmp_path):
    """A validators table carrying the same URL twice must not
    duplicate fetches/result rows (keys collapse deterministically)."""
    pages = generate_pages(spark, sf_dir)
    langs = _langs(spark, sf_dir)
    seeds = [page_url(d, langs[d]) for d in range(5)]
    # two validator rows per seed URL with different etags
    v = spark.createDataFrame(
        [(u, f'"e{i}"', None) for u in seeds for i in range(2)],
        "url string, if_none_match string, if_modified_since string",
    )
    cfg = CrawlConfig(max_depth=0, round_seconds=1e6, url_validators=v)
    wd = str(tmp_path / "wv")
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=1)
    res = CrawlRun(spark, pages, wd, cfg).results()
    assert res.count() == len(seeds)
    assert res.select("url_hash").distinct().count() == len(seeds)
