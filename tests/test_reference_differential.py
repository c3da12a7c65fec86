"""LIVE differentials against the reference deep-crawl code.

The north rule asks for "matching the reference's crawl ordering and
URL-seen set under the same seed list". Rounds 1-3 evidenced that with
a hand-written simulator; these tests run the reference's OWN strategy
code (deep_crawling/{bfs,dfs,bff}_strategy.py, filters.py, scorers.py)
in a throwaway subprocess (tests/ref_frontier_runner.py — stubbed
third-party imports, untouched test-process sys.modules) over the SAME
link graph the Spark engine crawls, and compare directly.

Documented reference quirks pinned here (each with a file:line cite):
- BFS batch mode never adds the start URL to `visited`
  (bfs_strategy.py:150-156 seeds current_level but only link_discovery
  populates visited) — a page linking back to the seed re-crawls it at
  depth>0. The engine's url_seen includes seeds, so it fetches once.
- DFS batch/stream mode crawls ONLY the start URL: the inherited BFS
  link_discovery marks every discovered link visited at discovery time
  (bfs_strategy.py:121 `visited.add(base_url)`), and the DFS pop-check
  (dfs_strategy.py:32-35 `if url in visited ... continue`) then skips
  all of them. The engine's DFS implements the documented intent
  ("traverse URLs in DFS order") — LIFO preorder via dfs_key — which
  tests/test_strategies_cache.py pins against a recursive walk.
- Best-first's asyncio.PriorityQueue of (score, depth, url, parent) is
  a MIN-heap over raw scorer output (bff_strategy.py:146-151, 211) —
  the reference crawls the LOWEST-scoring URL first despite the
  docstring's "higher-value pages are crawled first". The engine crawls
  priority-DESC (the documented intent); the differential negates the
  reference scorer so both mean "most relevant first".
- BFS max_pages overshoots: _pages_crawled updates once per level
  (bfs_strategy.py:168-174) and link_discovery trims per PAGE at the
  same remaining capacity, so a level with several parents can admit
  more than the budget. The engine's cap is exact
  (frontier.py T2: global orderBy+limit on the remaining budget).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.catalog import _docs, _url1
from crawl4ai_spark.functions.scrape import scrape_stage
from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
from crawl4ai_spark.synth import generate_pages, page_url

RUNNER = __file__.rsplit("/", 1)[0] + "/ref_frontier_runner.py"

# absent reference tree -> skip the module (nothing to differential
# against); present-but-unloadable must FAIL loudly in _reference(),
# never skip silently (the round-3 lesson from the markdown golden)
if not os.path.isdir("/root/reference/crawl4ai"):
    pytest.skip(
        "reference tree not present", allow_module_level=True
    )


def _reference(spec: dict) -> dict:
    p = subprocess.run(
        [sys.executable, RUNNER],
        input=json.dumps(spec),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, f"reference runner failed:\n{p.stderr[-3000:]}"
    return json.loads(p.stdout)


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


@pytest.fixture(scope="module")
def link_graph(corpus):
    """The exact per-page link lists the engine's extract stage emits,
    as the reference mock crawler's closed world."""
    pages, _ = corpus
    rows = scrape_stage(pages.select("url", "html")).select("url", "links").collect()
    graph = {}
    for r in rows:
        internal = [lk["href"] for lk in r["links"] if lk["is_internal"]]
        external = [lk["href"] for lk in r["links"] if not lk["is_internal"]]
        graph[r["url"]] = {"internal": internal, "external": external}
    return graph


def _engine_results(spark, pages, seed, cfg, max_rounds, wd):
    run_crawl(spark, pages, [seed], wd, cfg, max_rounds=max_rounds)
    run = CrawlRun(spark, pages, wd, cfg)
    rows = (
        run.results()
        .select(
            "url", "url_hash", "round", "depth", "parent_url_hash",
            "priority", "success", "fetch_status",
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def _first_occurrence(ref_results):
    """Reference results deduped by first crawl of each url."""
    first = {}
    dups = []
    for r in ref_results:
        if r["url"] in first:
            dups.append(r)
        else:
            first[r["url"]] = r
    return first, dups


def test_bfs_corpus_matches_reference_live(spark, corpus, link_graph, tmp_path):
    """Whole-corpus BFS: per-depth visited sets, depths, and parent
    validity must match the reference strategy run live."""
    pages, langs = corpus
    seed = page_url(0, langs[0])
    max_depth = 3

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "bfs",
            "seed": seed,
            "graph": link_graph,
            "max_depth": max_depth,
        }
    )["results"]
    first, dups = _first_occurrence(ref)

    # reference quirk: the ONLY re-crawled url can be the seed
    # (bfs_strategy.py:150-156 — seed never enters `visited`)
    assert {d["url"] for d in dups} <= {seed}

    cfg = CrawlConfig(max_depth=max_depth, round_seconds=1e6)
    eng = _engine_results(
        spark, pages, seed, cfg, max_depth + 1, str(tmp_path / "bfs")
    )

    # 1. identical URL-seen set
    assert {r["url"] for r in eng} == set(first)

    # 2. identical depths, and engine round == BFS depth
    eng_by_url = {r["url"]: r for r in eng}
    for url, rr in first.items():
        er = eng_by_url[url]
        assert er["depth"] == rr["depth"], url
        assert er["round"] == rr["depth"], url

    # 3. per-depth sets identical
    for d in range(max_depth + 1):
        want = {u for u, rr in first.items() if rr["depth"] == d}
        got = {r["url"] for r in eng if r["round"] == d}
        assert got == want, f"depth {d}"

    # 4. parent validity: the engine's parent is a depth-1-shallower
    #    page that links to the child (reference picks the first
    #    discoverer in level order; the engine's tie-break is the
    #    lowest parent hash — both are valid discoverers)
    hash_to_url = {r["url_hash"]: r["url"] for r in eng}
    single_parent_exact = 0
    for r in eng:
        if r["parent_url_hash"] is None:
            assert r["url"] == seed
            continue
        parent = hash_to_url[r["parent_url_hash"]]
        assert eng_by_url[parent]["depth"] == r["depth"] - 1, r["url"]
        assert r["url"] in link_graph[parent]["internal"], r["url"]
        # where only one crawled page of the shallower depth links to
        # the child, parent attribution must match the reference exactly
        discoverers = [
            u
            for u, rr in first.items()
            if rr["depth"] == r["depth"] - 1
            and r["url"] in link_graph.get(u, {"internal": []})["internal"]
        ]
        if len(discoverers) == 1:
            assert parent == first[r["url"]]["parent"], r["url"]
            single_parent_exact += 1
    assert single_parent_exact > 0  # the check above actually ran


def test_bfs_scorer_threshold_matches_reference_live(
    spark, corpus, link_graph, tmp_path
):
    """Keyword scoring + score_threshold: the reference skips
    score < threshold (bfs_strategy.py:116-121); the engine keeps
    priority >= threshold (frontier.py). Same admitted sets."""
    pages, langs = corpus
    seed = page_url(0, langs[0])
    keywords = ["en", "p1"]
    threshold = 0.5

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "bfs",
            "seed": seed,
            "graph": link_graph,
            "max_depth": 2,
            "keywords": keywords,
            "score_threshold": threshold,
        }
    )["results"]
    first, dups = _first_occurrence(ref)
    assert {d["url"] for d in dups} <= {seed}

    cfg = CrawlConfig(
        max_depth=2,
        round_seconds=1e6,
        keywords=tuple(keywords),
        score_threshold=threshold,
    )
    eng = _engine_results(spark, pages, seed, cfg, 3, str(tmp_path / "thr"))

    assert {r["url"] for r in eng} == set(first)
    eng_by_url = {r["url"]: r for r in eng}
    for url, rr in first.items():
        assert eng_by_url[url]["depth"] == rr["depth"], url
    # the threshold actually cut something (the test isn't vacuous)
    unfiltered = _reference(
        {
            "cmd": "crawl",
            "strategy": "bfs",
            "seed": seed,
            "graph": link_graph,
            "max_depth": 2,
        }
    )["results"]
    assert len({r["url"] for r in unfiltered}) > len(first)


def test_reference_dfs_is_seed_only_engine_implements_intent(
    spark, corpus, link_graph, tmp_path
):
    """Pin the reference DFS bug live: inherited link_discovery marks
    links visited at discovery (bfs_strategy.py:121), the DFS pop-check
    (dfs_strategy.py:32-35) then skips them all — batch DFS returns the
    seed alone. The engine's DFS follows the documented LIFO intent."""
    pages, langs = corpus
    seed = page_url(0, langs[0])

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "dfs",
            "seed": seed,
            "graph": link_graph,
            "max_depth": 3,
        }
    )["results"]
    assert [r["url"] for r in ref] == [seed]  # the bug, live

    # the engine's DFS (one url per round, preorder) visits beyond the
    # seed — intent over bug; preorder parity is pinned against a
    # recursive walk in tests/test_strategies_cache.py
    cfg = CrawlConfig(max_depth=2, round_seconds=1e6, strategy="dfs")
    eng = _engine_results(spark, pages, seed, cfg, 6, str(tmp_path / "dfs"))
    assert len({r["url"] for r in eng}) > 1


def test_best_first_order_matches_reference_live(spark, corpus, link_graph, tmp_path):
    """Best-first, batch_size=1: the engine's per-round top-priority
    pick must replay the reference's priority-queue pop order (scorer
    negated on the reference side — its min-heap pops lowest raw score
    first, bff_strategy.py:146-151)."""
    pages, langs = corpus
    seed = page_url(0, langs[0])
    keywords = ["p1", "p2", "en"]
    n_rounds = 12

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "best_first",
            "seed": seed,
            "graph": link_graph,
            "max_depth": 3,
            "keywords": keywords,
            "negate_scorer": True,
            "batch_size": 1,
        }
    )["results"]
    # uncapped reference run (max_pages would change WHAT gets queued
    # near the cap: bff link_discovery trims candidates in discovery
    # order, bff_strategy.py:118-122); compare the first n_rounds pops
    ref_order = [r["url"] for r in ref][:n_rounds]

    cfg = CrawlConfig(
        max_depth=3,
        round_seconds=1e6,
        keywords=tuple(keywords),
        strategy="best_first",
        batch_size=1,
    )
    eng = _engine_results(spark, pages, seed, cfg, n_rounds, str(tmp_path / "bff"))
    eng_order = [r["url"] for r in sorted(eng, key=lambda r: r["round"])]

    assert eng_order[: len(ref_order)] == ref_order


def _micro_pages(spark, graph: dict):
    """Render a hand-crafted link graph as a (url, html) pages table."""
    rows = [
        (
            u,
            "<html><head><title>t</title></head><body>"
            + "".join(f'<a href="{h}">x</a>' for h in hrefs)
            + "</body></html>",
        )
        for u, hrefs in graph.items()
    ]
    return spark.createDataFrame(rows, "url string, html string").withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(1700000000))
    )


def _micro_graph_spec(spark, graph: dict) -> dict:
    """The reference-side view of the same micro graph: the hrefs as
    the engine's extract stage emits them (base-resolved, classified)."""
    df = scrape_stage(_micro_pages(spark, graph).select("url", "html"))
    out = {}
    for r in df.select("url", "links").collect():
        out[r["url"]] = {
            "internal": [lk["href"] for lk in r["links"] if lk["is_internal"]],
            "external": [lk["href"] for lk in r["links"] if not lk["is_internal"]],
        }
    return out


def test_max_pages_binding_matches_reference_live(spark, tmp_path):
    """Capacity binding at a single-parent level with distinct scores:
    the reference trims discoveries to max_pages - pages_crawled sorted
    score-desc (bfs_strategy.py:124-131); the engine's T2 global
    orderBy(priority desc).limit(remaining) picks the same set."""
    S = "https://m.example.com/seed.html"
    kws = ["k1", "k2", "k3", "k4", "k5"]
    children = [
        "https://m.example.com/k1-k2-k3-k4-k5.html",  # score 1.0
        "https://m.example.com/k1-k2-k3-k4.html",     # 0.8
        "https://m.example.com/k1-k2-k3.html",        # 0.6
        "https://m.example.com/k1-k2.html",           # 0.4
        "https://m.example.com/k1.html",              # 0.2
        "https://m.example.com/none.html",            # 0.0
    ]
    graph = {S: children, **{c: [] for c in children}}
    spec_graph = _micro_graph_spec(spark, graph)

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "bfs",
            "seed": S,
            "graph": spec_graph,
            "max_depth": 2,
            "keywords": kws,
            "max_pages": 4,
        }
    )["results"]
    ref_set = {r["url"] for r in ref}
    assert ref_set == {S, children[0], children[1], children[2]}

    pages = _micro_pages(spark, graph)
    cfg = CrawlConfig(
        max_depth=2, round_seconds=1e6, keywords=tuple(kws), max_pages=4
    )
    eng = _engine_results(spark, pages, S, cfg, 3, str(tmp_path / "cap"))
    assert {r["url"] for r in eng} == ref_set


def test_max_pages_overshoot_divergence_pinned(spark, tmp_path):
    """DOCUMENTED DIVERGENCE, both sides pinned live: the reference's
    _pages_crawled updates once per level and link_discovery trims per
    PAGE at the same remaining capacity (bfs_strategy.py:88-96,
    168-174), so two parents discovering one child each overshoot
    max_pages=4 to five crawled pages. The engine's global cap is
    exact: four."""
    S = "https://m.example.com/seed.html"
    A = "https://m.example.com/a.html"
    B = "https://m.example.com/b.html"
    a_kids = [f"https://m.example.com/a{i}.html" for i in range(3)]
    b_kids = [f"https://m.example.com/b{i}.html" for i in range(3)]
    graph = {S: [A, B], A: a_kids, B: b_kids}
    for leaf in a_kids + b_kids:
        graph[leaf] = []
    spec_graph = _micro_graph_spec(spark, graph)

    ref = _reference(
        {
            "cmd": "crawl",
            "strategy": "bfs",
            "seed": S,
            "graph": spec_graph,
            "max_depth": 3,
            "max_pages": 4,
        }
    )["results"]
    ref_urls = [r["url"] for r in ref]
    # reference: level0 = S (1), level1 = A,B (3), level2 trims each
    # parent to remaining=1 SEPARATELY -> crawls BOTH survivors = 5
    assert len(ref_urls) == 5
    assert set(ref_urls[:3]) == {S, A, B}

    pages = _micro_pages(spark, graph)
    cfg = CrawlConfig(max_depth=3, round_seconds=1e6, max_pages=4)
    eng = _engine_results(spark, pages, S, cfg, 4, str(tmp_path / "over"))
    eng_urls = {r["url"] for r in eng}
    assert len(eng_urls) == 4  # exact budget — no overshoot
    assert {S, A, B} <= eng_urls


def test_scorers_match_reference_live(spark, sf_dir):
    """Every URL scorer vs the reference scorer classes, value-exact at
    6 decimals over 500 synthetic URLs (the url_scoring gate entry's
    inputs)."""
    from crawl4ai_spark.operators.scorers import (
        composite_score,
        domain_authority_score,
        freshness_score,
        keyword_relevance_score,
        path_depth_score,
    )

    df = _docs(spark, sf_dir).withColumn("url", _url1())
    kw = keyword_relevance_score("url", ["www", "html", "pdf"])
    pd_ = path_depth_score("url", optimal_depth=3)
    auth = domain_authority_score(
        "url", {"src1.example.com": 0.9}, default_weight=0.5
    )
    url2 = F.concat(
        F.lit("https://news.example.com/blog/"),
        (F.lit(2018) + F.col("doc_id") % 9).cast("string"),
        F.lit("/x.html"),
    )
    rows = (
        df.select(
            "url",
            F.round(kw, 6).alias("kw"),
            F.round(pd_, 6).alias("pd"),
            F.round(auth, 6).alias("auth"),
            F.round(composite_score([kw, pd_, auth]), 6).alias("comp"),
            url2.alias("url2"),
            F.round(freshness_score(url2, current_year=2024), 6).alias("fresh"),
        )
        .orderBy("url")
        .collect()
    )
    urls = [r["url"] for r in rows]
    urls2 = [r["url2"] for r in rows]

    auth_params = {
        "domain_weights": {"src1.example.com": 0.9},
        "default_weight": 0.5,
    }
    ref = _reference(
        {
            "cmd": "scorers",
            "urls": urls,
            "scorers": [
                {
                    "name": "kw",
                    "kind": "KeywordRelevanceScorer",
                    "params": {"keywords": ["www", "html", "pdf"]},
                },
                {
                    "name": "pd",
                    "kind": "PathDepthScorer",
                    "params": {"optimal_depth": 3},
                },
                {
                    "name": "auth",
                    "kind": "DomainAuthorityScorer",
                    "params": auth_params,
                },
                {
                    "name": "comp",
                    "kind": "CompositeScorer",
                    "params": {
                        "scorers": [
                            {
                                "kind": "KeywordRelevanceScorer",
                                "params": {"keywords": ["www", "html", "pdf"]},
                            },
                            {
                                "kind": "PathDepthScorer",
                                "params": {"optimal_depth": 3},
                            },
                            {
                                "kind": "DomainAuthorityScorer",
                                "params": auth_params,
                            },
                        ]
                    },
                },
            ],
        }
    )
    ref_fresh = _reference(
        {
            "cmd": "scorers",
            "urls": urls2,
            "scorers": [
                {
                    "name": "fresh",
                    "kind": "FreshnessScorer",
                    "params": {"current_year": 2024},
                }
            ],
        }
    )
    for name in ("kw", "pd", "auth", "comp"):
        got = [float(r[name]) for r in rows]
        assert got == pytest.approx(ref[name], abs=2e-6), name
    assert [float(r["fresh"]) for r in rows] == pytest.approx(
        ref_fresh["fresh"], abs=2e-6
    )


def test_scorer_edges_match_reference_live(spark):
    """ContentTypeScorer plus freshness/path-depth edge shapes vs the
    reference scorers live: full-date urls, query/fragment/path-param
    extensions, deep and empty paths."""
    from crawl4ai_spark.operators.scorers import (
        content_type_score,
        freshness_score,
        path_depth_score,
    )

    urls = [
        "https://e.com/a/2023/05/14/post.html",
        "https://e.com/x-2021-12-31.php",
        "https://e.com/y_2019_01_02/z",
        "https://e.com/multi/2018/and/2024/picks",
        "https://e.com/nodate/page",
        "https://e.com/q.php?id=1",
        "https://e.com/doc.pdf#page=2",
        "https://e.com/img.jpg;width=100",
        "https://e.com/",
        "https://e.com/a/b/c/d/e/f",
        "https://e.com/blog/roundup.HTML",
        "https://e.com/archive.tar.gz",
    ]
    weights = {".html$": 1.0, ".pdf$": 0.8, ".php$": 0.6, "blog": 0.5}
    rows = (
        spark.createDataFrame([(u,) for u in urls], "u string")
        .select(
            "u",
            F.round(content_type_score("u", weights), 6).alias("ct"),
            F.round(freshness_score("u", current_year=2024), 6).alias("fr"),
            F.round(path_depth_score("u", optimal_depth=2), 6).alias("pd"),
        )
        .collect()
    )
    by_url = {r["u"]: r for r in rows}
    ref = _reference(
        {
            "cmd": "scorers",
            "urls": urls,
            "scorers": [
                {
                    "name": "ct",
                    "kind": "ContentTypeScorer",
                    "params": {"type_weights": weights},
                },
                {
                    "name": "fr",
                    "kind": "FreshnessScorer",
                    "params": {"current_year": 2024},
                },
                {
                    "name": "pd",
                    "kind": "PathDepthScorer",
                    "params": {"optimal_depth": 2},
                },
            ],
        }
    )
    for name in ("ct", "fr", "pd"):
        got = [float(by_url[u][name]) for u in urls]
        assert got == pytest.approx(ref[name], abs=2e-6), (
            name,
            list(zip(urls, got, ref[name])),
        )


def test_bfs_include_external_matches_reference_live(spark, tmp_path):
    """include_external=True follows cross-host links in both engines
    identically (J5/F13 externality at the frontier seam)."""
    A = "https://alpha.example.com/a.html"
    B = "https://alpha.example.com/b.html"
    X = "https://beta.other.org/x.html"
    Y = "https://beta.other.org/y.html"
    graph = {A: [B, X], B: [Y], X: [Y], Y: []}
    spec_graph = _micro_graph_spec(spark, graph)
    # sanity: the cross-host links really are classified external
    assert X in spec_graph[A]["external"]

    for include_external, expect in ((False, {A, B}), (True, {A, B, X, Y})):
        ref = _reference(
            {
                "cmd": "crawl",
                "strategy": "bfs",
                "seed": A,
                "graph": spec_graph,
                "max_depth": 3,
                "include_external": include_external,
            }
        )["results"]
        first, _ = _first_occurrence(ref)
        assert set(first) == expect, include_external

        pages = _micro_pages(spark, graph)
        cfg = CrawlConfig(
            max_depth=3, round_seconds=1e6, include_external=include_external
        )
        eng = _engine_results(
            spark, pages, A, cfg, 4, str(tmp_path / f"ext{include_external}")
        )
        assert {r["url"] for r in eng} == set(first), include_external
        eng_by = {r["url"]: r for r in eng}
        for url, rr in first.items():
            assert eng_by[url]["depth"] == rr["depth"], url


def test_adaptive_metrics_match_reference_live(spark, sf_dir):
    """coverage/consistency/saturation/confidence (A5-A8) vs the
    reference StatisticalStrategy driven live over the same documents.
    One document per round makes the engine's per-round saturation
    equal the reference's per-document new_terms_history."""
    from crawl4ai_spark.operators.relevance import confidence

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 12)
        .orderBy("doc_id")
    )
    # append a doc whose every token is <= 2 chars: its adaptive term
    # set is EMPTY, so the reference excludes its pairs from the
    # consistency denominator — the exact edge a review found the
    # engine mishandling
    empty_tok = spark.createDataFrame(
        [(999, "a b c of at up")], "doc_id long, text string"
    )
    docs = docs.unionByName(empty_tok)
    rows = docs.orderBy("doc_id").collect()
    query = "spark data"

    ref = _reference(
        {
            "cmd": "adaptive",
            "query": query,
            "docs": [{"url": f"u{r['doc_id']}", "text": r["text"]} for r in rows],
        }
    )

    eng = confidence(
        docs.withColumn("round", F.col("doc_id")), "text", "doc_id", "round", query
    ).first()
    for name in ("coverage", "consistency", "saturation", "confidence"):
        assert eng[name] == pytest.approx(ref[name], abs=1e-9), name

    # the per-round first-seen counts ARE the reference's history here
    assert ref["saturation"] > 0  # not vacuous: decay actually happened


def test_chunkers_match_reference_live(spark, sf_dir):
    """The four nltk-free chunkers (X5) vs the reference chunking
    strategies run live — list-exact per text, including the
    edge semantics (short text returns the ORIGINAL string verbatim in
    the windowed chunkers, not rejoined words)."""
    from crawl4ai_spark.functions.chunking import (
        fixed_word_chunks,
        identity_chunks,
        overlapping_window_chunks,
        regex_chunks,
        sliding_word_chunks,
    )

    base = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .orderBy("doc_id")
        .select("text")
        .collect()
    ]
    texts = []
    for i, t in enumerate(base):
        words = t.split(" ")
        # re-join with paragraph breaks so RegexChunking has work to do
        texts.append(
            "\n\n".join(
                " ".join(words[j : j + 7]) for j in range(0, len(words), 7)
            )
        )
        if i % 3 == 0:
            texts.append(" ".join(words[:5]))  # shorter than any window
    texts += ["", "word", "two  spaces", "trail ", " lead"]

    specs = [
        ("identity", "IdentityChunking", {}, identity_chunks("text")),
        ("regex", "RegexChunking", {}, regex_chunks("text")),
        (
            "fixed",
            "FixedLengthWordChunking",
            {"chunk_size": 25},
            fixed_word_chunks("text", chunk_size=25),
        ),
        (
            "sliding",
            "SlidingWindowChunking",
            {"window_size": 30, "step": 15},
            sliding_word_chunks("text", window_size=30, step=15),
        ),
        (
            "overlap",
            "OverlappingWindowChunking",
            {"window_size": 40, "overlap": 10},
            overlapping_window_chunks("text", window_size=40, overlap=10),
        ),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id", *[col.alias(name) for name, _, _, col in specs]
    ).orderBy("id").collect()
    ref = _reference(
        {
            "cmd": "chunk",
            "texts": texts,
            "chunkers": [
                {"name": name, "kind": kind, "params": params}
                for name, kind, params, _ in specs
            ],
        }
    )
    for name, _, _, _ in specs:
        for i, r in enumerate(rows):
            assert list(r[name]) == ref[name][i], f"{name} text#{i}: {texts[i][:60]!r}"


def test_bfs_random_graphs_match_reference_live(spark, tmp_path):
    """Randomized equivalence: deterministic pseudo-random micro-graphs
    (varying fan-out, cross links, back edges, dead ends) crawled by
    both engines; visited set, depths, and per-level sets must agree
    after dropping the reference's seed-re-crawl quirk rows."""
    import random

    for seed_no in range(3):
        rng = random.Random(1000 + seed_no)
        n = rng.randint(10, 16)
        urls = [f"https://g{seed_no}.example.com/n{i}.html" for i in range(n)]
        graph = {}
        for i, u in enumerate(urls):
            fanout = rng.randint(0, 4)
            targets = rng.sample(range(n), min(fanout, n))
            graph[u] = [urls[t] for t in targets if t != i]
        spec_graph = _micro_graph_spec(spark, graph)

        ref = _reference(
            {
                "cmd": "crawl",
                "strategy": "bfs",
                "seed": urls[0],
                "graph": spec_graph,
                "max_depth": 3,
            }
        )["results"]
        first, dups = _first_occurrence(ref)
        assert {d["url"] for d in dups} <= {urls[0]}

        pages = _micro_pages(spark, graph)
        cfg = CrawlConfig(max_depth=3, round_seconds=1e6)
        eng = _engine_results(
            spark, pages, urls[0], cfg, 4, str(tmp_path / f"rg{seed_no}")
        )
        assert {r["url"] for r in eng} == set(first), seed_no
        eng_by_url = {r["url"]: r for r in eng}
        for url, rr in first.items():
            assert eng_by_url[url]["depth"] == rr["depth"], (seed_no, url)
            assert eng_by_url[url]["round"] == rr["depth"], (seed_no, url)


def test_coverage_gaps_match_reference_live(spark, sf_dir):
    """Embedding-adaptive coverage gaps vs the reference
    EmbeddingStrategy.find_coverage_gaps over real embedding vectors
    from the embeddings table, value-exact at 1e-6 — including the
    empty-KB all-gaps-1.0 branch."""
    from crawl4ai_spark.operators.adaptive_embedding import coverage_gaps

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(24)
        .collect()
    )
    vecs = [list(map(float, r["embedding"])) for r in emb]
    kb_vecs, q_vecs = vecs[:16], vecs[16:]

    q_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(q_vecs)],
        "query_id long, embedding array<double>",
    )
    kb_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(kb_vecs)],
        "kb_id long, embedding array<double>",
    )
    got = {
        r["query_id"]: float(r["gap"])
        for r in coverage_gaps(kb_df, q_df).collect()
    }
    ref = _reference({"cmd": "coverage_gaps", "kb": kb_vecs, "queries": q_vecs})[
        "out"
    ]
    assert [got[i] for i in range(len(q_vecs))] == pytest.approx(ref, abs=1e-6)

    got_empty = {
        r["query_id"]: float(r["gap"]) for r in coverage_gaps(None, q_df).collect()
    }
    ref_empty = _reference(
        {"cmd": "coverage_gaps", "kb": [], "queries": q_vecs}
    )["out"]
    assert [got_empty[i] for i in range(len(q_vecs))] == pytest.approx(
        ref_empty, abs=1e-12
    )


def test_rate_limiter_backoff_matches_reference_live(spark):
    """W2 backoff math vs the reference RateLimiter run live with its
    jitter pinned: per-status delay and fail-count trajectories must
    match the engine's update_state fold (one request per round,
    jitter_value=1.0), and the drop point (fail_count > max_retries)
    must align with the reference's keep=False."""
    from crawl4ai_spark.operators.politeness import (
        BASE_DELAY,
        MAX_RETRIES,
        update_state,
    )

    rate_codes = (429, 503)
    sequences = [
        [429, 429, 200, 503, 200, 200, 429],
        [200, 200, 200],
        [429, 429, 429, 429],  # runs past max_retries
        [503, 200, 503, 200, 503, 200],
    ]
    ref = _reference(
        {
            "cmd": "rate_limiter",
            "cases": [
                {
                    "statuses": seq,
                    "base_delay": (BASE_DELAY, BASE_DELAY),
                    "rate_limit_codes": list(rate_codes),
                }
                for seq in sequences
            ],
        }
    )["out"]

    for seq, want in zip(sequences, ref):
        state = None
        for i, (status, w) in enumerate(zip(seq, want)):
            results = spark.createDataFrame(
                [("h.example.com", status not in rate_codes)],
                "host string, success boolean",
            )
            state = update_state(state, results, i, jitter_value=1.0)
            row = state.first()
            # the reference stops updating the delay once the domain is
            # dropped (update_delay returns False before touching it);
            # fail_count and the drop decision must still align
            if w["keep"]:
                assert row["current_delay"] == pytest.approx(
                    w["delay"], abs=1e-9
                ), (seq, i)
                assert row["fail_count"] == w["fail_count"], (seq, i)
            assert (row["fail_count"] <= MAX_RETRIES) == w["keep"], (seq, i)


def test_nonsense_filter_matches_reference_live(spark):
    """The seeder's nonsense-URL filter (F9) vs the reference's
    _is_nonsense_url driven live over a grid spanning every rule
    family (robots/sitemaps, utility files, hidden segments,
    non-content paths, print params, short paths, and keepers)."""
    from crawl4ai_spark.sources.seeder import is_nonsense_url

    urls = [
        "https://x.com/robots.txt",
        "https://x.com/sitemap.xml",
        "https://x.com/sitemap_index.xml",
        "https://x.com/sitemap-news.xml",
        "https://x.com/deep/robots.txt",
        "https://x.com/ads.txt",
        "https://x.com/humans.txt",
        "https://x.com/.well-known/security.txt",
        "https://x.com/favicon.ico",
        "https://x.com/apple-touch-icon.png",
        "https://x.com/manifest.json",
        "https://x.com/browserconfig.xml",
        "https://x.com/.hidden/page",
        "https://x.com/a/.git/config",
        "https://x.com/wp-admin/options.php",
        "https://x.com/wp-includes/js/x.js",
        "https://x.com/wp-content/uploads/img.png",
        "https://x.com/cgi-bin/script",
        "https://x.com/article?print=1",
        "https://x.com/article?a=1&print=true",
        "https://x.com/page.html",
        "https://x.com/blog/2024/post-title",
        "https://x.com/api/v1/data",
        "https://x.com/style.css?v=2",
        "https://x.com/",
        "https://x.com",
        "https://x.com/a",
        "https://x.com/index.php",
        "https://x.com/feed.xml",
        "https://x.com/atom.xml",
        "https://x.com/crossdomain.xml",
    ]
    ref = _reference({"cmd": "nonsense", "urls": urls})["out"]
    got = [
        bool(r["n"])
        for r in spark.createDataFrame([(u,) for u in urls], "u string")
        .select(is_nonsense_url("u").alias("n"))
        .collect()
    ]
    for u, g, w in zip(urls, got, ref):
        assert g == w, f"{u}: engine={g} reference={w}"


def test_url_helpers_match_reference_live(spark):
    """get_base_domain (F12) / is_external (F13) / clean_tokens (X12)
    vs the reference's pure utils helpers, value-exact over a grid of
    multi-level TLDs, ports, IPs, and noisy token lists."""
    from crawl4ai_spark.functions.content_filter import clean_tokens
    from crawl4ai_spark.functions.urls import base_domain, is_external

    urls = [
        "https://www.example.com/a",
        "https://sub.deep.example.co.uk/b?q=1",
        "http://example.com.au:8080/c",
        "https://bbc.co.uk/",
        "https://localhost/x",
        "https://192.168.0.1:81/admin",
        "https://a.b.c.d.example.org.uk/z",
        "ftp://files.example.net/pub",
        "https://example.ac.jp/x",
        "https://single",
        "",
    ]
    pairs = [
        ["https://www.example.com/a", "example.com"],
        ["https://blog.example.com/a", "example.com"],
        ["https://evil.com/example.com", "example.com"],
        ["https://example.co.uk/a", "example.com"],
        ["/relative/path", "example.com"],
        ["https://example.com:444/a", "example.com"],
    ]
    token_lists = [
        ["the", "spark", "engine", "up", "of", "↑top", "runs", "at", "scale"],
        ["a", "an", "ab", "abc", "ccp", "▲x", "⬆️y", "normal"],
        [],
    ]
    ref = _reference(
        {
            "cmd": "url_helpers",
            "base_domain_urls": urls,
            "external_pairs": pairs,
            "token_lists": token_lists,
        }
    )

    got_bd = [
        # Column null is the engine's spelling of the reference's ""
        # (no-host urls); values must otherwise be byte-equal
        r["bd"] if r["bd"] is not None else ""
        for r in spark.createDataFrame([(u,) for u in urls], "u string")
        .select(base_domain("u").alias("bd"))
        .collect()
    ]
    assert got_bd == ref["base_domain"]

    ext_df = spark.createDataFrame(pairs, "u string, b string")
    got_ext = [
        bool(r["e"])
        for r in ext_df.select(is_external("u", F.col("b")).alias("e")).collect()
    ]
    assert got_ext == ref["is_external"]

    assert [clean_tokens(ts) for ts in token_lists] == ref["clean_tokens"]


def test_merge_chunks_matches_reference_live():
    """The LLM stage's section packer vs the reference merge_chunks
    (utils.py:162-224), list-exact over a deterministic grid of docs,
    budgets, overlaps, and token ratios — including the zero-estimate
    doc-drop quirk and the unbounded final chunk."""
    from crawl4ai_spark.functions.llm_stub import merge_chunks

    docsets = [
        [f"w{i} " * (i % 7 + 1) for i in range(9)],
        ["one two three"] * 10,
        ["a b c d e", "f g h i j", "k l m n o"],
        ["single"],
        ["", "only real words here", ""],
        ["x " * 50, "y", "z " * 3],
    ]
    cases = [
        {
            "docs": [d.strip() for d in ds],
            "target_size": ts,
            "overlap": ov,
            "word_token_ratio": r,
        }
        for ds in docsets
        for ts in (4, 10, 512)
        for ov in (0, 2)
        for r in (1.0, 1.3, 0.5)
    ]
    ref = _reference({"cmd": "merge_chunks", "cases": cases})["out"]
    for case, want in zip(cases, ref):
        got = merge_chunks(
            case["docs"],
            case["target_size"],
            overlap=case["overlap"],
            word_token_ratio=case["word_token_ratio"],
        )
        assert got == want, case


def test_head_filters_match_reference_live(spark):
    """ContentRelevanceFilter (F5) + SEOFilter (F6) vs the reference
    filters run live over synthesized head fragments. Decision ladders
    across threshold grids pin the scores to ladder resolution and the
    >= decision semantics, without duplicating the scoring here."""
    from crawl4ai_spark.functions.headpeek import (
        content_relevance_score,
        seo_score,
    )

    good_title = "Spark Data Engineering Guide For Production Teams!"  # 50 chars
    desc_150 = ("spark data pipelines at scale " * 5).strip()[:150]
    heads = [
        (
            "https://ex.example.com/guide/spark",
            f"<head><title>{good_title}</title>"
            f'<meta name="description" content="{desc_150}">'
            '<meta name="keywords" content="spark data">'
            '<script type="application/ld+json">{}</script></head>',
        ),
        (
            "https://ex.example.com/blog_post/2024?id=9",
            "<head><title>tiny</title>"
            '<meta name="robots" content="noindex,follow">'
            '<meta name="canonical" content="https://ex.example.com/other"></head>',
        ),
        (
            "https://ex.example.com/a",
            "<head><title>Spark spark SPARK data overview page here now</title>"
            '<meta property="og:description" content="spark everywhere">'
            '<meta name="canonical" content="https://ex.example.com/a"></head>',
        ),
        (
            "https://ex.example.com/" + "p" * 90,
            "<head></head>",
        ),
        (
            "https://ex.example.com/q",
            '<head><title>Data & Spark — the "quoted" title exists</title>'
            '<meta name="description" content="short desc">'
            '<meta name="description" content="'
            + ("d" * 145)
            + '"></head>',
        ),
    ]
    query = "spark data"
    keywords = ["spark", "data"]
    rel_ts = [round(0.2 * i, 2) for i in range(16)]
    seo_ts = [round(0.05 * i, 2) for i in range(21)]

    ref = _reference(
        {
            "cmd": "head_filters",
            "cases": [
                {
                    "url": u,
                    "head": h,
                    "query": query,
                    "keywords": keywords,
                    "relevance_thresholds": rel_ts,
                    "seo_thresholds": seo_ts,
                }
                for u, h in heads
            ],
        }
    )["out"]

    df = spark.createDataFrame(heads, "url string, head string")
    rows = df.select(
        "url",
        content_relevance_score("head", query).alias("rel"),
        seo_score("head", "url", keywords=keywords).alias("seo"),
    ).collect()
    by_url = {r["url"]: r for r in rows}
    for (u, _), want in zip(heads, ref):
        r = by_url[u]
        got_rel = [bool(r["rel"] >= t) for t in rel_ts]
        got_seo = [bool(r["seo"] >= t) for t in seo_ts]
        assert got_rel == want["relevance"], (u, r["rel"])
        assert got_seo == want["seo"], (u, r["seo"])


def _robots_engine_decisions(spark, body, urls, ua="*"):
    from crawl4ai_spark.operators.robots import rules_table, with_robots_decision

    host = urls[0].split("/")[2]
    rules = rules_table(spark, {host: body}, ua=ua)
    frontier = spark.createDataFrame(
        [(u, host) for u in urls], "url string, host string"
    )
    rows = (
        with_robots_decision(frontier, rules)
        .select("url", "robots_allowed")
        .collect()
    )
    by_url = {r["url"]: bool(r["robots_allowed"]) for r in rows}
    return [by_url[u] for u in urls]


def test_robots_decisions_match_reference_live(spark):
    """S12 vs the reference RobotsParser run live. The engine is RFC
    9309 (wildcards, $-anchors, longest-match); the reference wraps
    stdlib RobotFileParser. On the plain-prefix grammar they must agree
    url-for-url; the two documented divergences (robots.py docstrings)
    are pinned in their exact direction rather than silently allowed:
    stdlib percent-quotes '$' so $-anchored rules never match, and
    stdlib takes the FIRST matching rule in file order where RFC takes
    the longest match."""
    D = "agree.example.com"
    agree_cases = [
        {
            "domain": D,
            "body": "User-agent: *\nDisallow: /private/\nAllow: /pub/\n",
            "urls": [
                f"https://{D}/",
                f"https://{D}/private/x.html",
                f"https://{D}/private/",
                f"https://{D}/pub/y",
                f"https://{D}/other",
                f"https://{D}/privateer",
            ],
        },
        {
            # specific rule listed first: first-match == longest-match
            "domain": D,
            "body": "User-agent: *\nAllow: /private/public\nDisallow: /private/\n",
            "urls": [
                f"https://{D}/private/public/x",
                f"https://{D}/private/secret",
                f"https://{D}/private/publicity",
            ],
        },
        {
            # specific UA group + fallback star group
            "domain": D,
            "body": (
                "User-agent: testbot\nDisallow: /bot-only/\n\n"
                "User-agent: *\nDisallow: /everyone/\n"
            ),
            "urls": [
                f"https://{D}/bot-only/x",
                f"https://{D}/everyone/x",
                f"https://{D}/free",
            ],
            "ua": "testbot",
        },
        {
            "domain": D,
            "body": "# comments only\n",
            "urls": [f"https://{D}/anything"],
        },
        {
            "domain": D,
            "body": "User-agent: *\nCrawl-delay: 2\nDisallow: /slow/\n",
            "urls": [f"https://{D}/slow/x", f"https://{D}/fast"],
        },
    ]
    ref = _reference({"cmd": "robots", "cases": agree_cases})["out"]
    for case, want in zip(agree_cases, ref):
        got = _robots_engine_decisions(
            spark, case["body"], case["urls"], case.get("ua", "*")
        )
        assert got == want, case["body"]

    # documented divergence 1: $-anchored rule (RFC matches, stdlib
    # quoted it away)
    dollar = {
        "domain": D,
        "body": "User-agent: *\nDisallow: /*.pdf$\n",
        "urls": [f"https://{D}/doc.pdf", f"https://{D}/doc.pdfx"],
    }
    ref_d = _reference({"cmd": "robots", "cases": [dollar]})["out"][0]
    got_d = _robots_engine_decisions(spark, dollar["body"], dollar["urls"])
    assert ref_d == [True, True]  # stdlib: rule never matches
    assert got_d == [False, True]  # RFC: anchored match blocks .pdf only

    # documented divergence 2: rule-order vs longest-match (disallow
    # listed first shadows the longer allow in stdlib)
    order = {
        "domain": D,
        "body": "User-agent: *\nDisallow: /private/\nAllow: /private/public\n",
        "urls": [f"https://{D}/private/public/x", f"https://{D}/private/z"],
    }
    ref_o = _reference({"cmd": "robots", "cases": [order]})["out"][0]
    got_o = _robots_engine_decisions(spark, order["body"], order["urls"])
    assert ref_o == [False, False]  # stdlib: first match (disallow) wins
    assert got_o == [True, False]  # RFC: longest match (allow) wins

    # documented divergence 3: user-agent GROUP selection — stdlib
    # takes the first group whose token is a substring of the UA in
    # file order; RFC 9309 takes the most specific (longest) token
    groups = {
        "domain": D,
        "body": (
            "User-agent: test\nDisallow: /short/\n\n"
            "User-agent: testbot\nDisallow: /long/\n"
        ),
        "urls": [f"https://{D}/short/x", f"https://{D}/long/x"],
        "ua": "testbot",
    }
    ref_g = _reference({"cmd": "robots", "cases": [groups]})["out"][0]
    got_g = _robots_engine_decisions(
        spark, groups["body"], groups["urls"], ua="testbot"
    )
    assert ref_g == [False, True]  # stdlib: 'test' group (file order)
    assert got_g == [True, False]  # RFC: 'testbot' group (most specific)


def test_regex_entities_match_reference_live(spark, sf_dir):
    """All 21 built-in entity patterns (X7) vs the reference
    RegexExtractionStrategy run live — per-label ordered match lists
    must be identical (Java vs Python regex engines agree on this
    catalog over ASCII text; that agreement is exactly what this
    pins)."""
    from crawl4ai_spark.functions.entities import DEFAULT_PATTERNS, extract_entities

    base = [
        r["text"][:160]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .orderBy("doc_id")
        .select("text")
        .collect()
    ]
    soup = [
        "mail First.Last+tag@sub.domain.co.uk or x@y.io now",
        "call +44 (0)20 7946-0958 or (555) 123 4567 today",
        "see https://a.example.com/p?q=1&r=2#frag, then http://b.io/x.",
        "hosts 10.0.0.1 and 255.255.255.255 and 999.1.1.1",
        "v6 2001:0DB8:85A3:0000:0000:8A2E:0370:7334 ok",
        "id 123e4567-e89b-12d3-a456-426614174000 done",
        "pay USD 1,299.99 or €5 or £12.50 or RM 3.20",
        "rates 12.5% and 100% and 0.01%",
        "big 1,234,567.89 and 12 345 678 and 1.234",
        "due 2024-03-01 or 3/14/24 or 12/31/1999",
        "at 09:30 or 23:59:59 or 7:05.30",
        "zip 90210-1234 and 10001, uk SW1A 1AA and m1 1ae",
        "color #FF00ff and #abcdef now",
        "ping @jack and @a_very_long_handle_x #rust-lang #2024",
        "mac 00:1A:2b:3C:4d:5E up",
        "iban GB82WEST12345698765432 and DE89370400440532013000",
        "cards 4111111111111111 5500005555555559 378282246310005 6011000990139424",
    ]
    texts = base + soup + ["", "no entities here at all"]

    ref = _reference({"cmd": "regex_extract", "texts": texts})["out"]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = extract_entities(df, "text", id_cols=["id"]).collect()
    got = {}
    for r in rows:
        got.setdefault((r["id"], r["label"]), []).append(r["value"])
    want = {}
    for i, matches_ in enumerate(ref):
        for m in matches_:
            want.setdefault((i, m["label"]), []).append(m["value"])
    # per (text, label): identical ordered match lists
    assert got == want
    # not vacuous: every pattern label matched somewhere
    assert {k[1] for k in want} == set(DEFAULT_PATTERNS)


def test_client_hints_match_reference_live(spark):
    """Sec-CH-UA derivation (X14) vs the reference's
    UAGen.generate_client_hints over the engine's generated UA spread
    plus handwritten browser shapes."""
    from crawl4ai_spark.functions.user_agent import client_hints, user_agent

    df = spark.range(40).select(F.col("id").cast("int").alias("i"))
    combos = [
        {},
        {"device_type": "mobile"},
        {"browser_type": "chrome"},
        {"browser_type": "edge"},
        {"browser_type": "firefox"},
    ]
    uas = []
    for kw in combos:
        uas += [
            r["ua"]
            for r in df.select(user_agent("i", **kw).alias("ua")).collect()
        ]
    uas += [
        "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Version/16.5 Safari/605.1.15",
        "Mozilla/5.0 (X11) Gecko/20100101 Firefox/119.0",
        "nonsense without any browser token",
    ]
    got = [
        r["h"]
        for r in spark.createDataFrame([(u,) for u in uas], "ua string")
        .select(client_hints("ua").alias("h"))
        .collect()
    ]
    ref = _reference({"cmd": "client_hints", "uas": uas})["out"]
    assert got == ref


def test_canonicalize_matches_reference_normalize_live():
    """canonicalize_url vs the reference's extended normalize_url
    (utils.py:2120-2204) — byte-exact over handwritten edge cases plus
    a deterministic generated grid. No Spark needed: the UDF wraps this
    scalar."""
    import itertools

    from crawl4ai_spark.functions.urls import canonicalize_url

    base = "https://WWW.Example.com/base/dir/page.html"
    hand = [
        "x.html",
        "../up.html",
        "./same.html",
        "/rooted/path/",
        "//other.example.com/proto/relative",
        "HTTPS://UPPER.EXAMPLE.COM/Case/Path",
        "a%20b/c d.html",
        "?b=2&A=1&utm_source=t&FBCLID=x",
        "?ref=abc&real=1&ref_src=t",
        "q.html?one=1&one=2&empty=",
        "frag.html#section-2",
        "#inpage",
        "x.html?gclid=1&utm_term=z&utm_content=c&utm_campaign=q&utm_medium=m",
        "/double//slash///path",
        "tel.html?z=26&y=25&x=24&w=23",
        "",
    ]
    gen = [
        f"{'../' * up}p{i}{ext}?{q}"
        for up, i, ext, q in itertools.product(
            range(3),
            range(4),
            (".html", "/", ""),
            ("a=1", "B=2&a=1", "utm_source=x&k=v", ""),
        )
    ]
    pairs = [[h, base] for h in hand + gen]
    ref = _reference({"cmd": "normalize", "pairs": pairs})["out"]
    for (h, b), want in zip(pairs, ref):
        got = canonicalize_url(h, b)
        if want == "<error:TypeError>" and h == "":
            # both decline empty hrefs (reference returns None)
            assert got is None
            continue
        assert got == want, f"href={h!r}: got {got!r} want {want!r}"


def test_filters_match_reference_live(spark, sf_dir):
    """URLPatternFilter / ContentTypeFilter / DomainFilter vs the
    reference filter classes over 500 synthetic URLs (the url_filters
    gate entry's inputs)."""
    from crawl4ai_spark.operators.filters import (
        content_type_filter,
        domain_filter,
        url_pattern_filter,
    )

    df = _docs(spark, sf_dir).withColumn("url", _url1())
    rows = (
        df.select(
            "url",
            url_pattern_filter("url", ["*.html"]).alias("f_html"),
            url_pattern_filter("url", ["*.html"], reverse=True).alias("f_not_html"),
            # multi-star '*.'-prefixed glob: reference categorizes PATH
            # (its DOMAIN branch needs '://'), translated via fnmatch
            url_pattern_filter("url", ["*.example.com/p1*.html"]).alias("f_glob"),
            content_type_filter("url", ["text"]).alias("f_text"),
            content_type_filter("url", ["image"]).alias("f_image"),
            domain_filter(
                "url",
                allowed_domains=["example.com"],
                blocked_domains=["src0.example.com"],
            ).alias("f_dom"),
        )
        .orderBy("url")
        .collect()
    )
    urls = [r["url"] for r in rows]
    ref = _reference(
        {
            "cmd": "filters",
            "urls": urls,
            "filters": [
                {
                    "name": "f_html",
                    "kind": "URLPatternFilter",
                    "params": {"patterns": ["*.html"]},
                },
                {
                    "name": "f_not_html",
                    "kind": "URLPatternFilter",
                    "params": {"patterns": ["*.html"], "reverse": True},
                },
                {
                    "name": "f_glob",
                    "kind": "URLPatternFilter",
                    "params": {"patterns": ["*.example.com/p1*.html"]},
                },
                {
                    "name": "f_text",
                    "kind": "ContentTypeFilter",
                    "params": {"allowed_types": ["text"]},
                },
                {
                    "name": "f_image",
                    "kind": "ContentTypeFilter",
                    "params": {"allowed_types": ["image"]},
                },
                {
                    "name": "f_dom",
                    "kind": "DomainFilter",
                    "params": {
                        "allowed_domains": ["example.com"],
                        "blocked_domains": ["src0.example.com"],
                    },
                },
            ],
        }
    )
    for name in ("f_html", "f_not_html", "f_glob", "f_text", "f_image", "f_dom"):
        got = [bool(r[name]) for r in rows]
        assert got == ref[name], name


def test_filter_chain_stats_match_reference_live(spark, sf_dir):
    """FilterChain decisions + FilterStats counters (F1/A1) vs the
    reference chain run live over the gate inputs. For all-sync member
    filters the reference's rejected counter is one per rejected url,
    so (total, passed, rejected) maps onto the engine's one-pass
    aggregation exactly."""
    from crawl4ai_spark.operators.filters import (
        content_type_filter,
        domain_filter,
        filter_chain,
        url_pattern_filter,
    )

    df = _docs(spark, sf_dir).withColumn("url", _url1())
    chain_col = filter_chain(
        url_pattern_filter("url", ["*.html"]),
        content_type_filter("url", ["text"]),
        domain_filter(
            "url",
            allowed_domains=["example.com"],
            blocked_domains=["src0.example.com"],
        ),
    )
    rows = df.select("url", chain_col.alias("c")).orderBy("url").collect()
    urls = [r["url"] for r in rows]
    ref = _reference(
        {
            "cmd": "filters",
            "urls": urls,
            "filters": [],
            "chain": [
                {"kind": "URLPatternFilter", "params": {"patterns": ["*.html"]}},
                {
                    "kind": "ContentTypeFilter",
                    "params": {"allowed_types": ["text"]},
                },
                {
                    "kind": "DomainFilter",
                    "params": {
                        "allowed_domains": ["example.com"],
                        "blocked_domains": ["src0.example.com"],
                    },
                },
            ],
        }
    )
    got = [bool(r["c"]) for r in rows]
    assert got == ref["chain"]
    stats = ref["chain_stats"]
    assert stats["total"] == len(urls)
    assert stats["passed"] == sum(got)
    assert stats["rejected"] == len(urls) - sum(got)


def test_scrape_helpers_and_knob_constants_match_reference_live():
    """parse_srcset/parse_dimension value-exact vs the reference
    (content_scraping_strategy.py:42-71) over an edge battery, and the
    r5 ScrapeOptions knob defaults pinned against the reference's
    config.py constants — the scrape stage itself cannot run live
    (lxml/bs4 absent), but every constant and pure helper it shares
    with this engine can."""
    from crawl4ai_spark.functions.html_tools import (
        parse_dimension,
        parse_srcset,
    )
    from crawl4ai_spark.functions.scrape import (
        IMAGE_DESCRIPTION_MIN_WORD_THRESHOLD,
        IMAGE_SCORE_THRESHOLD,
        IMPORTANT_ATTRS,
        ONLY_TEXT_ELIGIBLE_TAGS,
        SOCIAL_MEDIA_DOMAINS,
    )

    srcsets = [
        "a.jpg 480w, b.jpg 800w",
        "a.jpg 480w, b.jpg",              # width-less variant
        " c.png 2x , d.png 100w",         # density descriptor is NOT a width
        "e.jpg 480.5w",                   # fractional width truncates
        "",                               # empty -> []
        "  ,  , f.gif",                   # blank parts skipped
        "g.webp 1024w 2x extra tokens",   # extra tokens ignored
    ]
    dims = ["480px", "50%", "12em", "300", "x300", ""]
    ref = _reference(
        {"cmd": "scrape_helpers", "srcsets": srcsets, "dims": dims}
    )
    assert [parse_srcset(s) for s in srcsets] == ref["srcset"]
    assert [list(parse_dimension(d)) for d in dims] == ref["dimension"]

    c = ref["constants"]
    assert IMAGE_SCORE_THRESHOLD == c["IMAGE_SCORE_THRESHOLD"]
    assert (
        IMAGE_DESCRIPTION_MIN_WORD_THRESHOLD
        == c["IMAGE_DESCRIPTION_MIN_WORD_THRESHOLD"]
    )
    assert sorted(IMPORTANT_ATTRS) == c["IMPORTANT_ATTRS"]
    assert sorted(ONLY_TEXT_ELIGIBLE_TAGS) == c["ONLY_TEXT_ELIGIBLE_TAGS"]
    assert sorted(SOCIAL_MEDIA_DOMAINS) == c["SOCIAL_MEDIA_DOMAINS"]
    # the reference's always-on empty-element prune threshold: our
    # word_count_threshold=1 documents itself as that behavior
    assert c["MIN_WORD_THRESHOLD"] == 1


def test_link_scoring_matches_reference_live(spark):
    """page_terms / is_docs_site / link_intrinsic_score /
    total_link_score — the engine's pure-Column link scoring
    (functions/link_scoring.py) value-exact against the reference's
    extract_page_context + calculate_link_intrinsic_score +
    calculate_total_score (utils.py:3078-3283), every rule family
    exercised: attribute quality (title/class/rel), url structure
    (good/medium/bad paths, depth, https), text quality (length, word
    count, generic), contextual term overlap, docs-site bonus, and the
    total-score fallback chain."""
    from crawl4ai_spark.functions.link_scoring import (
        is_docs_site,
        link_intrinsic_score,
        page_terms,
        total_link_score,
    )

    links = [
        # attribute rules
        {"text": "Install Guide", "url": "https://ex.com/docs/install",
         "title_attr": "long title", "class_attr": "nav-primary",
         "rel_attr": "canonical"},
        {"text": "buy now!", "url": "http://ex.com/cart/item",
         "title_attr": "abc", "class_attr": "ad-banner promo",
         "rel_attr": "nofollow sponsored"},
        # url structure: medium path, deep path, shallow path
        {"text": "a post about spark tuning", "url": "https://ex.com/blog/2024/05/01/deep/post",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
        {"text": "", "url": "https://ex.com/a",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
        # generic text penalty + single word
        {"text": "click here", "url": "https://ex.com/x/y",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
        {"text": "here", "url": "https://ex.com/x",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
        # contextual overlap with page terms (punctuation-stripped)
        {"text": "Spark tuning reference!", "url": "https://ex.com/guide/perf",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
        # four-word text bonus
        {"text": "one two three four", "url": "https://ex.com/p",
         "title_attr": "", "class_attr": "", "rel_attr": ""},
    ]
    pages = [
        {"title": "Spark Tuning, Guide!", "headlines": "Performance (tuning) tips",
         "meta": "A guide; to tuning.", "base_url": "https://docs.ex.com/base",
         "links": links},
        {"title": "", "headlines": "", "meta": "",
         "base_url": "https://www.shop.com/", "links": links},
    ]
    totals = [
        {"intrinsic": 7.0, "contextual": 0.4, "enabled": True, "query": True},
        {"intrinsic": 7.0, "contextual": None, "enabled": True, "query": True},
        {"intrinsic": 12.0, "contextual": None, "enabled": True, "query": False},
        {"intrinsic": None, "contextual": 0.9, "enabled": True, "query": True},
        {"intrinsic": 3.0, "contextual": 2.0, "enabled": True, "query": True},
        {"intrinsic": 9.0, "contextual": 0.5, "enabled": False, "query": True},
    ]
    ref = _reference({"cmd": "link_scoring", "pages": pages, "totals": totals})

    rows = [
        (p["title"], p["headlines"], p["meta"], p["base_url"],
         l["text"], l["url"], l["title_attr"], l["class_attr"], l["rel_attr"],
         pi, li)
        for pi, p in enumerate(pages)
        for li, l in enumerate(p["links"])
    ]
    df = spark.createDataFrame(
        rows,
        "title string, headlines string, meta string, base_url string, "
        "text string, url string, title_attr string, class_attr string, "
        "rel_attr string, pi int, li int",
    )
    got = (
        df.select(
            "pi", "li",
            page_terms("title", "headlines", "meta").alias("terms"),
            is_docs_site("base_url").alias("docs"),
            F.round(
                link_intrinsic_score(
                    F.col("text"), F.col("url"), F.col("title_attr"),
                    F.col("class_attr"), F.col("rel_attr"),
                    page_terms("title", "headlines", "meta"),
                    is_docs_site("base_url"),
                ),
                9,
            ).alias("score"),
        )
        .collect()
    )
    for r in got:
        want_page = ref["pages"][r["pi"]]
        assert sorted(r["terms"]) == want_page["terms"], (r["pi"], r["terms"])
        assert r["docs"] == want_page["is_docs_site"]
        assert abs(r["score"] - want_page["scores"][r["li"]]) < 1e-9, (
            r["pi"], r["li"], r["score"], want_page["scores"][r["li"]],
        )

    tdf = spark.createDataFrame(
        [(i, t["intrinsic"], t["contextual"]) for i, t in enumerate(totals)],
        "i int, intrinsic double, contextual double",
    )
    for i, t in enumerate(totals):
        got_t = (
            tdf.filter(F.col("i") == i)
            .select(
                F.round(
                    total_link_score(
                        F.col("intrinsic"),
                        None if t["contextual"] is None else F.col("contextual"),
                        score_links_enabled=t["enabled"],
                        query_provided=t["query"],
                    ),
                    9,
                ).alias("s")
            )
            .collect()[0]["s"]
        )
        assert abs(got_t - ref["totals"][i]) < 1e-9, (i, got_t, ref["totals"][i])


def test_llm_text_helpers_match_reference_live():
    """split_and_parse_json_objects / sanitize_html /
    sanitize_input_encode / escape_json_string / extract_xml_data —
    the pure helpers the LLM extraction+filter stages rest on —
    value-exact against the live reference (utils.py:707-822,
    :1688-1718)."""
    from crawl4ai_spark.functions.html_tools import (
        escape_json_string,
        sanitize_input_encode,
    )
    from crawl4ai_spark.functions.llm_adapter import (
        split_and_parse_json_objects,
    )
    from crawl4ai_spark.functions.llm_stub import (
        _sanitize_html_for_prompt,
        extract_xml_data,
    )

    jsons = [
        '[{"x": 1}, {"y": 2}]',
        'prose {"a": 1} mid {"b": } end {"c": {"d": 4}}',
        "no objects at all",
        "{unclosed",
        '[{"x": 1}, broken]',
        "",
    ]
    htmls = [
        '<a href="x" title=\'y\'>both "quote' + "'s</a>",
        "plain",
        "",
    ]
    texts = [
        'tab\there\nnewline "quoted" back\\slash',
        "ctrl\x01char\x7f and \x9f",
        "",
        "héllo utf-8 ✓",
    ]
    xmls = [
        "<content>short</content> mid <content>the longer block</content>",
        "<content>only</content>",
        "none here",
        "<content>outer <content>inner</content></content>",
    ]
    ref = _reference(
        {
            "cmd": "text_helpers",
            "jsons": jsons,
            "htmls": htmls,
            "texts": texts,
            "xmls": xmls,
            "tags": ["content"],
        }
    )
    assert [list(split_and_parse_json_objects(s)) for s in jsons] == ref["split"]
    assert [_sanitize_html_for_prompt(s) for s in htmls] == ref["sanitize"]
    assert [sanitize_input_encode(s) for s in texts] == ref["encode"]
    assert [escape_json_string(s) for s in texts] == ref["escape"]
    assert [extract_xml_data(["content"], s) for s in xmls] == ref["xml"]
