"""SeenFilter bloom fast path: exactness parity with the plain anti-join
plus shard-skip evidence (only the shards the maybe-rows map to are read).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlConfig, run_crawl
from crawl4ai_spark.operators.seen import (
    SeenFilter,
    _bloom_build,
    _bloom_test_any,
)
from crawl4ai_spark.synth import generate_pages, page_url


def _mk_rows(spark, ids):
    return spark.range(0, 0).sparkSession.createDataFrame(
        [(int(i), f"https://h0.example.com/u{i}") for i in ids],
        "url_hash bigint, url string",
    )


def test_bloom_kernel_no_false_negatives():
    rng = np.random.default_rng(7)
    member = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    other = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    m, k, bits = _bloom_build(member)
    arr = np.frombuffer(bits, dtype=np.uint8)
    assert _bloom_test_any(member, [(m, k, arr)]).all()  # zero false negatives
    fp = _bloom_test_any(other, [(m, k, arr)]).mean()
    assert fp < 0.01  # 16 bits/key, 7 probes


def test_bloom_anti_join_matches_exact(spark, tmp_path):
    seen_ids = list(range(0, 4000))
    cand_ids = list(range(3000, 5000))  # 1000 seen, 1000 new

    exact = SeenFilter(spark, str(tmp_path / "a"), n_shards=8, use_bloom=False)
    bloom = SeenFilter(spark, str(tmp_path / "b"), n_shards=8, use_bloom=True)
    for r, chunk in enumerate((seen_ids[:2000], seen_ids[2000:])):
        exact.add(_mk_rows(spark, chunk), r)
        bloom.add(_mk_rows(spark, chunk), r)

    cands = _mk_rows(spark, cand_ids)
    got_exact = {r["url_hash"] for r in exact.anti_join(cands).collect()}
    got_bloom = {r["url_hash"] for r in bloom.anti_join(cands).collect()}
    assert got_bloom == got_exact == set(range(4000, 5000))


def test_bloom_shard_skip(spark, tmp_path):
    """Candidates that all map to one shard must read only that shard's
    files in the exact-confirm join (directory partition pruning)."""
    sf = SeenFilter(spark, str(tmp_path / "c"), n_shards=8, use_bloom=True)
    sf.add(_mk_rows(spark, range(4000)), 0)

    # candidates confined to shard 3: url_hash % 8 == 3 (pmod semantics)
    cand_ids = [8 * i + 3 for i in range(200, 400)]
    cands = _mk_rows(spark, cand_ids)
    out = sf.anti_join(cands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    new = {r["url_hash"] for r in out.collect()}
    assert new == {i for i in cand_ids if i >= 4000}
    # the seen-side scan carries the shard partition filter
    assert "shard" in plan and ("PartitionFilters" in plan or "isin" in plan.lower())


def test_crawl_with_bloom_matches_without(spark, sf_dir, tmp_path):
    pages = generate_pages(spark, sf_dir)
    langs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    lang_of = {r["doc_id"]: r["lang"] for r in langs}
    seeds = [page_url(i, lang_of[i]) for i in (1, 2, 3)]

    cols = ["url", "round", "depth", "success", "n_links"]
    runs = {}
    for name, kind in (("off", None), ("on", "bloom"), ("cuckoo", "cuckoo")):
        wd = str(tmp_path / name)
        cfg = CrawlConfig(
            max_depth=2, round_seconds=8.0, seen_filter_kind=kind
        )
        ms = run_crawl(spark, pages, seeds, wd, cfg, max_rounds=3)
        from crawl4ai_spark.operators.frontier import CrawlRun

        res = CrawlRun(spark, pages, wd, cfg).results()
        runs[name] = (
            [
                {k: v for k, v in m.items() if k not in ("wall_s", "config")}
                for m in ms
            ],
            sorted(map(tuple, res.select(*cols).collect())),
        )
    assert runs["on"] == runs["off"] == runs["cuckoo"]


def test_same_round_rewrite_invalidates_sidecar_cache(spark, tmp_path):
    """A crashed round re-run overwrites its delta+sidecar under the
    SAME round number. The in-memory per-round filter cache must evict
    that round (and rebuild the broadcast), or the stale filter marks
    the rewritten URLs definitely-unseen and re-admits them past the
    exact join."""
    from crawl4ai_spark.operators.seen import SeenFilter

    def rows(ids):
        return spark.createDataFrame(
            [(int(i), f"https://h.example/u{i}") for i in ids],
            "url_hash bigint, url string",
        )

    sf = SeenFilter(spark, str(tmp_path), n_shards=4, filter_kind="bloom")
    sf.add(rows(range(100)), round_no=0)
    # prime the cache
    assert sf.anti_join(rows(range(100, 120))).count() == 20
    # same-round rewrite with DIFFERENT hashes (live refetch divergence)
    sf.add(rows(range(200, 300)), round_no=0)
    # the rewritten hashes must test as seen (stale cache would pass them)
    assert sf.anti_join(rows(range(200, 220))).count() == 0
