"""Structured-Streaming crawl parity tests: incremental frontier files
are extracted exactly once, and a killed stream resumes from its
checkpoint without re-processing."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import host_no_port, url_hash
from crawl4ai_spark.streaming.stream_crawl import start_stream_extract
from crawl4ai_spark.synth import generate_pages


def _frontier_batch(spark, urls, round_no):
    return spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url",
        url_hash("url").alias("url_hash"),
        host_no_port("url").alias("host"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("bigint").alias("parent_url_hash"),
        F.lit(round_no).alias("round"),
        F.lit(None).cast("string").alias("dfs_key"),
    )


def _wait_for(predicate, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return True
        time.sleep(1)
    return False


def test_stream_extract_incremental_and_resume(spark, sf_dir, tmp_path):
    pages = generate_pages(spark, sf_dir)
    pages.cache()
    all_urls = sorted(r["url"] for r in pages.select("url").collect())

    frontier_dir = str(tmp_path / "frontier_stream")
    out_dir = str(tmp_path / "results_stream")
    ckpt = str(tmp_path / "ckpt")

    def result_count():
        try:
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    q = start_stream_extract(spark, pages, frontier_dir, out_dir, ckpt)
    try:
        _frontier_batch(spark, all_urls[:10], 0).coalesce(1).write.mode(
            "append"
        ).parquet(frontier_dir)
        assert _wait_for(lambda: result_count() >= 10), "first batch not extracted"

        _frontier_batch(spark, all_urls[10:25], 1).coalesce(1).write.mode(
            "append"
        ).parquet(frontier_dir)
        assert _wait_for(lambda: result_count() >= 25), "second batch not extracted"
    finally:
        q.stop()

    n_after_stop = result_count()
    assert n_after_stop == 25

    # kill/resume: restart from the checkpoint, add one more batch —
    # previously-done files must NOT be re-extracted (exactly-once)
    q2 = start_stream_extract(spark, pages, frontier_dir, out_dir, ckpt)
    try:
        _frontier_batch(spark, all_urls[25:30], 2).coalesce(1).write.mode(
            "append"
        ).parquet(frontier_dir)
        assert _wait_for(lambda: result_count() >= 30)
        time.sleep(3)  # give it a chance to (wrongly) duplicate
    finally:
        q2.stop()

    res = spark.read.parquet(out_dir)
    assert res.count() == 30  # no duplicates across restart
    assert res.select("url").distinct().count() == 30
    ok = res.filter("success").count()
    assert ok == 30  # every url exists in the corpus
    assert res.filter(F.col("raw_markdown").isNull()).count() == 0
    pages.unpersist()


def test_stream_politeness_stateful_fold_and_resume(spark, tmp_path):
    """applyInPandasWithState per-host backoff: fold parity with a
    python simulator across micro-batches, and checkpointed state
    surviving a stream restart."""
    import hashlib

    from crawl4ai_spark.streaming.stream_crawl import start_stream_politeness

    events_dir = str(tmp_path / "events")
    state_dir = str(tmp_path / "state_out")
    ckpt = str(tmp_path / "pol_ckpt")
    os.makedirs(events_dir, exist_ok=True)

    def batch(rows):
        spark.createDataFrame(
            [(u, h, None, s) for u, h, s in rows],
            "url string, host string, warc_ts timestamp, success boolean",
        ).coalesce(1).write.mode("append").parquet(events_dir)

    def simulate(folds):
        delay, fail = 1.0, 0
        for r, (n, ok) in enumerate(folds):
            h = int.from_bytes(
                hashlib.md5(f"h1:{r}".encode()).digest()[:4], "big"
            )
            jitter = 0.75 + (h % 1000) / 2000.0
            if n > 0 and ok < n:
                delay = min(delay * 2.0 * jitter, 60.0)
            else:
                delay = max(delay * 0.75, 1.0)
            if n > 0 and ok == 0:
                fail += 1
            elif ok > 0:
                fail = 0
        return delay, fail

    def rows_for(host):
        try:
            return sorted(
                map(
                    tuple,
                    spark.read.parquet(state_dir)
                    .filter(f"host = '{host}'")
                    .select("rounds", "current_delay", "fail_count")
                    .collect(),
                )
            )
        except Exception:
            return []

    q = start_stream_politeness(spark, events_dir, state_dir, ckpt)
    try:
        # batch 1: h1 all fail, h2 all ok
        batch([("u1", "h1", False), ("u2", "h1", False), ("u3", "h2", True)])
        assert _wait_for(lambda: len(rows_for("h1")) >= 1)
        # batch 2: h1 mixed
        batch([("u4", "h1", True), ("u5", "h1", False)])
        assert _wait_for(lambda: len(rows_for("h1")) >= 2)
    finally:
        q.stop()

    # restart from checkpoint; batch 3 continues the fold (rounds=2)
    q2 = start_stream_politeness(spark, events_dir, state_dir, ckpt)
    try:
        batch([("u6", "h1", False), ("u7", "h1", False)])
        assert _wait_for(lambda: len(rows_for("h1")) >= 3)
    finally:
        q2.stop()

    got = rows_for("h1")
    want = []
    folds = [(2, 0), (2, 1), (2, 0)]
    for r in range(1, 4):
        d, f = simulate(folds[:r])
        want.append((r, d, f))
    assert got == sorted(want)
    # all-success host decays at the floor
    h2 = rows_for("h2")
    assert h2[0][1] == 1.0 and h2[0][2] == 0


def test_stream_metrics_watermarked_windows(spark, tmp_path):
    """Watermarked per-host windowed throughput: a closed 1-minute
    window emits exactly once after the watermark passes it; late rows
    beyond the watermark are dropped."""
    import datetime as dt

    from crawl4ai_spark.streaming.stream_crawl import start_stream_metrics

    events_dir = str(tmp_path / "mev")
    out_dir = str(tmp_path / "mout")
    ckpt = str(tmp_path / "mckpt")
    os.makedirs(events_dir, exist_ok=True)

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def batch(rows):
        spark.createDataFrame(
            [(u, h, base + dt.timedelta(seconds=s), ok) for u, h, s, ok in rows],
            "url string, host string, warc_ts timestamp, success boolean",
        ).coalesce(1).write.mode("append").parquet(events_dir)

    def emitted():
        try:
            return sorted(
                map(
                    tuple,
                    spark.read.parquet(out_dir)
                    .select("host", "window_start", "n_urls", "n_ok")
                    .collect(),
                )
            )
        except Exception:
            return []

    q = start_stream_metrics(spark, events_dir, out_dir, ckpt)
    try:
        # window [00:00, 00:01): 2 ok + 1 fail on h1; 1 ok on h2
        batch([("u1", "h1", 5, True), ("u2", "h1", 20, True),
               ("u3", "h1", 50, False), ("u4", "h2", 30, True)])
        # advance event time far enough to close the first window
        # (watermark = max_ts - 2min)
        batch([("u5", "h1", 300, True)])
        assert _wait_for(lambda: len(emitted()) >= 2)
    finally:
        q.stop()

    rows = emitted()
    w0 = base
    assert (("h1", w0, 3, 2) in rows) and (("h2", w0, 1, 1) in rows)


def test_stream_extract_available_now_drains_and_stops(spark, sf_dir, tmp_path):
    """availableNow mode (the streaming-bench drain): everything already
    in the directory is processed in rate-limited micro-batches, then
    the query stops on its own — exactly once, no residual trigger."""
    pages = generate_pages(spark, sf_dir).cache()
    urls = sorted(r["url"] for r in pages.select("url").collect())[:20]
    fdir = str(tmp_path / "frontier")
    odir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for b in range(3):
        _frontier_batch(spark, urls, b).coalesce(1).write.mode(
            "append"
        ).parquet(fdir)
    q = start_stream_extract(
        spark, pages, fdir, odir, ckpt,
        max_files_per_trigger=1, available_now=True,
    )
    assert q.awaitTermination(120), "drain did not terminate"
    assert not q.isActive
    out = spark.read.parquet(odir)
    assert out.count() == 60  # 3 batches x 20 urls, exactly once
    assert out.filter(F.col("success")).count() == 60


def test_stream_extract_over_fetcher_equals_join(spark, sf_dir, tmp_path):
    """The streaming extract path over the pluggable fetch seam
    (fetcher=MapFetcher) must produce the same rows as the pages-join
    default — the batch engine's crawl-over-fetcher==crawl-over-join
    parity, micro-batched."""
    from crawl4ai_spark.operators.fetch import MapFetcher

    pages = generate_pages(spark, sf_dir).cache()
    all_urls = sorted(r["url"] for r in pages.select("url").collect())
    corpus = {
        r["url"]: bytes(r["html"])
        for r in pages.select("url", "html").collect()
    }

    def fake_http(url):
        body = corpus.get(url)
        return {"status": 200, "body": body} if body else {"error": "miss"}

    def run(fetcher, tag):
        frontier_dir = str(tmp_path / f"frontier_{tag}")
        out_dir = str(tmp_path / f"results_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        _frontier_batch(
            spark, all_urls[:20] + ["https://nowhere.example/zz"], 0
        ).coalesce(1).write.mode("append").parquet(frontier_dir)
        q = start_stream_extract(
            spark, pages, frontier_dir, out_dir, ckpt,
            available_now=True, fetcher=fetcher,
        )
        q.awaitTermination(120)
        return [
            tuple(r)
            for r in spark.read.parquet(out_dir)
            .select(
                "url", "fetch_status", "success", "title", "n_links",
            )
            .orderBy("url")
            .collect()
        ]

    joined = run(None, "join")
    fetched = run(MapFetcher(fake_http), "fetch")
    assert joined == fetched
    assert any(r[1] == "fetched" for r in joined)
    by_url = {r[0]: r for r in fetched}
    assert by_url["https://nowhere.example/zz"][1] == "miss"


def test_stream_extract_sink_idempotent_on_batch_retry(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: a crash between a batch's sink
    write and its checkpoint offset commit re-runs the SAME batch_id on
    restart. The sink must be idempotent — re-draining the identical
    frontier files into the same out_dir with a FRESH checkpoint (every
    batch_id re-runs: the worst-case retry) must not duplicate rows."""
    pages = generate_pages(spark, sf_dir)
    pages.cache()
    urls = sorted(r["url"] for r in pages.select("url").collect())[:20]

    fdir = str(tmp_path / "frontier")
    odir = str(tmp_path / "out")
    for b in range(2):
        _frontier_batch(spark, urls[b * 10:(b + 1) * 10], b).coalesce(
            1
        ).write.mode("append").parquet(fdir)

    q = start_stream_extract(
        spark, pages, fdir, odir, str(tmp_path / "ckpt1"),
        max_files_per_trigger=1, available_now=True,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(odir)
    assert first.count() == 20

    # the retry: same files, same batch numbering (fresh checkpoint),
    # same sink dir — rows must be replaced, not appended
    q2 = start_stream_extract(
        spark, pages, fdir, odir, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1, available_now=True,
    )
    q2.awaitTermination(120)
    res = spark.read.parquet(odir)
    assert res.count() == 20  # not 40
    assert res.select("url").distinct().count() == 20
    pages.unpersist()
