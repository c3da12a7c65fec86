"""Streaming-mode crawl parity (SURVEY.md §2.11 `arun_many` stream).

Reference: ``arun_many(..., config.stream=True)`` returns results as an
async generator while the dispatcher keeps fetching
(async_webcrawler.py:742-755, async_dispatcher.py:469-557).

Structured-Streaming reformulation:
- the frontier is a STREAM: new URL batches land as parquet files in a
  watched directory (the batch engine's per-round frontier writes are
  exactly such files);
- each micro-batch joins the static pages table, runs the Arrow-batched
  scrape+markdown stage, and overwrites its own batch_id=N partition of
  the results sink;
- checkpointing makes the SOURCE exactly-once (a killed stream resumes
  without re-reading committed batches), and the per-batch_id overwrite
  makes the SINK idempotent — foreachBatch is only at-least-once, so a
  crash between a batch's write and its offset commit re-runs the
  batch, and the overwrite replaces rather than duplicates its rows
  (the streaming analog of the batch engine's overwrite-only round
  reruns);
- late-data metrics: a watermarked window aggregation over warc_ts.

The feedback edge (discovered links re-entering the frontier) is a
CYCLE, which Structured Streaming's DAG model forbids — the driver loop
closes it by writing next-round files into the watched directory, the
same round structure as the batch engine (documented parity boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scrape import scrape_stage
from ..operators.frontier import FRONTIER_SCHEMA

STREAM_RESULT_COLS = [
    "url", "url_hash", "host", "depth", "priority", "parent_url_hash",
    "fetch_status", "success", "title", "raw_markdown", "n_links",
]


def start_stream_extract(
    spark: SparkSession,
    pages: DataFrame,
    frontier_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 4,
    available_now: bool = False,
    fetcher=None,
):
    """Start the streaming fetch+extract: frontier parquet files ->
    results parquet sink. Returns the StreamingQuery.

    ``available_now=True`` drains everything already in the directory
    in back-to-back micro-batches (still rate-limited by
    ``max_files_per_trigger``) and stops — the batch-drain mode the
    streaming bench times; the default is a continuous 1 s trigger.

    ``fetcher`` swaps the pages-table lookup join for the same
    pluggable fetch seam the batch engine uses (operators/fetch.py) —
    live micro-batch fetching with identical result labels; per-host
    pacing state is per micro-batch (each foreachBatch run is its own
    job; the politeness floor across batches is the 1 s trigger)."""
    os.makedirs(frontier_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(FRONTIER_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frontier_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        base_col = "url"
        if fetcher is not None:
            from ..operators.fetch import fetch_stage, fetch_status_expr

            fetched = fetch_stage(batch_df, fetcher).withColumn(
                # relative links resolve against the POST-redirect URL,
                # same as the batch engine's _scrape_base
                "_sbase", F.coalesce(F.col("final_url"), F.col("url"))
            )
            base_col = "_sbase"
            # the batch engine's classifier verbatim (incl. the 304 ->
            # 'not_modified' case), single-sourced in operators/fetch.py
            status = fetch_status_expr(
                F.col("html").isNotNull()
                & (
                    F.col("http_status").isNull()
                    | F.col("http_status").between(200, 299)
                )
            )
        else:
            fetched = batch_df.join(
                pages.select("url", "html", "warc_ts"), "url", "left"
            )
            status = F.when(F.col("html").isNotNull(), "fetched").otherwise(
                "miss"
            )
        # materialize the status BEFORE the scrape drops html (both
        # branch expressions reference it); dropping html/cleaned_html
        # turns on scrape_stage's one-parser-pass markdown path
        fetched = fetched.withColumn("_status", status)
        status = F.col("_status")
        # _sbase is read as url_col inside the stage, then dropped —
        # same as the batch engine's _scrape_base — so the base-URL
        # copy doesn't ride the Arrow egress
        drop = ("html", "cleaned_html") + (
            ("_sbase",) if base_col == "_sbase" else ()
        )
        extracted = scrape_stage(
            fetched, "html", base_col, markdown=True, drop_cols=drop,
        )
        out = extracted.select(
            "url", "url_hash", "host", "depth", "priority", "parent_url_hash",
            status.alias("fetch_status"),
            ((status == "fetched") & F.col("success")).alias("success"),
            "title", "raw_markdown",
            F.size(F.coalesce(F.col("links"), F.array())).alias("n_links"),
        )
        # exactly-once needs an IDEMPOTENT sink: foreachBatch is
        # at-least-once (a crash between this write and the checkpoint
        # offset commit re-runs the same batch_id on restart), so each
        # micro-batch overwrites its own batch_id=N partition dir — a
        # retry replaces the earlier attempt's rows instead of
        # appending duplicates. Readers of out_dir see batch_id as a
        # partition column.
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()


POLITENESS_STATE_SCHEMA = "current_delay double, fail_count int, rounds int"
POLITENESS_OUT_SCHEMA = (
    "host string, current_delay double, fail_count int, rounds int, "
    "n_urls long, n_ok long"
)


def _politeness_fold(key, pdfs, state):
    """Per-host backoff fold (the streaming twin of
    operators/politeness.update_state): all-success decays delay x0.75
    (floored at 1s), any failure doubles it with deterministic jitter
    in [0.75, 1.25) capped at 60s; fail_count tracks consecutive
    all-failed micro-batches. Jitter hashes (host, fold round) — md5
    here vs xxhash64 in the batch engine, both deterministic per
    engine (documented divergence; the reference jitters randomly)."""
    import hashlib

    import pandas as pd

    host = key[0]
    if state.exists:
        delay, fail, rounds = state.get
    else:
        delay, fail, rounds = 1.0, 0, 0
    n = ok = 0
    for pdf in pdfs:
        n += len(pdf)
        ok += int(pdf["success"].sum())
    h = int.from_bytes(hashlib.md5(f"{host}:{rounds}".encode()).digest()[:4], "big")
    jitter = 0.75 + (h % 1000) / 2000.0
    if n > 0 and ok < n:
        delay = min(delay * 2.0 * jitter, 60.0)
    else:
        delay = max(delay * 0.75, 1.0)
    if n > 0 and ok == 0:
        fail += 1
    elif ok > 0:
        fail = 0
    rounds += 1
    state.update((float(delay), int(fail), int(rounds)))
    yield pd.DataFrame(
        [
            {
                "host": host, "current_delay": float(delay),
                "fail_count": int(fail), "rounds": int(rounds),
                "n_urls": int(n), "n_ok": int(ok),
            }
        ]
    )


def start_stream_politeness(
    spark: SparkSession,
    results_dir: str,
    state_out_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 1,
):
    """Custom stateful streaming operator: per-host politeness/backoff
    state folded across micro-batches with ``applyInPandasWithState``
    — checkpointed, so a killed stream resumes with the exact per-host
    delays (the streaming analog of PolitenessState round files)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = "url string, host string, warc_ts timestamp, success boolean"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(results_dir)
    )
    folded = stream.groupBy("host").applyInPandasWithState(
        _politeness_fold,
        outputStructType=POLITENESS_OUT_SCHEMA,
        stateStructType=POLITENESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        folded.writeStream.outputMode("append")
        .format("parquet")
        .option("path", state_out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )


def start_stream_metrics(
    spark: SparkSession,
    results_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 minute",
    watermark: str = "2 minutes",
):
    """Watermarked per-host windowed throughput over a stream of crawl
    events (event time = warc_ts): the late-data-tolerant counterpart
    of the batch metrics table."""
    schema = "url string, host string, warc_ts timestamp, success boolean"
    stream = spark.readStream.schema(schema).parquet(results_dir)
    agg = (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum(F.col("success").cast("int")).alias("n_ok"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_urls", "n_ok",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", metrics_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
