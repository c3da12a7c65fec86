"""Streaming-mode crawl parity (SURVEY.md §2.11 `arun_many` stream).

Reference: ``arun_many(..., config.stream=True)`` returns results as an
async generator while the dispatcher keeps fetching
(async_webcrawler.py:742-755, async_dispatcher.py:469-557).

Structured-Streaming reformulation:
- the frontier is a STREAM: new URL batches land as parquet files in a
  watched directory (the batch engine's per-round frontier writes are
  exactly such files);
- each micro-batch joins the static pages table, runs the Arrow-batched
  scrape+markdown stage, and appends to the results sink;
- the checkpoint directory gives exactly-once file processing — a
  killed stream resumes without re-extracting completed batches
  (the streaming analog of the batch engine's manifest resume);
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
):
    """Start the streaming fetch+extract: frontier parquet files ->
    results parquet sink. Returns the StreamingQuery."""
    os.makedirs(frontier_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(FRONTIER_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frontier_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fetched = batch_df.join(
            pages.select("url", "html", "warc_ts"), "url", "left"
        )
        extracted = scrape_stage(fetched, "html", "url", markdown=True)
        out = extracted.select(
            "url", "url_hash", "host", "depth", "priority", "parent_url_hash",
            F.when(F.col("html").isNotNull(), "fetched")
            .otherwise("miss")
            .alias("fetch_status"),
            (F.col("html").isNotNull() & F.col("success")).alias("success"),
            "title", "raw_markdown",
            F.size(F.coalesce(F.col("links"), F.array())).alias("n_links"),
        )
        out.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
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
