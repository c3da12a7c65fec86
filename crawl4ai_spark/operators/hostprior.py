"""Host/domain-level quality priors — aggregate per-host statistics
and gate documents by their host's aggregate, not just their own.

Modern webtext pipelines curate at the DOMAIN level as well as the
document level (RefinedWeb's URL/domain curation, C4's domain
blocklists, Gopher's domain filters): a host whose pages are
consistently short, duplicated, or low-quality is dropped wholesale,
including its individually-passable pages. The reference has no
corpus-level aggregation at all (per-page scoring only,
crawl4ai/content_scraping_strategy.py word thresholds); this module
adds the standard two-step:

1. ``host_prior_stats`` — one groupBy(host) over any integer
   per-document metric column: (host, n_docs, metric_sum,
   metric_mean) with the mean as exact integer division
   (order-independent, oracle-replayable);
2. ``apply_host_prior`` — join the priors back and flag each document
   with its host's keep decision (min corpus support AND min mean
   metric), leaving the drop to the caller (audits want the flag, not
   the disappearance).

Scale design (100 TB):
- stage 1 is a single partial-aggregable groupBy on the host key —
  hosts are ~10^7-ish keys, orders finer than executor count; hot
  hosts (75 % of a crawl on one CDN vhost) cost one combiner row per
  task, not a shuffle of their pages;
- stage 2 broadcasts the prior table when it fits (a host table is
  KBs per million hosts) — Spark picks the broadcast automatically
  under the threshold; otherwise it's a shuffle join keyed by host,
  co-partitioned with stage 1's output;
- all arithmetic is integer (sums + integer division): bit-identical
  across engines, partitionings, and retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_prior_stats(
    df: DataFrame,
    host_col: str,
    metric: Column,
) -> DataFrame:
    """Per-host aggregate of an integer per-document metric.

    Output: (host_col, n_docs, metric_sum, metric_mean) with
    metric_mean = metric_sum div n_docs (exact integer division).
    """
    return (
        df.select(F.col(host_col), metric.cast("long").alias("_m"))
        .groupBy(host_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_m").cast("long").alias("metric_sum"),
        )
        .withColumn(
            "metric_mean", F.expr("metric_sum div n_docs").cast("long")
        )
    )


def apply_host_prior(
    df: DataFrame,
    stats: DataFrame,
    host_col: str,
    min_docs: int = 1,
    min_mean: int = 0,
) -> DataFrame:
    """Flag every document with its host's keep decision.

    Adds ``host_keep`` (int 0/1): 1 iff the host has at least
    ``min_docs`` documents AND a metric mean of at least ``min_mean``.
    Documents whose host is absent from ``stats`` get 0 (no support).
    """
    pri = stats.select(
        host_col,
        (
            (F.col("n_docs") >= int(min_docs))
            & (F.col("metric_mean") >= int(min_mean))
        )
        .cast("int")
        .alias("host_keep"),
    )
    return df.join(pri, host_col, "left").withColumn(
        "host_keep", F.coalesce(F.col("host_keep"), F.lit(0))
    )
