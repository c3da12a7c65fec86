"""Recrawl scheduling: estimate per-URL change rates from capture
history and turn staleness into frontier priority.

The reference crawls a URL once per run (its ``visited`` set has no
notion of revisit); a production crawler must decide WHICH of 10^10
known URLs to refetch. This module implements the published
change-frequency machinery (Cho & Garcia-Molina, "Estimating Frequency
of Change", ACM TOIT 3(3), 2003) over the capture-history shape the CDX
source already provides (url, warc_ts, digest — one row per capture,
digest = payload hash):

- changes are OBSERVED transitions: ``digest != lag(digest)`` over each
  URL's captures in time order (a per-URL window — fine-grained keys,
  no skew);
- the estimator is the paper's bias-corrected intensity
  ``lambda = -log((n - X + 0.5) / (n + 0.5)) / ibar`` with ibar the
  mean inter-capture interval (eq. for irregular access in §4.2 — X of
  n-1 transition slots showed a change);
- staleness is the Poisson survival ``1 - exp(-lambda * age)`` — the
  probability the page changed since its last capture; it IS the
  expected-freshness loss, so it is the revisit priority.

Everything is two narrow projections + one per-URL window; the output
feeds ``CrawlConfig`` frontiers directly (url, priority).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400.0


def change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    prior_lambda_per_day: float = 1.0 / 30.0,
) -> DataFrame:
    """Per-URL change statistics from a capture history.

    Returns (url, n_obs, n_changes, span_days, lambda_per_day):
    - ``n_obs`` captures, ``n_changes`` observed digest transitions,
      over ``span_days``;
    - ``lambda_per_day`` = bias-corrected changes/day; URLs with a
      single capture (no slots) take ``prior_lambda_per_day`` — the
      cold-start prior (~monthly by default).

    NULL digests (optional in the CDX schema, sources/cdx.py) are
    uninformative for change detection: each digest-bearing capture is
    compared against the most recent PRIOR digest-bearing capture
    (``[x, NULL, y]`` counts the x->y transition; a plain lag would
    NULL out both comparisons and report the page as never changing),
    and the estimator's slot count / interval span cover only the
    digest-bearing captures.
    """
    w = Window.partitionBy("url").orderBy("ts", "digest")
    prev_digest = F.last("digest", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    obs = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn(
        "_changed",
        (F.col("digest") != prev_digest).cast("int"),
    )
    dts = F.when(F.col("digest").isNotNull(), F.col("ts"))
    agg = obs.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.count("digest").alias("_n_digests"),
        F.coalesce(F.sum("_changed"), F.lit(0)).cast("long").alias("n_changes"),
        (
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / F.lit(SECONDS_PER_DAY)
        ).alias("span_days"),
        (
            (F.unix_timestamp(F.max(dts)) - F.unix_timestamp(F.min(dts)))
            / F.lit(SECONDS_PER_DAY)
        ).alias("_dspan_days"),
        F.max("ts").alias("last_capture"),
    )
    slots = F.col("_n_digests") - 1
    ibar_days = F.col("_dspan_days") / slots  # mean inter-capture interval
    # Cho & Garcia-Molina bias-corrected estimator: X changed slots out
    # of n-1; -log((n-1 - X + 0.5)/(n-1 + 0.5)) changes per interval
    lam = (
        -F.log((slots - F.col("n_changes") + 0.5) / (slots + 0.5)) / ibar_days
    )
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        "span_days",
        "last_capture",
        F.when(
            (slots > 0) & (F.col("_dspan_days") > 0), lam
        ).otherwise(F.lit(prior_lambda_per_day)).alias("lambda_per_day"),
    )


def recrawl_priorities(
    captures: DataFrame,
    now,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    prior_lambda_per_day: float = 1.0 / 30.0,
    min_staleness: float = 0.0,
) -> DataFrame:
    """(url, priority, staleness, lambda_per_day, age_days) ranked by
    expected staleness at ``now`` (datetime or ISO string).

    ``staleness`` = P[page changed since its last capture] =
    1 - exp(-lambda * age). Deterministic total order (staleness desc,
    url asc); ``min_staleness`` drops fresh URLs so the refetch budget
    is spent where expected freshness gain is real.
    """
    rates = change_rate(
        captures, url_col, ts_col, digest_col, prior_lambda_per_day
    )
    age_days = (
        F.unix_timestamp(F.lit(now).cast("timestamp"))
        - F.unix_timestamp("last_capture")
    ) / F.lit(SECONDS_PER_DAY)
    out = (
        rates.withColumn("age_days", F.greatest(age_days, F.lit(0.0)))
        .withColumn(
            "staleness",
            1.0 - F.exp(-F.col("lambda_per_day") * F.col("age_days")),
        )
        .withColumn("priority", F.col("staleness"))
    )
    if min_staleness > 0.0:
        out = out.filter(F.col("staleness") >= min_staleness)
    return out.select(
        "url", "priority", "staleness", "lambda_per_day", "n_obs",
        "n_changes", "age_days",
    ).orderBy(F.desc("staleness"), F.asc("url"))
