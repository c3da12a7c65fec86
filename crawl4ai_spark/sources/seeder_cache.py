"""Per-domain TTL cache for seeder discovery results (S13).

Reference: /root/reference/crawl4ai/async_url_seeder.py:241-260
(`_cache_get`/`_cache_set`) — one JSON file per (kind, key), freshness
decided by file mtime against a TTL, `force` bypassing the cache.

Spark reformulation: one parquet table per kind (``cc`` / ``sitemap`` /
``head``), partitioned by domain so a lookup for k domains prunes to k
directories, each row stamped with ``fetched_at``. The read-through
helper mirrors ``operators/cache.py``'s ``split_hits``: callers split
their domain list into (fresh rows straight from the cache, stale
domains to re-discover), fetch only the stale ones, then ``write`` the
new generation back. ``now`` is an explicit argument everywhere — no
wall clock inside a query, so reruns are deterministic and resumable
jobs see the same split.

Scale shape: the cache table is append-only; each domain's newest
generation wins via a per-domain max-timestamp semi-join (domains are
small groups — no global shuffle beyond the partition-pruned scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_TTL_SECONDS = 7 * 24 * 3600

CACHE_SCHEMA = "domain string, url string, fetched_at long"


class SeederCache:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        ttl_seconds: int = DEFAULT_TTL_SECONDS,
    ):
        self.spark = spark
        self.root = root
        self.ttl = int(ttl_seconds)

    def _path(self, kind: str) -> str:
        return os.path.join(self.root, f"kind={kind}")

    def read(self, kind: str) -> DataFrame | None:
        p = self._path(kind)
        # empty/partial dirs: require at least one data file (an empty
        # partitioned write emits none and breaks schema inference)
        if not os.path.exists(p):
            return None
        has_data = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(p)
            for f in files
        )
        if not has_data:
            return None
        return self.spark.read.schema(CACHE_SCHEMA).parquet(p)

    def split_fresh(
        self,
        kind: str,
        domains: DataFrame,
        now: int,
        force: bool = False,
    ) -> tuple[DataFrame, DataFrame]:
        """(fresh_rows, stale_domains) for a (domain string) request set.

        fresh_rows = the newest cached generation of every requested
        domain whose ``fetched_at`` is within the TTL; stale_domains =
        requested domains with no fresh generation (or everything, with
        ``force`` — the reference's cache-bypass flag).
        """
        empty_rows = self.spark.createDataFrame([], CACHE_SCHEMA)
        cached = self.read(kind)
        if force or cached is None:
            return empty_rows, domains
        # restrict to the REQUESTED domains FIRST: the broadcast join
        # on the partition column prunes the scan to k directories; a
        # window computed before it would force a full-cache scan on
        # every lookup (the pruning this table's layout exists for)
        fresh = (
            cached.join(F.broadcast(domains.select("domain")), "domain")
            .filter(F.col("fetched_at") >= now - self.ttl)
        )
        # newest generation per domain (domains are small groups).
        # dropDuplicates after the max filter: two generations written
        # with the SAME `now` (force=True rerun with a fixed timestamp,
        # the documented deterministic-resume pattern) both survive the
        # equality filter and would return every url twice
        w = Window.partitionBy("domain")
        fresh = (
            fresh.withColumn("_mx", F.max("fetched_at").over(w))
            .filter(F.col("fetched_at") == F.col("_mx"))
            .drop("_mx")
            .dropDuplicates(["domain", "url"])
        )
        stale = domains.join(
            fresh.select("domain").distinct(), "domain", "left_anti"
        )
        return fresh, stale

    def write(self, kind: str, rows: DataFrame, now: int) -> None:
        """Append one generation of (domain, url) rows stamped `now`."""
        out = rows.select(
            "domain", "url", F.lit(int(now)).cast("long").alias("fetched_at")
        )
        out.repartition("domain").write.mode("append").partitionBy(
            "domain"
        ).parquet(self._path(kind))


def seed_urls_cached(
    spark: SparkSession,
    cache: SeederCache,
    kind: str,
    domains: list[str],
    now: int,
    discover,
    *,
    force: bool = False,
) -> DataFrame:
    """Read-through discovery: serve fresh domains from the cache, call
    ``discover(stale_domains_df) -> (domain, url) rows`` only for the
    rest, write the new generation back, return the union.

    Mirrors the reference's seeder flow (async_url_seeder.py: check
    cache -> fetch on miss -> persist) with the fetch seam injected as
    a callable, like the frontier's fetch join.
    """
    req = spark.createDataFrame([(d,) for d in domains], "domain string")
    fresh, stale = cache.split_fresh(kind, req, now, force=force)
    n_stale = stale.count()
    if n_stale:
        fetched = discover(stale).select("domain", "url")
        cache.write(kind, fetched, now)
        # re-read the just-written generation so lineage is the parquet
        # (same write-then-read convention as the crawl rounds)
        fresh2, _ = cache.split_fresh(kind, stale, now)
        return fresh.select("domain", "url").unionByName(
            fresh2.select("domain", "url")
        )
    return fresh.select("domain", "url")
