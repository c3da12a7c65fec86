"""Result cache: the crawl_results table as a URL-keyed KV store
(SURVEY.md S9-S11).

Reference semantics:
- CacheMode / CacheContext (cache_context.py:4-92): ENABLED read+write,
  DISABLED none, READ_ONLY, WRITE_ONLY, BYPASS.
- SQLite cache read/write (async_database.py:288-475): url-keyed
  CrawlResult rows, content-hash dedup of blobs (:527-541).

Spark reformulation: the cache IS a parquet/Iceberg results table;
"cache hit" is a join of the frontier against it on url_hash, routing
hit rows around the fetch+extract stage; writes append only rows whose
url_hash is not already present (content-addressed dedup on the key).
"""

from __future__ import annotations

import os
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CacheMode(str, Enum):
    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"


def should_read(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)


def should_write(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


# columns a cache hit can serve without refetching — including the
# original fetch provenance (http_status/final_url) and the response
# validators (etag/last_modified), so a hit replays what the fetch
# actually returned instead of fabricating a 200, and a cached page
# can still seed conditional revalidation (url_validators)
CACHED_COLS = [
    "url_hash", "title", "headings", "meta", "text_extracted",
    "raw_markdown", "markdown_with_citations", "references_markdown",
    "n_links", "links", "http_status", "final_url",
    "etag", "last_modified",
]


class ResultCache:
    """Parquet-backed url_hash-keyed result cache."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path) and bool(os.listdir(self.path))

    def load(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path)

    def split_hits(self, frontier: DataFrame, mode: CacheMode):
        """(hits, misses): hit rows carry the cached result columns.

        Plan: one join on url_hash (the cache table is bucketed by
        url_hash in production, making this a co-partitioned probe).
        """
        cache = self.load() if should_read(mode) else None
        if cache is None:
            empty = frontier.limit(0)
            for c in CACHED_COLS[1:]:
                empty = empty.withColumn(c, F.lit(None))
            return empty, frontier
        # tables written before a CACHED_COLS widening (e.g. the
        # etag/last_modified addition) lack the new columns: backfill
        # nulls instead of failing the select
        cached = cache.select(
            *[
                (F.col(c) if c in cache.columns
                 else F.lit(None).cast("string").alias(c))
                for c in CACHED_COLS
            ]
        ).dropDuplicates(["url_hash"])
        c = cached.withColumnRenamed("url_hash", "__c_hash")
        hits = frontier.join(
            c, frontier["url_hash"] == F.col("__c_hash"), "inner"
        ).drop("__c_hash")
        misses = frontier.join(
            cached.select("url_hash"), "url_hash", "left_anti"
        )
        return hits, misses

    def write(self, results: DataFrame, mode: CacheMode) -> int:
        """Append successful results whose key is not cached yet
        (content-addressed dedup on url_hash)."""
        if not should_write(mode):
            return 0
        # results tables without the validator columns (operator-form
        # callers that never fetched live) write nulls for them
        fresh = results.filter(F.col("success")).select(
            *[
                (F.col(c) if c in results.columns
                 else F.lit(None).cast("string").alias(c))
                for c in CACHED_COLS
            ],
            F.col("url"),
        )
        existing = self.load()
        if existing is not None:
            fresh = fresh.join(
                existing.select("url_hash"), "url_hash", "left_anti"
            )
        # persist across the count + write actions: without it the
        # filter plus the full cache-scan anti-join runs TWICE per
        # round (and a nondeterministic input could make n disagree
        # with what was written)
        fresh = fresh.persist()
        try:
            n = fresh.count()
            if n > 0:
                fresh.write.mode("append").parquet(self.path)
        finally:
            fresh.unpersist()
        return n
