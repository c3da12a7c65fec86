"""The URL-seen filter — THE scale-critical operator (SURVEY.md J1).

Reference semantics: the in-memory ``visited: Set[str]`` of the BFS/DFS
strategies (deep_crawling/bfs_strategy.py:106-121, dfs_strategy.py:33)
and the seeder's dedup set (async_url_seeder.py:344-358) — membership
keyed by the canonical URL.

Spark design for a 10^10-URL frontier:
- key = ``xxhash64(canonical_url)`` (→ functions/urls.url_hash).
- the seen set is a table sharded by ``pmod(url_hash, n_shards)`` and
  stored as per-round parquet deltas under ``<workdir>/url_seen/`` (an
  Iceberg bucketed table in production — the bucket join then needs no
  re-shuffle of the seen side).
- the per-round membership test is ONE co-partitioned left-anti join on
  (shard, url_hash): candidate links are repartitioned by the same
  shard function, so each task joins against exactly one shard.
- exactness: the hash is 64-bit (pair-collision odds ~3e-9 at 1e10
  URLs); a production deployment confirms collisions against the full
  URL inside the shard — the shard rows carry ``url`` for that purpose.
- a Bloom/cuckoo fast-path can front the join (Spark's
  ``DataFrame.stat.bloomFilter`` per shard) to skip shards with no
  candidates; at local test scale the exact join IS the fast path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEEN_SCHEMA = "url_hash bigint, url string, shard int"


def shard_of(url_hash_col, n_shards: int):
    return F.pmod(url_hash_col, F.lit(n_shards)).cast("int")


class SeenFilter:
    """Parquet-backed sharded seen set with per-round append deltas."""

    def __init__(self, spark: SparkSession, workdir: str, n_shards: int = 32):
        self.spark = spark
        self.path = os.path.join(workdir, "url_seen")
        self.n_shards = n_shards

    def load(self) -> DataFrame:
        if not os.path.exists(self.path) or not os.listdir(self.path):
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        # per-round deltas live in round=N subdirs (partition discovery)
        return self.spark.read.parquet(self.path).select(
            "url_hash", "url", "shard"
        )

    def anti_join(self, candidates: DataFrame, url_hash_col: str = "url_hash") -> DataFrame:
        """Rows of ``candidates`` whose url_hash is NOT in the seen set.

        Plan shape: both sides hash-partitioned on the join key; the
        seen side is pre-sharded on disk so partition-local reads feed
        the join (bucketed Iceberg: zero seen-side shuffle).
        """
        seen = self.load().select(F.col("url_hash").alias("__seen_hash"))
        return candidates.join(
            seen,
            F.col(url_hash_col) == F.col("__seen_hash"),
            "left_anti",
        )

    def add(self, rows: DataFrame, round_no: int,
            url_hash_col: str = "url_hash", url_col: str = "url") -> None:
        """Write this round's delta of newly-seen URLs.

        One subdir per round, overwritten (not appended) so a crashed
        round can be re-run idempotently.
        """
        delta = (
            rows.select(
                F.col(url_hash_col).alias("url_hash"),
                F.col(url_col).alias("url"),
                shard_of(F.col(url_hash_col), self.n_shards).alias("shard"),
            )
            .dropDuplicates(["url_hash"])
            .repartition(self.n_shards, "shard")
            .sortWithinPartitions("url_hash")
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(self.path, f"round={round_no}")
        )

    def count(self) -> int:
        return self.load().count()
