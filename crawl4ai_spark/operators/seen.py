"""The URL-seen filter — THE scale-critical operator (SURVEY.md J1).

Reference semantics: the in-memory ``visited: Set[str]`` of the BFS/DFS
strategies (deep_crawling/bfs_strategy.py:106-121, dfs_strategy.py:33)
and the seeder's dedup set (async_url_seeder.py:344-358) — membership
keyed by the canonical URL.

Spark design for a 10^10-URL frontier:
- key = ``xxhash64(canonical_url)`` (→ functions/urls.url_hash).
- the seen set is a table sharded by ``pmod(url_hash, n_shards)`` and
  stored as per-round parquet deltas, **directory-partitioned by
  shard** (``url_seen/round=N/shard=K/``; an Iceberg bucketed table in
  production). Directory partitioning means a shard predicate on the
  seen side is pure file pruning — untouched shards are never read.
- the per-round membership test is ONE co-partitioned left-anti join on
  url_hash: candidate links are repartitioned by the same shard
  function, so each task joins against exactly one shard.
- **probabilistic fast path** (``filter_kind="bloom" | "cuckoo"``):
  each round's delta also writes a per-shard filter sidecar
  (``url_seen_blooms/round=N`` or ``url_seen_cuckoo/round=N``). The
  cuckoo codec (operators/cuckoo.py) is the north_star's named
  structure — same topology, plus O(1) delete for retired URLs.
  ``anti_join`` then tests every candidate against the OR of its
  shard's blooms in one Arrow-batched numpy kernel; candidates the
  bloom rejects are *definitely* unseen (no false negatives) and skip
  the join entirely, and the exact join runs only for the "maybe" rows
  against only the shards they map to (file-pruned). Exactness is
  preserved — the bloom is a prefilter, never the verdict. In
  production the sidecars are executor-side broadcast variables; at
  10^10 URLs with 16 bits/key they total ~20 GB across 32 shards, so
  each executor holds only the shards its tasks touch.
- exactness of the hash key: 64-bit (pair-collision odds ~3e-9 at 1e10
  URLs); a production deployment confirms collisions against the full
  URL inside the shard — the shard rows carry ``url`` for that purpose.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEEN_SCHEMA = "url_hash bigint, url string, shard int"
BLOOM_SCHEMA = "shard int, m long, k int, bits binary"

BLOOM_BITS_PER_KEY = 16
BLOOM_K = 7  # probes; with 16 bits/key the false-positive rate ~1e-3


def shard_of(url_hash_col, n_shards: int):
    return F.pmod(url_hash_col, F.lit(n_shards)).cast("int")


def _bloom_probes(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) probe indices via double hashing on the 64-bit url_hash."""
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _bloom_build(hashes: np.ndarray, bits_per_key: int = BLOOM_BITS_PER_KEY,
                 k: int = BLOOM_K) -> tuple[int, int, bytes]:
    m = max(1024, bits_per_key * len(hashes))
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    idx = _bloom_probes(hashes, m, k).ravel()
    np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return m, k, bits.tobytes()


def _bloom_test_any(hashes: np.ndarray,
                    blooms: list[tuple[int, int, np.ndarray]]) -> np.ndarray:
    """True where a hash MIGHT be in any of the bloom filters."""
    out = np.zeros(len(hashes), dtype=bool)
    for m, k, bits in blooms:
        pending = ~out
        if not pending.any():
            break
        idx = _bloom_probes(hashes[pending], m, k)
        hit = ((bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).all(axis=1)
        out[pending] = hit
    return out


def _cuckoo_build_row(hashes: np.ndarray) -> tuple[int, int, bytes]:
    from . import cuckoo

    m, table = cuckoo.build(hashes)
    return m, cuckoo.SLOTS, table.tobytes()


def _cuckoo_test_any(hashes: np.ndarray, filters: list) -> np.ndarray:
    from . import cuckoo

    return cuckoo.test_any(hashes, filters)


# sidecar codecs: build(hashes) -> (m, k, bytes); test(hashes, rows) ->
# maybe-mask; per-kind sidecar directory. "bloom" = 16 bits/key k=7
# double-hashed bitset; "cuckoo" = the north_star's partitioned cuckoo
# filter (operators/cuckoo.py — Fan et al. 2014; supports delete).
SIDE_CODECS = {
    "bloom": (_bloom_build, _bloom_test_any, "url_seen_blooms"),
    "cuckoo": (_cuckoo_build_row, _cuckoo_test_any, "url_seen_cuckoo"),
}


class SeenFilter:
    """Parquet-backed sharded seen set with per-round append deltas."""

    def __init__(self, spark: SparkSession, workdir: str, n_shards: int = 32,
                 use_bloom: bool = False, filter_kind: str | None = None):
        if filter_kind is None and use_bloom:
            filter_kind = "bloom"
        if filter_kind is not None and filter_kind not in SIDE_CODECS:
            raise ValueError(f"unknown filter_kind {filter_kind!r}")
        self.spark = spark
        self.path = os.path.join(workdir, "url_seen")
        self.filter_kind = filter_kind
        self._build_fn, self._test_fn, side_dir = SIDE_CODECS[
            filter_kind or "bloom"
        ]
        self.bloom_path = os.path.join(workdir, side_dir)
        self.n_shards = n_shards
        self.use_bloom = filter_kind is not None
        # per-round bloom cache + its broadcast: only NEW delta rounds
        # are read from disk, and the broadcast is rebuilt only when the
        # round set changes (production: executors hold the blooms and
        # new increments stream in — reloading the full set per query
        # would dominate the fast path it exists to provide)
        self._bloom_rounds: dict[int, dict[int, list]] = {}
        self._bloom_bc = None
        self._bloom_bc_key: tuple = ()

    def _rounds(self, path: str) -> set[int]:
        if not os.path.exists(path):
            return set()
        return {
            int(name.split("=", 1)[1])
            for name in os.listdir(path)
            if name.startswith("round=")
        }

    @staticmethod
    def _has_data(path: str) -> bool:
        """True when at least one parquet data file exists under path —
        an empty delta written with partitionBy emits no files, which
        would break schema inference on the whole-tree read."""
        for root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def load(self) -> DataFrame:
        if not self._has_data(self.path):
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        # per-round deltas live in round=N/shard=K subdirs (partition
        # discovery -> shard predicates are file pruning)
        return self.spark.read.parquet(self.path).select(
            "url_hash", "url", F.col("shard").cast("int").alias("shard")
        )

    def _load_blooms(self) -> dict[int, list[tuple[int, int, np.ndarray]]] | None:
        """Per-shard bloom list, or None when sidecars don't cover every
        delta round (falling back to the exact join keeps exactness).
        Incremental: rounds already cached are not re-read."""
        rounds = self._rounds(self.path)
        if rounds != self._rounds(self.bloom_path):
            return None
        self._bloom_rounds = {
            r: v for r, v in self._bloom_rounds.items() if r in rounds
        }
        for r in sorted(rounds - set(self._bloom_rounds)):
            rp = os.path.join(self.bloom_path, f"round={r}")
            per_round: dict[int, list] = {}
            if self._has_data(rp):
                pdf = self.spark.read.schema(BLOOM_SCHEMA).parquet(rp).toPandas()
                for row in pdf.itertuples():
                    per_round.setdefault(int(row.shard), []).append(
                        (int(row.m), int(row.k),
                         np.frombuffer(row.bits, dtype=np.uint8))
                    )
            self._bloom_rounds[r] = per_round
        merged: dict[int, list] = {}
        for per_round in self._bloom_rounds.values():
            for shard, lst in per_round.items():
                merged.setdefault(shard, []).extend(lst)
        return merged

    def invalidate_cache(self) -> None:
        """Drop the in-memory per-round filter cache + broadcast — must
        be called when delta rounds are REMOVED from disk (rewind): the
        merge step unions every cached round, so a stale cached round
        would keep marking its URLs as seen."""
        self._bloom_rounds.clear()
        if self._bloom_bc is not None:
            self._bloom_bc.unpersist(blocking=False)
        self._bloom_bc = None
        self._bloom_bc_key = ()

    def _bloom_broadcast(self, blooms: dict, rounds_key: tuple):
        if self._bloom_bc is None or self._bloom_bc_key != rounds_key:
            if self._bloom_bc is not None:
                self._bloom_bc.unpersist(blocking=False)
            self._bloom_bc = self.spark.sparkContext.broadcast(blooms)
            self._bloom_bc_key = rounds_key
        return self._bloom_bc

    def anti_join(self, candidates: DataFrame, url_hash_col: str = "url_hash") -> DataFrame:
        """Rows of ``candidates`` whose url_hash is NOT in the seen set.

        Exact path: one hash-partitioned left-anti join (the seen side is
        pre-sharded on disk; bucketed Iceberg: zero seen-side shuffle).

        Bloom path (``use_bloom``): definite-new rows skip the join;
        maybe-seen rows join against only their shards (file-pruned).
        """
        if not self.use_bloom:
            seen = self.load().select(F.col("url_hash").alias("__seen_hash"))
            return candidates.join(
                seen,
                F.col(url_hash_col) == F.col("__seen_hash"),
                "left_anti",
            )

        blooms = self._load_blooms()
        if not blooms:  # no deltas yet, sidecars incomplete, or empty set
            if blooms == {} and not self._has_data(self.path):
                return candidates  # provably empty seen set
            seen = self.load().select(F.col("url_hash").alias("__seen_hash"))
            return candidates.join(
                seen, F.col(url_hash_col) == F.col("__seen_hash"), "left_anti"
            )

        n_shards = self.n_shards
        bc = self._bloom_broadcast(
            blooms, tuple(sorted(self._rounds(self.path)))
        )
        # bind the codec's test fn locally: closing over self would
        # pickle the SeenFilter (and its SparkSession) into the UDF
        test_fn = self._test_fn

        @F.pandas_udf("boolean")
        def maybe_seen(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64)
            shards = np.mod(hv, n_shards)
            out = np.zeros(len(hv), dtype=bool)
            table = bc.value
            for s in np.unique(shards):
                bl = table.get(int(s))
                if bl:
                    sel = shards == s
                    out[sel] = test_fn(hv[sel], bl)
            return pd.Series(out)

        # the bloom shrinks the candidate side to the tiny "maybe" set,
        # which unlocks a zero-shuffle topology: collect the maybe
        # hashes (callers persist `candidates` when their plan is
        # expensive), probe the shard-pruned seen scan MAP-SIDE (the
        # exact path would shuffle the full seen side), then
        # broadcast-anti the confirmed hits back onto the candidates.
        cand = candidates.withColumn("__maybe", maybe_seen(F.col(url_hash_col)))
        maybe_hashes = [
            int(r["h"])
            for r in cand.filter(F.col("__maybe"))
            .select(F.col(url_hash_col).alias("h"))
            .distinct()
            .collect()
        ]
        if not maybe_hashes:
            return cand.drop("__maybe")
        if len(maybe_hashes) > 2_000_000:
            # driver-memory guard: giant maybe sets (bloom barely
            # filtering) degrade to the plain co-partitioned anti-join
            seen = self.load().select(F.col("url_hash").alias("__seen_hash"))
            return candidates.join(
                seen, F.col(url_hash_col) == F.col("__seen_hash"), "left_anti"
            )
        touched = sorted({h % n_shards for h in maybe_hashes})
        probe = self.spark.createDataFrame(
            [(h,) for h in maybe_hashes], "url_hash bigint"
        )
        confirmed = (
            self.load()
            .filter(F.col("shard").isin(touched))
            .join(F.broadcast(probe), "url_hash", "left_semi")
            .select(F.col("url_hash").alias("__seen_hash"))
        )
        return cand.drop("__maybe").join(
            F.broadcast(confirmed),
            F.col(url_hash_col) == F.col("__seen_hash"),
            "left_anti",
        )

    def add(self, rows: DataFrame, round_no: int,
            url_hash_col: str = "url_hash", url_col: str = "url",
            assume_unique: bool = False) -> None:
        """Write this round's delta of newly-seen URLs.

        One subdir per round, overwritten (not appended) so a crashed
        round can be re-run idempotently; directory-partitioned by
        shard. With ``use_bloom``, a per-shard bloom sidecar is built
        from the written delta (one extra small job per round).

        ``assume_unique=True`` skips the defensive dropDuplicates
        exchange — for callers whose rows are unique by url_hash by
        construction (the crawl round's fresh links come out of a
        row_number window + anti-join), saving one shuffle per round.
        """
        delta = rows.select(
            F.col(url_hash_col).alias("url_hash"),
            F.col(url_col).alias("url"),
            shard_of(F.col(url_hash_col), self.n_shards).alias("shard"),
        )
        if not assume_unique:
            delta = delta.dropDuplicates(["url_hash"])
        delta = delta.repartition(self.n_shards, "shard").sortWithinPartitions(
            "url_hash"
        )
        delta_path = os.path.join(self.path, f"round={round_no}")
        delta.write.partitionBy("shard").mode("overwrite").parquet(delta_path)

        if self.use_bloom:
            build_fn = self._build_fn  # local bind — see maybe_seen

            def build(pdf: pd.DataFrame) -> pd.DataFrame:
                hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
                m, k, bits = build_fn(hashes)
                return pd.DataFrame(
                    {"shard": [int(pdf["shard"].iloc[0])], "m": [m],
                     "k": [k], "bits": [bits]}
                )

            # explicit schema: an empty delta dir has no files to infer
            # from (shard maps from the partition directories)
            written = self.spark.read.schema(SEEN_SCHEMA).parquet(delta_path)
            written.groupBy("shard").applyInPandas(
                build, schema=BLOOM_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.bloom_path, f"round={round_no}")
            )
            # this round's sidecar may have REPLACED one already cached
            # (a crashed round re-run writes different hashes under the
            # same round number): evict it and force a broadcast rebuild,
            # or the stale filter would mark the new URLs definitely-
            # unseen and re-admit them past the exact join
            if round_no in self._bloom_rounds:
                del self._bloom_rounds[round_no]
                if self._bloom_bc is not None:
                    self._bloom_bc.unpersist(blocking=False)
                self._bloom_bc = None
                self._bloom_bc_key = ()

    def count(self) -> int:
        return self.load().count()
