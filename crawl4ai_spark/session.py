"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB target (and harmless at test scale):

- AQE on: runtime coalescing, skew-join splitting (hot hosts in the
  frontier are Zipf-distributed — AQE splits oversized post-shuffle
  partitions that salting alone misses).
- Arrow on: every Python-side stage is an Arrow-batched pandas UDF;
  per-row Python UDFs are banned by BASELINE.json's input_hint.
- shuffle.partitions sized to cores at test scale; on a real cluster
  AQE's coalescing makes the initial number a ceiling, not a target.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Confs the ENGINE depends on that are runtime-settable (SQLConf, not
# core/JVM), so they can be applied to a session the library did not
# build. The r4 gate regression was exactly this class of bug: the
# charset decode layer worked on every repo-built session (get_spark
# sets these at build time) but failed on the driver's vanilla session.
# Anything the engine needs at runtime MUST be in this dict and applied
# via ensure_runtime_confs() from the code path that needs it.
RUNTIME_CONFS: dict[str, str] = {
    # decode() malformed bytes -> U+FFFD replacement instead of a
    # task-killing MALFORMED_CHARACTER_CODING error (crawler survives
    # garbage bytes; functions/encoding.py relies on this)
    "spark.sql.legacy.codingErrorAction": "true",
    # allow the full JVM charset set in encode/decode — Spark 4
    # whitelists 7 charsets by default, and the web's second-most
    # common single-byte encoding is windows-1252
    "spark.sql.legacy.javaCharsets": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the engine's required runtime-settable confs to ANY session.

    Idempotent and cheap (conf reads are driver-local); called from the
    charset-decode code paths (functions/encoding.py consumers) and from
    every ``__spark_entry__.queries()`` callable so a vanilla
    ``SparkSession.builder.getOrCreate()`` session — like the
    correctness driver's — behaves identically to ``get_spark()``."""
    for k, v in RUNTIME_CONFS.items():
        try:
            cur = spark.conf.get(k, None)
        except Exception:
            cur = None
        if cur != v:
            spark.conf.set(k, v)


def get_spark(
    parallelism: int | None = None,
    app_name: str = "crawl4ai_spark",
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = parallelism or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
