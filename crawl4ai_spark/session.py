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
        # decode() malformed bytes -> U+FFFD replacement instead of a
        # task-killing MALFORMED_CHARACTER_CODING error: a crawler MUST
        # survive garbage bytes (same degradation contract as the
        # scrape stage's tolerant parser; functions/encoding.py relies
        # on this for charset-sniffed WARC payload decoding)
        .config("spark.sql.legacy.codingErrorAction", "true")
        # allow the full JVM charset set in encode/decode (Spark 4
        # whitelists 7 charsets by default): the web's second-most
        # common single-byte encoding is windows-1252, which WHATWG
        # even makes the decoder for pages LABELLED iso-8859-1
        .config("spark.sql.legacy.javaCharsets", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
