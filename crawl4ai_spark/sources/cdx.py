"""CDXJ Common-Crawl index source: the file-level twin of the seeder's
CC API scan.

The reference seeder streams ``index.commoncrawl.org/<id>-index?...``
JSON lines (async_url_seeder.py:708-760) — one record per capture with
``{"url", "mime", "status", "digest", "filename", "offset", "length"}``.
At batch scale the same data ships as the index's own CDXJ shard files
(``cdx-NNNNN.gz``), one line per capture:

    <SURT key> <14-digit timestamp> <JSON>

This module reads those shards declaratively: ``spark.read.text`` over
the (gzip) shards — one whole file per task, the same grain as the WARC
reader — then a 3-way JVM split + ``from_json``; no Python in the scan.
``cdx_cc_index`` yields the (url, ...) table the seeder's ``cc_index=``
parameter consumes, pre-filtered the way the reference's CC scan is
used (dedup + pattern happen inside ``seed_urls``).

``surt_key``/``build_cdxj`` implement the SURT convention (scheme
dropped, host labels reversed and comma-joined, lowercased) for tests
and for writing index sidecars next to ``write_warc`` output.
"""

from __future__ import annotations

import json
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "filename string, offset string, length string, languages string"
)


def surt_key(url: str) -> str:
    """Sort-friendly URL key (SURT): reversed host + path, lowercased."""
    p = urlparse(url)
    host = (p.hostname or "").lower()
    rev = ",".join(reversed(host.split("."))) if host else ""
    path = p.path or "/"
    q = f"?{p.query}" if p.query else ""
    return f"{rev}){path}{q}".lower()


def build_cdxj(records: list[dict]) -> str:
    """Serialize capture records to CDXJ text (for tests / sidecars).

    Each record: url (required), warc_ts (datetime, optional), plus any
    of mime/status/digest/filename/offset/length.
    """
    lines = []
    for r in records:
        ts = r.get("warc_ts")
        stamp = ts.strftime("%Y%m%d%H%M%S") if ts is not None else "19700101000000"
        payload = {"url": r["url"]}
        for k in ("mime", "status", "digest", "filename", "offset",
                  "length", "languages"):
            if k in r and r[k] is not None:
                payload[k] = str(r[k])
        lines.append(f"{surt_key(r['url'])} {stamp} {json.dumps(payload)}")
    return "\n".join(lines) + ("\n" if lines else "")


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """All capture records under ``path`` (text or .gz shards).

    Columns: surt string, warc_ts timestamp, url, mime, status int,
    digest, filename, offset long, length long, languages. Malformed
    lines yield null url and are dropped (a real index shard's failure
    mode is a truncated tail line).
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 3)
    # F.get (not []): a truncated tail line has < 3 fields and ANSI
    # indexing would fail the whole scan — nulls drop below instead
    rec = F.from_json(F.get(parts, 2), CDX_JSON_SCHEMA)
    return (
        lines.select(
            parts[0].alias("surt"),
            F.try_to_timestamp(F.get(parts, 1), F.lit("yyyyMMddHHmmss")).alias(
                "warc_ts"
            ),
            rec.alias("_r"),
        )
        .select(
            "surt",
            "warc_ts",
            F.col("_r.url").alias("url"),
            F.col("_r.mime").alias("mime"),
            F.col("_r.status").cast("int").alias("status"),
            F.col("_r.digest").alias("digest"),
            F.col("_r.filename").alias("filename"),
            F.col("_r.offset").cast("long").alias("offset"),
            F.col("_r.length").cast("long").alias("length"),
            F.col("_r.languages").alias("languages"),
        )
        .filter(F.col("url").isNotNull())
    )


def cdx_cc_index(
    spark: SparkSession,
    path: str,
    statuses: tuple = (200,),
    mime_prefix: str = "text/html",
) -> DataFrame:
    """Seed-ready CC index table for ``seed_urls(cc_index=...)``:
    successful HTML captures, latest capture per URL (CC shards carry
    one line per CAPTURE — max_by(warc_ts) collapses recrawls so the
    seeder's dropDuplicates sees one candidate per URL)."""
    rec = read_cdxj(spark, path).filter(
        F.col("status").isin(list(statuses))
        & F.col("mime").startswith(mime_prefix)
    )
    # ONE max_by over a struct: independent per-column max_by calls
    # resolve warc_ts ties independently (Spark documents the
    # tie-break as non-deterministic), which could stitch filename
    # from capture A onto offset/length from capture B — a corrupt
    # archive pointer. The struct keys the tie deterministically too
    # (ts, then digest/filename/offset) so reruns pick the same capture.
    best = F.max_by(
        F.struct("digest", "filename", "offset", "length"),
        F.struct("warc_ts", "digest", "filename", "offset"),
    ).alias("_best")
    return (
        rec.groupBy("url")
        .agg(F.max("warc_ts").alias("warc_ts"), best)
        .select(
            "url", "warc_ts",
            F.col("_best.digest").alias("digest"),
            F.col("_best.filename").alias("filename"),
            F.col("_best.offset").alias("offset"),
            F.col("_best.length").alias("length"),
        )
    )
