"""WARC source/sink: read Common-Crawl-style archives into the pages
table; write crawl results back out as standards-shaped archives.

The engine's input_hint table is "Common-Crawl-style web pages" — and
Common Crawl ships as WARC (ISO 28500: WARC/1.x records, usually one
gzip member per record so archives stay seekable/splittable by member).
This module implements the format from the public spec with stdlib
gzip/zlib only:

- :func:`iter_warc_records` — pure-Python record iterator over raw or
  (multi-member) gzip bytes; tolerant of LF-only headers and truncated
  tails (a real crawl archive's failure mode — bad records are skipped,
  not fatal, mirroring how the scrape stage degrades on bad markup).
- :func:`read_warc` — the distributed reader: ``binaryFile`` scan (one
  ~1 GB .warc.gz per task, the standard CC processing grain; at 100 TB
  that is ~100k files = ~100k tasks, embarrassingly parallel, zero
  shuffle) exploded into records via one Arrow-batched mapInPandas.
- :func:`warc_pages` — response records filtered to HTML, projected to
  the input_hint pages shape (url, warc_ts, html) ready for the scrape/
  quality/dedup pipeline.
- :func:`build_warc` / :func:`write_warc` — the sink: per-partition
  archive files (one gzip member per record), so crawl results are
  interchange-ready; round-trips through the reader byte-identically.

No reference counterpart (crawl4ai fetches live pages); this is part of
the training-data-pipeline surface the rebuild adds.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "url string, warc_ts timestamp, warc_type string, record_id string, "
    "http_status int, content_type string, payload binary, source_file string"
)


def _coalesce(value, default):
    """``value`` unless it is None or NaN (pandas hands nulls through as
    either, and a float NaN is the only value where x != x)."""
    if value is None or value != value:
        return default
    return value


# ---------------------------------------------------------------------------
# byte-level format
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member (CC writes one
    record per member). Truncated final members yield what they have."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
            out += d.flush()
        except zlib.error:
            return
        yield out
        if not d.unused_data:
            return
        pos = n - len(d.unused_data)


def _parse_header_block(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _iter_records_plain(data: bytes):
    """Records out of one uncompressed WARC stream."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        # EARLIEST of the two separators: preferring \r\n\r\n anywhere
        # would let an LF-only record wrapping a CRLF HTTP payload
        # split at the payload's header end instead of its own
        crlf = data.find(b"\r\n\r\n", start)
        lf = data.find(b"\n\n", start)
        if crlf < 0 and lf < 0:
            return
        if lf < 0 or (0 <= crlf <= lf):
            hdr_end, sep = crlf, 4
        else:
            hdr_end, sep = lf, 2
        headers = _parse_header_block(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + sep  # unparseable record: resync on next WARC/
            continue
        body_start = hdr_end + sep
        body = data[body_start : body_start + length]
        if len(body) < length:  # truncated tail
            return
        yield headers, body
        pos = body_start + length


def iter_warc_records(data: bytes):
    """Yield (warc_headers: dict, payload: bytes) from raw or gzip WARC
    bytes. Gzip archives may hold one record per member (the CC layout)
    or several; both iterate correctly."""
    if data[:2] == b"\x1f\x8b":
        for member in _gunzip_members(data):
            yield from _iter_records_plain(member)
    else:
        yield from _iter_records_plain(data)


def _split_http_payload(payload: bytes) -> tuple[int | None, str, bytes]:
    """(status, content_type, body) from an application/http payload.

    Splits at the EARLIEST header terminator: an LF-only HTTP head
    whose HTML body happens to contain \\r\\n\\r\\n must cut at its own
    \\n\\n, not inside the body."""
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf < 0 and lf < 0:
        return None, "", payload
    if lf < 0 or (0 <= crlf <= lf):
        cut, seplen = crlf, 4
    else:
        cut, seplen = lf, 2
    head, body = payload[:cut], payload[cut + seplen:]
    lines = head.split(b"\n")
    status = None
    first = lines[0].rstrip(b"\r")
    if first.startswith(b"HTTP/"):
        parts = first.split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = _parse_header_block(head).get("content-type", "")
    return status, ctype, body


def _parse_warc_date(s: str):
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def build_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Serialize records (url, warc_ts: datetime, warc_type, payload:
    bytes, optional http_status/content_type for response records) into
    WARC bytes — one gzip member per record in the CC layout."""
    return build_warc_indexed(records, gzip_members)[0]


def build_warc_indexed(
    records: list[dict], gzip_members: bool = True
) -> tuple[bytes, list[dict]]:
    """build_warc plus the capture index: per record the (offset,
    length) of its gzip member inside the archive — the fields a CDXJ
    line needs for ranged fetches."""
    out = io.BytesIO()
    index: list[dict] = []
    for i, r in enumerate(records):
        wtype = r.get("warc_type", "response")
        ts = r.get("warc_ts")
        if ts is None or ts != ts:  # None or pandas NaT (NaT != NaT)
            date = "1970-01-01T00:00:00Z"
        else:
            # Arrow hands session-UTC timestamps to workers tz-naive
            if ts.tzinfo is not None:
                ts = ts.astimezone(timezone.utc)
            date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        payload = r.get("payload", b"")
        # coalesce, don't dict-get: real crawl rows routinely carry the
        # KEY with a null/NaN value (dict-get defaults only cover a
        # missing key)
        status = _coalesce(r.get("http_status"), 200)
        ctype = _coalesce(r.get("content_type"), "text/html")
        if wtype == "response" and not payload.startswith(b"HTTP/"):
            status = int(status)
            payload = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
        rid = r.get("record_id") or f"<urn:uuid:{i:032x}>"
        rec_ctype = r.get(
            "warc_content_type", "application/http;msgtype=response"
        )
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {r.get('url', '')}\r\n"
            f"Content-Type: {rec_ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1")
        rec = head + payload + b"\r\n\r\n"
        blob = gzip.compress(rec, mtime=0) if gzip_members else rec
        index.append(
            {
                "url": r.get("url", ""),
                # the normalized value, or None: pandas NaT is "not
                # None" but NaT.strftime raises, which would kill the
                # CDXJ sidecar write AFTER the archive published
                "warc_ts": None if (ts is None or ts != ts) else ts,
                "status": _coalesce(r.get("http_status"), 200),
                "mime": str(ctype).split(";")[0],
                "offset": out.tell(),
                "length": len(blob),
            }
        )
        out.write(blob)
    return out.getvalue(), index


# ---------------------------------------------------------------------------
# distributed reader / writer
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` (glob), one row per record.

    Plan: binaryFile scan → one mapInPandas explode. Each task handles
    whole archive files (CC's ~1 GB grain) — no shuffle; downstream
    repartitioning is the consumer's choice.
    """
    import pandas as pd

    def explode(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "url", "warc_ts", "warc_type", "record_id", "http_status",
                "content_type", "payload", "source_file",
            )}
            for path_, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in iter_warc_records(bytes(content)):
                    wtype = headers.get("warc-type", "")
                    if headers.get("content-type", "").startswith(
                        "application/http"
                    ):
                        status, ctype, body = _split_http_payload(payload)
                    else:
                        # non-http record (conversion/warcinfo/...):
                        # surface the WARC header's own content type
                        status, body = None, payload
                        ctype = headers.get("content-type", "")
                    rows["url"].append(headers.get("warc-target-uri"))
                    rows["warc_ts"].append(
                        _parse_warc_date(headers.get("warc-date", ""))
                    )
                    rows["warc_type"].append(wtype)
                    rows["record_id"].append(headers.get("warc-record-id"))
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["payload"].append(body)
                    rows["source_file"].append(path_)
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(explode, WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Input-hint pages projection: successful HTML response records →
    (url, warc_ts, html binary). Feed straight into scrape/dedup."""
    rec = read_warc(spark, path)
    return (
        rec.filter(
            (F.col("warc_type") == "response")
            & F.col("url").isNotNull()
            & (F.col("http_status") == 200)
            & F.col("content_type").contains("text/html")
        )
        .select("url", "warc_ts", F.col("payload").alias("html"))
    )


def _write_archives(
    df: DataFrame,
    out_dir: str,
    prefix: str,
    suffix: str,
    row_to_record,
    cdx_sidecar: bool = False,
) -> int:
    """Shared per-partition archive sink (write_warc / write_wet):
    executor-side files, one per non-empty partition — the same
    pattern as a parquet write; on a cluster ``out_dir`` is shared
    storage. ``row_to_record`` maps a pandas row to a build_warc
    record dict. Returns the number of files written."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches):
        from pyspark import TaskContext

        recs: list[dict] = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs.append(row_to_record(row))
        if recs:
            ctx = TaskContext.get()
            pid = ctx.partitionId()
            # task-attempt temp + atomic rename: a retried/speculative
            # attempt may run concurrently with the original on the
            # same partition id — writing the final path directly from
            # both would interleave. os.replace makes last-commit-wins
            # atomic (same rule as Spark's file committers).
            attempt = ctx.taskAttemptId()
            base = f"{prefix}-{pid:05d}{suffix}"
            fname = os.path.join(out_dir, base)
            tmp = f"{fname}.attempt-{attempt}.tmp"
            blob, index = build_warc_indexed(recs)
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, fname)
            if cdx_sidecar:
                from .cdx import build_cdxj

                for r in index:
                    r["filename"] = base
                cdx_final = fname[: -len(suffix)] + ".cdxj"
                cdx_tmp = f"{cdx_final}.attempt-{attempt}.tmp"
                with open(cdx_tmp, "w") as f:
                    f.write(build_cdxj(index))
                os.replace(cdx_tmp, cdx_final)
            yield pd.DataFrame({"file": [fname], "n_records": [len(recs)]})

    manifest = df.mapInPandas(dump, "file string, n_records long")
    return manifest.count()


def write_warc(
    df: DataFrame, out_dir: str, prefix: str = "part",
    cdx_sidecar: bool = False,
) -> int:
    """Write (url, warc_ts, html|payload, [http_status, content_type])
    rows as per-partition ``.warc.gz`` files (one gzip member per
    record — the CC layout). Returns the number of files written.

    With ``cdx_sidecar`` each archive also gets a ``.cdxj`` index
    shard carrying (filename, offset, length) per capture, making the
    output directly servable to :func:`fetch_warc_ranges` /
    :mod:`.cdx`.
    """
    cols = df.columns
    body_col = "payload" if "payload" in cols else "html"

    def to_record(row):
        # coalesce row VALUES, not just missing keys: crawl results
        # routinely carry http_status/content_type as null (pandas None
        # or NaN), and int(NaN) / None.split would kill the write task
        return {
            "url": row["url"],
            "warc_ts": row["warc_ts"],
            "payload": bytes(row[body_col]),
            "http_status": int(
                _coalesce(row["http_status"] if "http_status" in cols else None, 200)
            ),
            "content_type": _coalesce(
                row["content_type"] if "content_type" in cols else None,
                "text/html",
            ),
        }

    return _write_archives(
        df, out_dir, prefix, ".warc.gz", to_record, cdx_sidecar=cdx_sidecar
    )


def fetch_warc_ranges(
    captures: DataFrame, base_dir: str, n_tasks: int | None = None
) -> DataFrame:
    """Ranged fetch: resolve CDX capture pointers (filename, offset,
    length) to page bodies without scanning whole archives.

    This is the access pattern CC-scale storage serves (HTTP Range
    requests against the archive objects): captures are co-located by
    archive file and ordered by offset, so each task streams forward
    through one region of one file. Input columns: url, filename,
    offset, length (``cdx.read_cdxj`` / ``cdx_cc_index`` shape).
    Returns (url, warc_ts, html).
    """
    import os

    import pandas as pd

    spark = captures.sparkSession
    n = n_tasks or spark.sparkContext.defaultParallelism

    def fetch(batches):
        handle = {"name": None, "fp": None}

        def read_range(fname: str, offset: int, length: int) -> bytes:
            if handle["name"] != fname:
                if handle["fp"] is not None:
                    handle["fp"].close()
                handle["fp"] = open(os.path.join(base_dir, fname), "rb")
                handle["name"] = fname
            handle["fp"].seek(offset)
            return handle["fp"].read(length)

        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": []}
            for _, row in pdf.iterrows():
                blob = read_range(
                    row["filename"], int(row["offset"]), int(row["length"])
                )
                for headers, payload in iter_warc_records(blob):
                    _status, _ctype, body = _split_http_payload(payload)
                    rows["url"].append(headers.get("warc-target-uri"))
                    rows["warc_ts"].append(
                        _parse_warc_date(headers.get("warc-date", ""))
                    )
                    rows["html"].append(body)
                    break  # one capture per pointer
            yield pd.DataFrame(rows)
        if handle["fp"] is not None:
            handle["fp"].close()

    return (
        captures.select("url", "filename", "offset", "length")
        .repartition(n, "filename")
        .sortWithinPartitions("filename", "offset")
        .mapInPandas(fetch, "url string, warc_ts timestamp, html binary")
    )


# ---------------------------------------------------------------------------
# WET (extracted-text conversion archives — CC's *.warc.wet.gz layout)
# ---------------------------------------------------------------------------

def write_wet(df: DataFrame, out_dir: str, prefix: str = "part") -> int:
    """Write (url, warc_ts, text) rows as WET archives — WARC files of
    ``WARC-Type: conversion`` / ``Content-Type: text/plain`` records,
    one gzip member per record, ``.warc.wet.gz`` per partition.

    WET is Common Crawl's extracted-text distribution (ISO 28500 §6.8
    conversion records): the natural OUTPUT format for this engine's
    scrape stage (text_extracted) and the natural INPUT for every
    text-side operator (dedup, LM, quality) when a consumer wants to
    skip HTML. Shares :func:`write_warc`'s per-partition sink — no
    shuffle, no driver bytes.
    """

    def to_record(row):
        return {
            "url": row["url"],
            "warc_ts": row["warc_ts"],
            "warc_type": "conversion",
            "warc_content_type": "text/plain",
            "payload": (row["text"] or "").encode("utf-8"),
        }

    return _write_archives(
        df.select("url", "warc_ts", "text"),
        out_dir,
        prefix,
        ".warc.wet.gz",
        to_record,
    )


def wet_text(spark: SparkSession, path: str) -> DataFrame:
    """Read WET archives back as (url, warc_ts, text) — the text-side
    twin of :func:`warc_pages`. The binary payload decodes as UTF-8
    JVM-side (cast, no Python)."""
    rec = read_warc(spark, path)
    return (
        rec.filter(
            (F.col("warc_type") == "conversion") & F.col("url").isNotNull()
        )
        .select("url", "warc_ts", F.col("payload").cast("string").alias("text"))
    )
