"""WARC source/sink: spec-level byte handling + distributed round-trip."""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

from pyspark.sql import functions as F

from crawl4ai_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    read_warc,
    warc_pages,
    write_warc,
)

TS = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def _recs(n=3, host="a.com"):
    return [
        {
            "url": f"https://{host}/page{i}",
            "warc_ts": TS,
            "payload": f"<html><body>doc {i}</body></html>".encode(),
            "http_status": 200,
            "content_type": "text/html; charset=utf-8",
        }
        for i in range(n)
    ]


def test_roundtrip_gzip_members():
    raw = build_warc(_recs(3))
    got = list(iter_warc_records(raw))
    assert len(got) == 3
    for i, (hdr, payload) in enumerate(got):
        assert hdr["warc-target-uri"] == f"https://a.com/page{i}"
        assert hdr["warc-type"] == "response"
        assert hdr["warc-date"] == "2026-01-02T03:04:05Z"
        assert payload.startswith(b"HTTP/1.1 200 OK")
        assert f"doc {i}".encode() in payload


def test_roundtrip_plain_and_multi_record_member():
    plain = build_warc(_recs(2), gzip_members=False)
    assert plain.startswith(b"WARC/1.0")
    assert len(list(iter_warc_records(plain))) == 2
    # several records inside ONE gzip member still iterate
    assert len(list(iter_warc_records(gzip.compress(plain)))) == 2


def test_truncated_and_garbage_tolerance():
    raw = build_warc(_recs(2), gzip_members=False)
    # truncate inside the second record's payload: first record survives
    cut = raw.find(b"page1")
    assert len(list(iter_warc_records(raw[: cut + 40]))) >= 1
    # leading garbage before the first WARC/ magic is skipped
    assert len(list(iter_warc_records(b"garbage\r\n" + raw))) == 2
    # unparseable content-length record is skipped, next record found
    bad = raw.replace(b"Content-Length: ", b"Content-Length: x", 1)
    assert len(list(iter_warc_records(bad))) == 1


def test_distributed_read_and_pages_projection(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(build_warc(_recs(4, host="a.com")))
    nonhtml = [
        {"url": "https://b.com/style.css", "warc_ts": TS,
         "payload": b"body{}", "http_status": 200, "content_type": "text/css"},
        {"url": "https://b.com/gone", "warc_ts": TS,
         "payload": b"<html>404</html>", "http_status": 404,
         "content_type": "text/html"},
    ]
    (d / "b.warc.gz").write_bytes(build_warc(_recs(2, host="b.com") + nonhtml))

    rec = read_warc(spark, str(d))
    assert rec.count() == 8
    assert set(rec.select("source_file").distinct().toPandas()["source_file"].apply(
        lambda p: p.rsplit("/", 1)[-1])) == {"a.warc.gz", "b.warc.gz"}

    pages = warc_pages(spark, str(d)).orderBy("url")
    rows = pages.collect()
    # css + 404 filtered; 4 + 2 html-200 rows remain, input_hint shape
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html"]
    assert len(rows) == 6
    assert rows[0]["url"] == "https://a.com/page0"
    assert bytes(rows[0]["html"]) == b"<html><body>doc 0</body></html>"
    assert rows[0]["warc_ts"] == TS.replace(tzinfo=None)


def test_write_then_read_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(f"https://h{i % 3}.com/page{i}", TS,
          bytearray(f"<html>{i}</html>".encode()))
         for i in range(20)],
        "url string, warc_ts timestamp, html binary",
    ).repartition(4)
    out = str(tmp_path / "sink")
    n_files = write_warc(src, out)
    assert 1 <= n_files <= 4

    back = warc_pages(spark, out)
    got = {
        (r["url"], bytes(r["html"])) for r in back.collect()
    }
    want = {
        (f"https://h{i % 3}.com/page{i}", f"<html>{i}</html>".encode())
        for i in range(20)
    }
    assert got == want
    # scrape stage consumes the round-tripped table directly
    from crawl4ai_spark.functions.scrape import scrape_stage

    scraped = scrape_stage(
        back.withColumn("html", F.decode("html", "utf-8")), "html", "url"
    )
    assert scraped.filter(F.col("success")).count() == 20


def test_write_warc_null_status_and_ctype(spark, tmp_path):
    """Rows carrying NULL http_status/content_type (routine in real
    crawl results — e.g. a failed fetch) must coalesce to defaults, not
    crash the write task (None.split / int(NaN))."""
    df = spark.createDataFrame(
        [
            ("https://a.com/ok", TS, b"<html>ok</html>", 200,
             "text/html; charset=utf-8"),
            ("https://a.com/nulls", TS, b"<html>n</html>", None, None),
        ],
        "url string, warc_ts timestamp, payload binary, "
        "http_status int, content_type string",
    ).coalesce(1)
    out = str(tmp_path / "w")
    assert write_warc(df, out, cdx_sidecar=True) == 1
    rows = {r["url"]: r for r in read_warc(spark, out + "/*.warc.gz").collect()}
    assert rows["https://a.com/nulls"]["http_status"] == 200
    assert rows["https://a.com/nulls"]["content_type"] == "text/html"
    assert rows["https://a.com/ok"]["content_type"].startswith("text/html")


def test_cdx_sidecar_and_ranged_fetch(spark, tmp_path):
    """write_warc(cdx_sidecar=True) output is self-indexing: the CDXJ
    shards drive fetch_warc_ranges straight to the member bytes."""
    from crawl4ai_spark.sources.cdx import read_cdxj
    from crawl4ai_spark.sources.warc import fetch_warc_ranges

    src = spark.createDataFrame(
        [(f"https://h{i % 3}.com/page{i}", TS,
          bytearray(f"<html>range {i}</html>".encode()))
         for i in range(30)],
        "url string, warc_ts timestamp, html binary",
    ).repartition(3)
    out = str(tmp_path / "arch")
    write_warc(src, out, cdx_sidecar=True)

    idx = read_cdxj(spark, out + "/*.cdxj")
    assert idx.count() == 30
    assert idx.filter("offset is null or length is null").count() == 0

    # fetch only a subset via pointers — no full-archive scan semantics
    some = idx.filter(F.col("url").endswith("1") | F.col("url").endswith("7"))
    got = {
        (r["url"], bytes(r["html"])) for r in
        fetch_warc_ranges(some, out).collect()
    }
    want = {
        (f"https://h{i % 3}.com/page{i}", f"<html>range {i}</html>".encode())
        for i in range(30) if str(i).endswith(("1", "7"))
    }
    assert got == want
    # timestamps survive the pointer round-trip
    ts = fetch_warc_ranges(some, out).select("warc_ts").distinct().collect()
    assert [r["warc_ts"] for r in ts] == [TS.replace(tzinfo=None)]


def test_crawl_over_warc_archive_matches_parquet_pages(spark, sf_dir, tmp_path):
    """End-to-end cohesion: archive the synthetic corpus as WARC, read
    it back with warc_pages, and run the SAME 2-round crawl over both
    the original pages table and the archive — identical results."""
    import tempfile

    from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, sf_dir)
    arch = str(tmp_path / "corpus_warc")
    write_warc(pages.select("url", "warc_ts", "html"), arch)
    pages_back = warc_pages(spark, arch)

    seeds = [r["url"] for r in pages.select("url").orderBy("url").limit(3).collect()]
    cols = ["url", "round", "depth", "success", "n_links"]
    runs = {}
    for name, tbl in (("parquet", pages), ("warc", pages_back)):
        wd = str(tmp_path / name)
        cfg = CrawlConfig(max_depth=2, round_seconds=1e6)
        ms = run_crawl(spark, tbl, seeds, wd, cfg, max_rounds=2)
        res = CrawlRun(spark, tbl, wd, cfg).results()
        runs[name] = (
            [{k: v for k, v in m.items() if k not in ("wall_s", "config")} for m in ms],
            sorted(map(tuple, res.select(*cols).collect())),
        )
    assert runs["warc"] == runs["parquet"]
    assert runs["warc"][0][-1]["fetched_ok"] > 0


# ------------------------------------------------------------------ WET


def test_wet_record_bytes_are_conversion_text_plain():
    from crawl4ai_spark.sources.warc import build_warc

    blob = build_warc(
        [
            {
                "url": "https://a.com/p",
                "warc_ts": TS,
                "warc_type": "conversion",
                "warc_content_type": "text/plain",
                "payload": "extracted text here".encode(),
            }
        ]
    )
    ((headers, payload),) = list(iter_warc_records(blob))
    assert headers["warc-type"] == "conversion"
    assert headers["content-type"] == "text/plain"
    assert payload == b"extracted text here"


def test_wet_write_read_roundtrip(spark, tmp_path):
    from crawl4ai_spark.sources.warc import wet_text, write_wet

    rows = [
        (f"https://a.com/p{i}", TS, f"doc {i} text with words")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet")
    n_files = write_wet(df.repartition(3), out)
    assert 1 <= n_files <= 3
    back = wet_text(spark, out + "/*.warc.wet.gz")
    a = sorted((r["url"], r["text"]) for r in back.collect())
    b = sorted((u, t) for u, _, t in rows)
    assert a == b
    # timestamps survive the UTC round-trip
    assert back.select(F.min("warc_ts")).first()[0] == TS.replace(tzinfo=None)


def test_scrape_to_wet_to_dedup_pipeline(spark, tmp_path):
    """The intended flow: scrape pages -> write WET -> text-side
    operators read WET without touching HTML again."""
    from crawl4ai_spark.functions.scrape import scrape_stage
    from crawl4ai_spark.operators.dedup import exact_dedup
    from crawl4ai_spark.sources.warc import wet_text, write_wet
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, "/root/testdata/sf0.001").limit(50)
    scraped = scrape_stage(pages).select(
        "url", "warc_ts", F.col("text_extracted").alias("text")
    )
    out = str(tmp_path / "wet2")
    write_wet(scraped, out)
    texts = wet_text(spark, out + "/*.warc.wet.gz")
    assert texts.count() == 50
    kept = exact_dedup(texts, "text", "url")
    assert kept.count() <= 50 and kept.count() > 0


def test_lf_only_record_wrapping_crlf_http_payload():
    """An LF-only WARC header block whose payload is a normal CRLF HTTP
    response must split at its own \\n\\n, not at the payload's
    \\r\\n\\r\\n (earliest-separator rule)."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: 9\r\n\r\n<p>ok</p>"
    )
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: https://x.test/a\n"
        b"Content-Type: application/http;msgtype=response\n"
        + f"Content-Length: {len(http)}\n\n".encode()
        + http
        + b"\n\n"
    )
    got = list(iter_warc_records(rec))
    assert len(got) == 1
    headers, payload = got[0]
    assert headers["warc-target-uri"] == "https://x.test/a"
    # the WARC headers must NOT have swallowed the HTTP head
    assert "content-type" in headers
    assert headers["content-type"].startswith("application/http")
    assert payload == http
    from crawl4ai_spark.sources.warc import _split_http_payload

    status, ctype, body = _split_http_payload(payload)
    assert (status, body) == (200, b"<p>ok</p>")
    # and the mirrored case: LF-only HTTP head, body containing CRLFCRLF
    lf_http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\nA\r\n\r\nB"
    status, _, body = _split_http_payload(lf_http)
    assert (status, body) == (200, b"A\r\n\r\nB")


def test_cdx_sidecar_tolerates_null_warc_ts(spark, tmp_path):
    """A null warc_ts row must not kill the CDXJ sidecar write (pandas
    NaT passes 'is not None' but NaT.strftime raises)."""
    from crawl4ai_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [
            ("https://x.test/a", None, b"<p>a</p>"),
            ("https://x.test/b",
             datetime(2024, 1, 2, tzinfo=timezone.utc), b"<p>b</p>"),
        ],
        "url string, warc_ts timestamp, payload binary",
    )
    out = str(tmp_path / "arch")
    write_warc(df, out, cdx_sidecar=True)
    import glob as _glob

    lines = []
    for p in _glob.glob(out + "/*.cdxj"):
        lines += open(p).read().splitlines()
    assert len(lines) == 2  # both rows indexed, null ts included
