"""CDXJ CC-index source: SURT keys, shard parsing, seeder integration."""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

from crawl4ai_spark.sources.cdx import (
    build_cdxj,
    cdx_cc_index,
    read_cdxj,
    surt_key,
)
from crawl4ai_spark.sources.seeder import seed_urls

T1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
T2 = datetime(2026, 2, 1, tzinfo=timezone.utc)


def test_surt_key_convention():
    assert surt_key("https://www.Example.COM/Path?b=2") == (
        "com,example,www)/path?b=2"
    )
    assert surt_key("http://a.b.c.org/") == "org,c,b,a)/"
    assert surt_key("https://example.com") == "com,example)/"


def _shard_records():
    return [
        {"url": "https://a.com/page1", "warc_ts": T1, "mime": "text/html",
         "status": 200, "digest": "D1", "filename": "f.warc.gz",
         "offset": 0, "length": 100},
        # recrawl of page1: later capture must win in cdx_cc_index
        {"url": "https://a.com/page1", "warc_ts": T2, "mime": "text/html",
         "status": 200, "digest": "D1b", "filename": "g.warc.gz",
         "offset": 5, "length": 120},
        {"url": "https://a.com/page2", "warc_ts": T1, "mime": "text/html",
         "status": 200, "digest": "D2"},
        {"url": "https://a.com/missing", "warc_ts": T1, "mime": "text/html",
         "status": 404, "digest": "D3"},
        {"url": "https://a.com/app.js", "warc_ts": T1,
         "mime": "application/javascript", "status": 200, "digest": "D4"},
    ]


def test_read_cdxj_shards(spark, tmp_path):
    d = tmp_path / "idx"
    d.mkdir()
    recs = _shard_records()
    (d / "cdx-00000.gz").write_bytes(gzip.compress(
        build_cdxj(recs[:3]).encode()))
    # second shard plain-text + a truncated garbage tail line
    (d / "cdx-00001").write_text(build_cdxj(recs[3:]) + "com,a)/bad 2026")

    out = read_cdxj(spark, str(d))
    rows = {(r["url"], r["status"], r["digest"]) for r in out.collect()}
    assert rows == {
        ("https://a.com/page1", 200, "D1"),
        ("https://a.com/page1", 200, "D1b"),
        ("https://a.com/page2", 200, "D2"),
        ("https://a.com/missing", 404, "D3"),
        ("https://a.com/app.js", 200, "D4"),
    }
    surts = {r["surt"] for r in out.collect()}
    assert "com,a)/page1" in surts


def test_cc_index_latest_capture_and_seeder(spark, tmp_path):
    d = tmp_path / "idx"
    d.mkdir()
    (d / "cdx-00000").write_text(build_cdxj(_shard_records()))
    idx = cdx_cc_index(spark, str(d))
    rows = {r["url"]: r for r in idx.collect()}
    # non-200 and non-html dropped; latest capture of page1 won
    assert set(rows) == {"https://a.com/page1", "https://a.com/page2"}
    assert rows["https://a.com/page1"]["digest"] == "D1b"
    assert rows["https://a.com/page1"]["filename"] == "g.warc.gz"

    seeded = seed_urls(spark, cc_index=idx, domain="a.com")
    assert {r["url"] for r in seeded.collect()} == {
        "https://a.com/page1", "https://a.com/page2"
    }


def test_cc_index_tied_timestamps_pick_one_capture_consistently(spark, tmp_path):
    """Two captures sharing a warc_ts (CDX stamps are second-granular)
    must resolve to ONE capture's (digest, filename, offset, length)
    as a unit — independent per-column max_by calls could stitch
    filename from capture A onto offsets from capture B, a corrupt
    archive pointer. The struct tie-break is also deterministic."""
    recs = [
        {"url": "https://a.com/p", "warc_ts": T1, "mime": "text/html",
         "status": 200, "digest": "DA", "filename": "a.warc.gz",
         "offset": 10, "length": 100},
        {"url": "https://a.com/p", "warc_ts": T1, "mime": "text/html",
         "status": 200, "digest": "DB", "filename": "b.warc.gz",
         "offset": 20, "length": 200},
    ]
    d = tmp_path / "idx"
    d.mkdir()
    (d / "cdx-0").write_text(build_cdxj(recs))
    rows = []
    for _ in range(3):  # repeated runs must agree (deterministic)
        r = cdx_cc_index(spark, str(d)).collect()[0]
        rows.append((r["digest"], r["filename"], r["offset"], r["length"]))
    assert len(set(rows)) == 1
    # the winning pointer is one capture VERBATIM, never a mix
    assert rows[0] in {("DA", "a.warc.gz", 10, 100),
                       ("DB", "b.warc.gz", 20, 200)}
