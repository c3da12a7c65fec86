"""Charset sniff/decode tests (functions/encoding.py)."""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.encoding import decode_html, sniff_charset

DOC = "<html><body>naïve café — “quotes” höhe</body></html>"


def _cases():
    plain = "<html><body>plain ascii</body></html>"
    meta_l1 = (
        '<html><head><meta charset="ISO-8859-1"></head>'
        "<body>naïve café</body></html>"
    )
    meta_1252 = (
        "<html><head><meta http-equiv=\"Content-Type\" "
        "content=\"text/html; charset=windows-1252\"></head>"
        "<body>“quoted”</body></html>"
    )
    xml_l1 = (
        '<?xml version="1.0" encoding="iso-8859-1"?>'
        "<html><body>höhe</body></html>"
    )
    return [
        # (id, bytes, expected_charset, expected_text)
        (1, plain.encode("utf-8"), "utf-8", plain),
        (2, "﻿".encode("utf-8") + DOC.encode("utf-8"), "utf-8", DOC),
        (3, DOC.encode("utf-16-le"), "utf-8", None),  # BOM-less utf-16: undetectable
        (4, ("﻿" + DOC).encode("utf-16-le"), "utf-16le", DOC),
        (5, ("﻿" + DOC).encode("utf-16-be"), "utf-16be", DOC),
        (6, meta_l1.encode("iso-8859-1"), "windows-1252", meta_l1),  # WHATWG alias
        (7, meta_1252.encode("windows-1252"), "windows-1252", meta_1252),
        (8, xml_l1.encode("iso-8859-1"), "windows-1252", xml_l1),
        (9, b'<meta charset=BOGUS-enc><body>x</body>', "utf-8", None),
        (10, DOC.encode("utf-8"), "utf-8", DOC),  # meta-less utf-8 default
    ]


def _run(spark):
    rows = [(i, b) for i, b, _, _ in _cases()]
    df = spark.createDataFrame(rows, "id int, html binary")
    return {
        r["id"]: (r["cs"], r["txt"])
        for r in df.select(
            "id",
            sniff_charset("html").alias("cs"),
            decode_html("html").alias("txt"),
        ).collect()
    }


def test_sniff_charset_labels(spark):
    got = _run(spark)
    for i, _, want_cs, _ in _cases():
        assert got[i][0] == want_cs, (i, got[i][0])


def test_decode_html_roundtrips(spark):
    got = _run(spark)
    for i, _, _, want_txt in _cases():
        if want_txt is not None:
            assert got[i][1] == want_txt, (i, got[i][1][:60])


def test_decode_never_nulls_on_garbage(spark):
    rows = [(1, bytes([0xFF, 0xFE, 0x00])), (2, bytes(range(256))), (3, b"")]
    df = spark.createDataFrame(rows, "id int, html binary")
    out = df.select("id", decode_html("html").alias("t")).collect()
    assert all(r["t"] is not None for r in out)


def test_warc_pages_decode_integration(spark, tmp_path):
    """WARC bytes in a non-UTF-8 charset flow through sniff+decode to
    the scrape stage without a Python round-trip."""
    from datetime import datetime, timezone

    from crawl4ai_spark.functions.scrape import scrape_stage
    from crawl4ai_spark.sources.warc import warc_pages, write_warc

    doc = ('<html><head><meta charset="windows-1252"><title>t</title></head>'
           "<body>“fancy” body text here</body></html>")
    df = spark.createDataFrame(
        [("https://a.com/p1", datetime(2026, 1, 1, tzinfo=timezone.utc),
          doc.encode("windows-1252"))],
        "url string, warc_ts timestamp, payload binary",
    )
    out = str(tmp_path / "w")
    write_warc(df, out)
    pages = warc_pages(spark, out + "/*.warc.gz").select(
        "url", "warc_ts", decode_html("html").alias("html")
    )
    (r,) = scrape_stage(pages).select("text_extracted").collect()
    assert "“fancy”" in r["text_extracted"]


def test_meta_utf16_label_rewritten_to_utf8(spark):
    """WHATWG: a prescan-readable utf-16 label can't be real UTF-16 —
    decode the (actually UTF-8) bytes as UTF-8, not as mojibake."""
    doc = '<meta charset="utf-16"><body>plain ascii body</body>'
    df = spark.createDataFrame([(1, doc.encode("utf-8"))], "id int, html binary")
    (r,) = df.select(sniff_charset("html").alias("cs"),
                     decode_html("html").alias("t")).collect()
    assert r["cs"] == "utf-8"
    assert r["t"] == doc


def test_latin1_labelled_curly_quotes_decode_as_1252(spark):
    """Pages labelled iso-8859-1 with 0x93/0x94 bytes (Windows curly
    quotes) must yield the quotes, not C1 control characters."""
    raw = ('<meta charset="iso-8859-1"><body>' .encode("ascii")
           + b"\x93quoted\x94" + b"</body>")
    df = spark.createDataFrame([(1, raw)], "id int, html binary")
    (r,) = df.select(decode_html("html").alias("t")).collect()
    assert "“quoted”" in r["t"]


def test_bom_bytes_kept_for_single_byte_charsets(spark):
    """FF FE / FE FF / EF BB BF are only BOMs in the charset they
    belong to: explicitly windows-1252/latin-1 text starting with
    'ÿþ' / 'þÿ' / 'ï»¿' must keep those leading characters."""
    rows = [
        (1, "ÿþ rest".encode("windows-1252"), "windows-1252", "ÿþ rest"),
        (2, "þÿ rest".encode("iso-8859-1"), "iso-8859-1", "þÿ rest"),
        (3, "ï»¿ rest".encode("windows-1252"), "windows-1252", "ï»¿ rest"),
        # and the BOM IS still stripped for its own charset
        (4, "﻿x".encode("utf-8"), "utf-8", "x"),
        (5, "﻿x".encode("utf-16-le"), "utf-16le", "x"),
    ]
    df = spark.createDataFrame(
        [(i, b, cs) for i, b, cs, _ in rows], "id int, html binary, cs string"
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", decode_html("html", F.col("cs")).alias("t")).collect()}
    for i, _, _, want in rows:
        assert got[i] == want, (i, got[i])


def test_explicit_charset_spellings_dispatch(spark):
    doc = "höhe “x”"
    rows = [
        (1, doc.encode("utf-16-le"), "UTF-16LE"),
        (2, doc.encode("windows-1252"), "cp1252"),
        (3, doc.encode("windows-1252"), "latin-1"),  # face value: latin-1
    ]
    df = spark.createDataFrame(rows, "id int, html binary, cs string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", decode_html("html", F.col("cs")).alias("t")).collect()}
    assert got[1] == doc
    assert got[2] == doc
    assert got[3] != doc  # explicit latin-1 honored literally (C1 chars)
