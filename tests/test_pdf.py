"""From-scratch PDF reader: build/parse round trips, escapes, Flate
streams, link annotations, malformed input, and the Spark stage shape
(reference processors/pdf/processor.py model)."""

from __future__ import annotations

from crawl4ai_spark.functions.pdf import (
    build_pdf,
    generate_pdfs,
    parse_pdf,
    pdf_process_stage,
)


def test_round_trip_plain():
    blob = build_pdf(["hello world", "page two here"], title="T", author="A")
    res = parse_pdf(blob)
    assert res["metadata"]["title"] == "T"
    assert res["metadata"]["author"] == "A"
    assert res["metadata"]["producer"] == "crawl4ai-spark"
    assert res["metadata"]["n_pages"] == 2
    assert res["metadata"]["encrypted"] is False
    assert [p["raw_text"] for p in res["pages"]] == [
        "hello world", "page two here",
    ]
    assert res["pages"][0]["page_number"] == 1
    assert res["pages"][1]["page_number"] == 2


def test_round_trip_flate():
    blob = build_pdf(["compressed body text"], compress=True)
    res = parse_pdf(blob)
    assert res["pages"][0]["raw_text"] == "compressed body text"


def test_string_escapes():
    tricky = r"parens () back\slash and (nested)"
    blob = build_pdf([tricky])
    assert parse_pdf(blob)["pages"][0]["raw_text"] == tricky


def test_links_and_html():
    blob = build_pdf(["cite me"], links=["https://x.example.com/a"])
    res = parse_pdf(blob)
    assert res["pages"][0]["links"] == ["https://x.example.com/a"]
    assert res["pages"][0]["html"] == (
        '<div class="pdf-page" id="page-1"><p>cite me</p></div>'
    )


def test_malformed_inputs_never_crash():
    for bad in [None, b"", b"not a pdf", b"%PDF-1.4 truncated garbage"]:
        res = parse_pdf(bad)
        assert res["pages"] == []
        assert res["metadata"]["n_pages"] == 0


def test_tj_array_operator():
    # [(a) (b)] TJ form used by many real producers
    blob = build_pdf(["placeholder"])
    blob = blob.replace(b"(placeholder) Tj", b"[(ab) -120 (cd)] TJ")
    assert parse_pdf(blob)["pages"][0]["raw_text"] == "abcd"


def test_pdf_stage_spark(spark, sf_dir):
    pdfs = generate_pdfs(spark, sf_dir)
    out = pdf_process_stage(pdfs).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    from pyspark.sql import functions as F

    # one row per page; 1 + doc_id%3 pages per doc
    want_pages = docs.select(
        F.sum(1 + F.col("doc_id") % 3).alias("s")
    ).first()["s"]
    assert out.count() == want_pages
    row = out.filter("doc_id = 4").orderBy("page_number").collect()
    assert row[0]["title"] == "Doc 4" and row[0]["n_pages"] == 2
    assert row[0]["links"] == ["https://ref4.example.com/cite"]
    assert row[1]["links"] == []
    out.unpersist()


def test_tj_and_tja_interleave_in_document_order():
    """A stream mixing Tj and TJ operators must keep document order —
    separate regex passes used to relocate all TJ text to the end."""
    stream = b"BT (Intro) Tj [(Tab)(le)] TJ (Outro) Tj ET"
    body = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(stream)).encode() + b" >> stream\n"
        + stream + b"\nendstream endobj\n%%EOF"
    )
    res = parse_pdf(body)
    assert res["pages"][0]["raw_text"] == "Intro\nTable\nOutro"


def test_contents_array_form():
    """/Contents [N 0 R ...] (array form, emitted by many generators)
    must resolve — and multi-element arrays concatenate."""
    s1, s2 = b"BT (part one) Tj ET", b"BT (part two) Tj ET"
    body = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents [4 0 R 5 0 R] >> endobj\n"
        b"4 0 obj << /Length " + str(len(s1)).encode() + b" >> stream\n"
        + s1 + b"\nendstream endobj\n"
        b"5 0 obj << /Length " + str(len(s2)).encode() + b" >> stream\n"
        + s2 + b"\nendstream endobj\n%%EOF"
    )
    res = parse_pdf(body)
    assert res["pages"][0]["raw_text"] == "part one\npart two"


def test_unterminated_tj_array_returns_fast():
    """An unterminated TJ array in a corrupt stream must not trigger
    catastrophic regex backtracking ([^\\]] also matching backslash
    made the old pattern exponential — seconds at ~28 escapes)."""
    import time

    corrupt = b"[" + b"\\(" * 600 + b" no closing bracket"
    blob = build_pdf(["x"])
    t0 = time.monotonic()
    parse_pdf(blob[:200] + corrupt)  # garbage tail; must not hang
    from crawl4ai_spark.functions.pdf import _page_text

    _page_text(corrupt)
    assert time.monotonic() - t0 < 2.0


def test_multi_link_pdf_round_trips_all_links():
    blob = build_pdf(
        ["page"], links=["http://a.example/", "http://b.example/"]
    )
    res = parse_pdf(blob)
    assert res["pages"][0]["links"] == [
        "http://a.example/", "http://b.example/",
    ]


def test_stage_emits_metadata_row_for_unparseable_blob(spark):
    """Corrupt/encrypted/non-PDF blobs stay observable: one
    metadata-only row (page_number 0) instead of vanishing."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, bytearray(b"%PDF-1.4 truncated garbage")),
         (2, bytearray(b"not a pdf at all")),
         (3, bytearray(build_pdf(["real page"])))],
        "doc_id long, pdf binary",
    )
    out = pdf_process_stage(df).toPandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["page_number"]) == [0, 0, 1]
    assert out[out["doc_id"] == 3].iloc[0]["raw_text"] == "real page"
    assert out[out["doc_id"] == 1].iloc[0]["n_pages"] == 0
