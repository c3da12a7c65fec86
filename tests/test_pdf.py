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
