"""HeadPeekr meta-tag semantics (F8) — reference utils.py
extract_meta_tags / HeadPeekr scoring dict behavior."""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.headpeek import meta_value, relevance_document


def _one(spark, head, col):
    return (
        spark.createDataFrame([(head,)], "head string")
        .select(col.alias("v"))
        .collect()[0]["v"]
    )


def test_contentless_meta_does_not_shadow_earlier_value(spark):
    """The reference dict only stores tags WITH a content attribute
    (extract_meta_tags skips on no content match): a later bare
    <meta name=...> must not shadow the real description."""
    head = (
        '<head><meta name="description" content="Good text">'
        '<meta name="description"></head>'
    )
    assert _one(spark, head, meta_value("head", "description")) == "Good text"
    # last WITH-content still wins among real values
    head2 = (
        '<head><meta name="description" content="first">'
        '<meta name="description" content="second"></head>'
    )
    assert _one(spark, head2, meta_value("head", "description")) == "second"


def test_relevance_document_dedups_meta_keys(spark):
    """The reference joins meta DICT values (one per key, last wins):
    duplicate keys must not double their terms' BM25 tf."""
    head = (
        "<head><title>t</title>"
        '<meta name="keywords" content="spark spark">'
        '<meta name="keywords" content="spark spark">'
        '<meta name="other" content="unique"></head>'
    )
    doc = _one(spark, head, relevance_document("head"))
    # kw slot contributes 'spark spark' once; the all-values slot keeps
    # ONE keywords entry (4 total) — without dedup it would be 6
    assert doc.count("spark") == 4
    assert "unique" in doc
