"""Text functions + regex entity extraction tests."""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.entities import extract_entities, matches
from crawl4ai_spark.functions.text import (
    content_hash,
    doc_fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
    tokens,
)

SAMPLE = (
    "Contact us at team@example.com or +1 (555) 123-4567. "
    "Visit https://example.com/about on 2024-01-15 at 14:30. "
    "Discount: 25% off, only $19.99! Color #FF5733 ships to 94105."
)


def test_tokens_and_count(spark):
    df = spark.createDataFrame([("Hello, World! Foo-bar baz",)], ["text"])
    row = df.select(
        tokens("text").alias("t"), token_count("text").alias("n")
    ).first()
    assert row["t"] == ["hello", "world", "foo", "bar", "baz"]
    assert row["n"] == 5


def test_entity_extraction(spark):
    df = spark.createDataFrame([(1, SAMPLE)], ["doc_id", "text"])
    out = extract_entities(
        df, "text", ["email", "url", "date_iso", "percentage", "currency",
                     "time_24h", "html_color_hex", "postal_us"], ["doc_id"]
    )
    got = {(r["label"], r["value"]) for r in out.collect()}
    assert ("email", "team@example.com") in got
    assert ("date_iso", "2024-01-15") in got
    assert ("percentage", "25%") in got
    assert ("currency", "$19.99") in got
    assert ("time_24h", "14:30") in got
    assert ("html_color_hex", "#FF5733") in got
    assert any(l == "url" and v.startswith("https://example.com/about") for l, v in got)


def test_entity_case_insensitive(spark):
    df = spark.createDataFrame([("COLOR #ff5733 AND #AABBCC",)], ["text"])
    vals = df.select(matches("text", "html_color_hex").alias("m")).first()["m"]
    assert vals == ["#ff5733", "#AABBCC"]


def test_lang_id(spark):
    rows = [
        ("the cat sat on the mat and it was happy", "en"),
        ("der Hund und die Katze sind nicht da", "de"),
        ("le chat est dans la maison avec nous", "fr"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(rows, ["text", "expected"])
    for r in df.select("expected", lang_id("text").alias("got")).collect():
        assert r["got"] == r["expected"]


def test_quality_score_ordering(spark):
    good = (
        "The quick brown fox jumps over the lazy dog near the quiet river "
        "bank and the old stone bridge that was built in the last century "
        "by local workers who carried heavy stones for many long days."
    )
    bad = "CLICK HERE!!! BUY NOW!!! $$$ WIN WIN WIN 100% FREE !!!"
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "text"])
    got = {r["id"]: r["q"] for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert got[1] > 0.8
    assert got[2] < 0.6
    assert got[1] > got[2]


def test_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([("a b c d",), ("a b c d",), ("x y z w",)], ["text"])
    rows = df.select(
        shingles("text", 2).alias("sh"), doc_fingerprint("text").alias("fp")
    ).collect()
    assert rows[0]["sh"] == ["a b", "b c", "c d"]
    assert rows[0]["fp"] == rows[1]["fp"]
    assert rows[0]["fp"] != rows[2]["fp"]


def test_content_hash(spark):
    df = spark.createDataFrame([("abc",)], ["text"])
    h = df.select(content_hash("text").alias("h")).first()["h"]
    import hashlib

    assert h == hashlib.sha256(b"abc").hexdigest()


def test_entities_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_entities(docs, "text", ["number"], ["doc_id"]).limit(10)
    assert out.count() >= 0  # runs without error on real table


def test_winnow_fingerprints_known_example(spark):
    """Hand-checkable winnowing (Schleimer et al. 2003): shared runs of
    >= w+k-1 tokens must share a fingerprint; the set is the distinct
    per-window minima of the k-gram hash sequence."""
    import hashlib

    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.text import winnow_fingerprints

    text = "a b c d e f g h"
    k, w = 3, 4
    toks = text.split(" ")
    hs = [
        hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:16]
        for i in range(len(toks) - k + 1)
    ]
    expect = []
    for j in range(len(hs) - w + 1):
        m = min(hs[j:j + w])
        if m not in expect:
            expect.append(m)
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(
        winnow_fingerprints("text", k=k, w=w).alias("fp")
    ).collect()[0]["fp"]
    assert got == expect


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Two documents sharing a run of w+k-1 tokens always intersect."""
    from crawl4ai_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over"      # 6 = w+k-1 tokens
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "zz yy xx ww " + shared),
            (3, "completely different words here with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=3, w=4).alias("fp")
        ).collect()
    }
    assert got[1] & got[2]
    assert not (got[1] & got[3])
    assert not (got[2] & got[3])


def test_winnow_short_doc_single_fingerprint(spark):
    from crawl4ai_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([("a b",)], ["text"])
    got = df.select(
        winnow_fingerprints("text", k=3, w=4).alias("fp")
    ).collect()[0]["fp"]
    assert len(got) == 1  # whole-text fallback shingle, one window
