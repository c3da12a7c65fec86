"""Hashed-n-gram quality classifier (functions/quality_model.py)."""

import hashlib

from pyspark.sql import functions as F

from crawl4ai_spark.functions.quality_model import (
    SHIFT,
    classifier_score_milli,
    classifier_scores_vocab,
    default_weights,
    gram_weight_shifted,
)
from crawl4ai_spark.functions.repetition import word_ngrams


def _w_shift(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % (2 * SHIFT + 1)


def _ref_score(text: str, n: int = 2) -> int:
    ws = text.split(" ")
    grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    if not grams:
        return 0
    s = sum(_w_shift(g) for g in grams)
    return s // len(grams) - SHIFT


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "spark shuffle partition join",
    "solo",
    "a b a b a b",
]


def test_rowlocal_matches_pure_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        classifier_score_milli(F.split("text", " ")).alias("s"),
    ).collect()
    got = {r["doc_id"]: r["s"] for r in rows}
    for i, t in enumerate(TEXTS):
        assert got[i] == _ref_score(t), t


def test_vocab_join_path_equals_rowlocal(spark):
    """The broadcast-join path with default hash weights must agree
    bit-for-bit with the row-local expression."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    words = F.split(F.col("text"), " ")
    vocab = default_weights(df, word_ngrams(words, 2))
    voc = {
        r["doc_id"]: r["score_milli"]
        for r in classifier_scores_vocab(df, "doc_id", words, vocab).collect()
    }
    row = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", classifier_score_milli(words).alias("s")
        ).collect()
    }
    assert voc == row


def test_unseen_grams_score_neutral(spark):
    """A weights table that misses every gram -> all scores 0 (the
    coalesce-to-SHIFT fallback)."""
    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    empty_w = spark.createDataFrame([], "gram string, w_shift long")
    r = classifier_scores_vocab(
        df, "doc_id", F.split(F.col("text"), " "), empty_w
    ).first()
    assert r["score_milli"] == 0


def test_trained_weights_move_the_score(spark):
    """Swapping in explicit weights (the real-model path) changes the
    score accordingly: all-max weights -> +1000, all-min -> -1000."""
    df = spark.createDataFrame([(0, "p q r")], "doc_id long, text string")
    words = F.split(F.col("text"), " ")
    grams = ["p q", "q r"]
    hi = spark.createDataFrame(
        [(g, 2 * SHIFT) for g in grams], "gram string, w_shift long"
    )
    lo = spark.createDataFrame([(g, 0) for g in grams], "gram string, w_shift long")
    assert (
        classifier_scores_vocab(df, "doc_id", words, hi).first()["score_milli"]
        == SHIFT
    )
    assert (
        classifier_scores_vocab(df, "doc_id", words, lo).first()["score_milli"]
        == -SHIFT
    )


def test_short_doc_neutral(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    r = df.select(classifier_score_milli(F.split("text", " ")).alias("s")).first()
    assert r["s"] == 0


def test_weight_range(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "delta"]], "g string"
    )
    rows = df.select(gram_weight_shifted(F.col("g")).alias("w")).collect()
    assert all(0 <= r["w"] <= 2 * SHIFT for r in rows)
