"""DSIR importance resampling (operators/dsir.py, arXiv:2302.03169):
behavioral properties + the 100 TB plan shape. The cross-engine
bit-exactness of the full pipeline is covered by the catalog gate
(tests/test_catalog.py sample_stratified, strategy='dsir')."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawl4ai_spark.operators.dsir import (
    dsir_select,
    featurize,
    hashed_ngram_buckets,
    importance_resample,
    importance_weights,
    train_importance_model,
)

B = 64


@pytest.fixture(scope="module")
def corpus(spark):
    # two sublanguages: en docs use the "alpha..." vocab, de docs the
    # "zeta..." vocab, with a shared "common" token — so the importance
    # model has real signal to latch onto.
    return spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 3 == 0, "alpha").otherwise("zeta"),
            F.concat(
                F.when(F.col("id") % 3 == 0, F.lit("beta")).otherwise(
                    F.lit("eta")
                ),
                (F.col("id") % 7).cast("string"),
            ),
            F.lit("common"),
        ).alias("text"),
    )


def _pipeline(corpus):
    feats = featurize(
        corpus, "doc_id", F.split("text", " "), B, carry_cols=["lang"]
    )
    model = train_importance_model(feats, F.col("lang") == "en", B)
    return feats, model


def test_featurize_counts_unigrams_plus_bigrams(spark, corpus):
    # a 3-token doc yields 3 unigrams + 2 bigrams = 5 feature instances
    feats, _ = _pipeline(corpus)
    per_doc = feats.groupBy("doc_id").count().select("count").distinct()
    assert [r["count"] for r in per_doc.collect()] == [5]


def test_bucket_range_and_multiplicity(spark):
    df = spark.createDataFrame([("a a b",)], "text string")
    arr = df.select(
        hashed_ngram_buckets(F.split("text", " "), B).alias("b")
    ).head()["b"]
    assert len(arr) == 5  # a, a, b, "a a", "a b" — duplicates kept
    assert all(0 <= x < B for x in arr)
    assert arr[0] == arr[1]  # same unigram -> same bucket


def test_model_separates_target_vocabulary(spark, corpus):
    # buckets fed only by en-vocab grams must score above buckets fed
    # only by de-vocab grams
    feats, model = _pipeline(corpus)
    lookup = {r["bucket"]: r["lr_unat"] for r in model.collect()}
    marks = (
        feats.groupBy("bucket")
        .agg(F.min(F.col("lang") == "en").alias("all_en"),
             F.max(F.col("lang") == "en").alias("any_en"))
        .collect()
    )
    en_only = [lookup[r["bucket"]] for r in marks if r["all_en"]]
    de_only = [lookup[r["bucket"]] for r in marks if not r["any_en"]]
    assert en_only and de_only
    assert min(en_only) > max(de_only)


def test_resample_is_without_replacement_and_target_biased(spark, corpus):
    out = dsir_select(
        corpus,
        "doc_id",
        F.split("text", " "),
        F.col("lang") == "en",
        k=80,
        buckets=B,
        carry_cols=["lang"],
    )
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 80 and len(set(ids)) == 80
    # the en target is 1/3 of the corpus but must dominate the sample
    n_en = sum(1 for r in rows if r["lang"] == "en")
    assert n_en > 55


def test_resample_is_deterministic_and_salt_decorrelated(spark, corpus):
    feats, model = _pipeline(corpus)
    lw = importance_weights(feats, "doc_id", model)
    a = {r["doc_id"] for r in importance_resample(lw, "doc_id", 40, "s1").collect()}
    b = {r["doc_id"] for r in importance_resample(lw, "doc_id", 40, "s1").collect()}
    c = {r["doc_id"] for r in importance_resample(lw, "doc_id", 40, "s2").collect()}
    assert a == b
    assert a != c  # different salt -> different draw (w.h.p.)


def test_k_larger_than_corpus_returns_everything(spark, corpus):
    feats, model = _pipeline(corpus)
    lw = importance_weights(feats, "doc_id", model)
    assert importance_resample(lw, "doc_id", 10_000).count() == 300


def test_unseen_buckets_use_smoothed_sentinel(spark):
    """Standalone flow (fit once, score a NEW corpus): buckets absent
    from the model contribute the add-one-smoothed unseen-bucket
    log-ratio ln((t_raw+B)/(t_tgt+B)) — not 0 via a silent inner-join
    drop."""
    B = 64
    train = spark.createDataFrame(
        [(0, ["alpha", "beta", "gamma"], True),
         (1, ["alpha", "delta", "epsilon"], False)],
        "id long, words array<string>, tgt boolean",
    )
    feats = featurize(
        train.withColumn("_t", F.col("tgt")), "id", F.col("words"), B,
        carry_cols=["_t"],
    )
    model = train_importance_model(feats, F.col("_t"), B)
    # sentinel row exists with the closed-form constant
    t = feats.count()  # total ngram instances
    t_tgt = feats.filter("_t").count()
    import math
    expect = round(math.log((t + B) / (t_tgt + B)) * 1e6 + 1e-9)
    sent = model.filter(F.col("bucket") == -1).collect()
    assert len(sent) == 1 and sent[0]["lr_unat"] == expect
    # scoring a doc of entirely novel words sums the sentinel ratio
    novel = spark.createDataFrame(
        [(9, ["zzz-novel-one", "zzz-novel-two"])],
        "id long, words array<string>",
    )
    nf = featurize(novel, "id", F.col("words"), B)
    n_feats = nf.count()
    w = importance_weights(nf, "id", model).collect()
    # guard: the novel words must actually miss the trained buckets
    trained = {r["bucket"] for r in model.collect() if r["bucket"] != -1}
    novel_buckets = [r["bucket"] for r in nf.collect()]
    if all(b not in trained for b in novel_buckets):
        assert w and w[0]["lw_unat"] == expect * n_feats
    else:  # hash collision with B=64 — still must not drop the doc
        assert w
