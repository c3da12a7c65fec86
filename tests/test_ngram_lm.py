"""Bigram LM self-perplexity scorer tests (functions/ngram_lm.py)."""

import math
from collections import Counter

from crawl4ai_spark.functions.ngram_lm import lm_self_perplexity


def _py_scores(texts):
    """Pure-python replay of the interpolated bigram model."""
    docs = {i: t.split(" ") for i, t in enumerate(texts)}
    uni = Counter(w for ws in docs.values() for w in ws)
    bi = Counter(
        (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1)
    )
    T, V = sum(uni.values()), len(uni)
    out = {}
    for i, ws in docs.items():
        costs = []
        for a, b in zip(ws, ws[1:]):
            p = 0.7 * (bi[(a, b)] / uni[a]) + 0.3 * ((uni[b] + 1) / (T + V))
            costs.append(round(-math.log(p) * 1e6 + 1e-9))
        tot = sum(costs)
        n = len(costs)
        out[i] = (n, tot, tot // (1000 * n) if n else 0)
    return out


def test_lm_matches_python_replay(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran to the mat",
        "dogs bark loudly at night",
        "the the the the",           # degenerate repetition -> low cost
        "zx qv wq jj kk",            # all-rare tokens -> high cost
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["total_cost_e6"], r["avg_cost_milli"])
        for r in lm_self_perplexity(df).collect()
    }
    assert got == _py_scores(texts)


def test_lm_ordering_semantics(spark):
    """Reinforced transitions score lower than novel word-salad
    transitions over the same vocabulary; identical docs score
    identically. (Note: on a self-trained corpus a SINGLETON bigram
    over singleton words is 'predictable' — c12/c1 = 1 — so rarity
    alone doesn't raise cost; broken word ORDER does.)"""
    texts = [
        "the cat sat on the mat",
        "the cat sat on the mat",   # duplicate reinforces its bigrams
        "mat the on cat sat the",   # same words, novel transitions
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["avg_cost_milli"] for r in lm_self_perplexity(df).collect()}
    assert got[0] == got[1]
    assert got[2] > got[0]


def test_lm_single_token_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello world")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in lm_self_perplexity(df).collect()}
    assert got[1]["n_transitions"] == 0
    assert got[1]["avg_cost_milli"] == 0
    assert got[2]["n_transitions"] == 1


def test_lm_hash_keys_path_same_shape(spark):
    """xxhash64-keyed training/scoring gives identical scores on a
    collision-free vocabulary (the 100 TB shuffle-narrowing path)."""
    texts = ["the cat sat on the mat", "the cat ran to the mat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    plain = {r["doc_id"]: r["total_cost_e6"]
             for r in lm_self_perplexity(df).collect()}
    hashed = {r["doc_id"]: r["total_cost_e6"]
              for r in lm_self_perplexity(df, hash_keys=True).collect()}
    assert plain == hashed


def test_perplexity_buckets_exact_terciles(spark):
    """ntile semantics: per-language ordering by (cost, doc_id); first
    (count % 3) buckets take the extra rows."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.ngram_lm import perplexity_buckets

    rows = [
        # lang a: 7 docs, costs 10..70 -> buckets 3/2/2
        *[(i, "a", (i + 1) * 10) for i in range(7)],
        # lang b: 3 equal costs -> positional split by doc_id tie-break
        (10, "b", 5), (11, "b", 5), (12, "b", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "avg_cost_milli"])
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df).collect()
    }
    assert [got[i] for i in range(7)] == [1, 1, 1, 2, 2, 3, 3]
    assert [got[i] for i in (10, 11, 12)] == [1, 2, 3]


def test_bucket_thresholds_scale_path_tracks_exact_tiering(spark):
    """The broadcast-threshold assigner (the 100 TB shape: no
    per-language sort) uses interpolated-percentile cutoffs, so it may
    differ from exact ntile only at boundary-adjacent rows — on
    tie-free data every document lands within one bucket of the exact
    tiering, assignment is monotone in cost within a language, and
    bucket populations are balanced."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.ngram_lm import (
        assign_buckets,
        bucket_thresholds,
        perplexity_buckets,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", (F.xxhash64("text") % 1000000).alias(
            "avg_cost_milli"))
    )
    exact = perplexity_buckets(docs).select(
        "doc_id", "lang", "avg_cost_milli",
        F.col("ppl_bucket").alias("b_exact"),
    )
    approx = assign_buckets(docs, bucket_thresholds(docs)).select(
        "doc_id", F.col("ppl_bucket").alias("b_thr")
    )
    rows = exact.join(approx, "doc_id").collect()
    assert len(rows) > 0
    assert all(abs(r["b_exact"] - r["b_thr"]) <= 1 for r in rows)
    agree = sum(r["b_exact"] == r["b_thr"] for r in rows)
    assert agree >= 0.9 * len(rows)  # divergence only hugs boundaries
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((r["avg_cost_milli"], r["b_thr"]))
    for lang, pairs in by_lang.items():
        pairs.sort()
        bs = [b for _, b in pairs]
        assert bs == sorted(bs), f"non-monotone assignment in {lang}"
        n = len(bs)
        for b, c in Counter(bs).items():
            assert abs(c - n / 3) <= 2, (lang, b, c, n)


def test_assign_buckets_unknown_language_defaults_to_head(spark):
    from crawl4ai_spark.functions.ngram_lm import (
        assign_buckets,
        bucket_thresholds,
    )

    train = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 30)],
        ["doc_id", "lang", "avg_cost_milli"],
    )
    score = spark.createDataFrame(
        [(9, "xx", 999)], ["doc_id", "lang", "avg_cost_milli"]
    )
    got = assign_buckets(score, bucket_thresholds(train)).collect()
    assert got[0]["ppl_bucket"] == 1  # no thresholds -> bucket 1, kept


def test_pretrained_table_scores_oov_docs_expensive(spark):
    """Scoring against a PRE-TRAINED count table: fully-OOV gibberish
    must take the smoothed unigram floor (high cost), not score
    avg_cost_milli=0 (maximally fluent) via inner-join row loss."""
    import pyspark.sql.functions as F

    from crawl4ai_spark.functions.ngram_lm import (
        lm_doc_scores,
        train_bigram_counts,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat the cat ran".split())],
        "id long, w array<string>",
    )
    uni, bi, tot = train_bigram_counts(train, F.col("w"))
    score_me = spark.createDataFrame(
        [(1, "the cat sat".split()),       # in-vocab
         (2, "zzq qqz zqz qzz".split())],  # fully OOV
        "id long, w array<string>",
    )
    got = {
        r["id"]: r
        for r in lm_doc_scores(score_me, "id", F.col("w"), uni, bi, tot).collect()
    }
    assert got[2]["n_transitions"] == 3  # transitions not dropped
    assert got[2]["avg_cost_milli"] > got[1]["avg_cost_milli"] > 0
