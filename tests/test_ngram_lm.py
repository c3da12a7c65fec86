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
