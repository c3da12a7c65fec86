"""Unigram-LM tokenizer trainer tests (operators/unigram.py)."""

import math

from pyspark.sql import functions as F

from crawl4ai_spark.operators.unigram import (
    UNK_COST,
    _cost_table,
    train_unigram,
    unigram_encode_stage,
    unigram_token_count,
    viterbi_segment,
)

SF_DIR = "/root/testdata/sf0.001"


def _train_py(vocab, vocab_size, seed_size, iters, max_piece_len,
              prune_keep=0.75):
    """Pure-python replay of the DISTRIBUTED parts (seed substring
    counting, E-step aggregation, prune ordering) over a {word: count}
    table; the per-word Viterbi core is shared with the module."""
    counts = {}
    for w, c in vocab.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i:i + l]
                counts[p] = counts.get(p, 0) + c
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    seed = dict(multi)
    seed.update(chars)
    char_set = set(chars)
    costs = _cost_table(seed)
    for it in range(iters):
        em = {}
        for w, c in vocab.items():
            for p in viterbi_segment(w, costs, max_piece_len):
                em[p] = em.get(p, 0) + c
        chars = {p: max(em.get(p, 0), 1) for p in char_set}
        multi = sorted(((p, c) for p, c in em.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        target = max(vocab_size - len(chars), 0)
        if it == iters - 1:
            n_multi = min(len(multi), target)
        else:
            n_multi = min(len(multi),
                          max(target, int(len(multi) * prune_keep)))
        kept = dict(multi[:n_multi])
        kept.update(chars)
        costs = _cost_table(kept)
    return costs


def test_train_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    vocab = {}
    for r in docs.collect():
        for w in r["text"].split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    args = dict(vocab_size=300, seed_size=1200, iters=3, max_piece_len=6)
    got = train_unigram(docs, "text", **args)
    want = _train_py(vocab, **args)
    assert got == want
    assert len(got) <= 300 + 0  # chars counted inside vocab_size target
    assert any(len(p) > 1 for p in got)


def test_train_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    a = train_unigram(docs.repartition(1), "text", vocab_size=200,
                      seed_size=800, iters=2, max_piece_len=5)
    b = train_unigram(docs.repartition(16), "text", vocab_size=200,
                      seed_size=800, iters=2, max_piece_len=5)
    assert a == b


def test_encode_is_lossless_and_compresses(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    costs = train_unigram(docs, "text", vocab_size=400, seed_size=1600,
                          iters=2, max_piece_len=6)
    enc = unigram_encode_stage(docs, costs, "text")
    rows = enc.select(
        "text",
        F.array_join("unigram_tokens", "").alias("joined"),
        F.size("unigram_tokens").alias("n"),
    ).collect()
    for r in rows:
        assert r["joined"] == r["text"].replace(" ", "")
    total_tokens = sum(r["n"] for r in rows)
    total_chars = sum(len(r["text"].replace(" ", "")) for r in rows)
    assert total_tokens < total_chars  # multi-char pieces actually used
    cnt = unigram_token_count(docs, costs).agg(
        F.sum("unigram_n_tokens")
    ).collect()[0][0]
    assert cnt == total_tokens


def test_viterbi_tie_prefers_longer_piece_and_unk_falls_back():
    costs = _cost_table({"a": 10, "b": 10, "ab": 10, "abc": 10})
    # "ab" as one piece always beats a+b (one cost vs two)
    assert viterbi_segment("ab", costs) == ["ab"]
    assert viterbi_segment("abc", costs) == ["abc"]
    # unseen character: per-char UNK fallback keeps segmentation total
    seg = viterbi_segment("axb", costs)
    assert seg == ["a", "x", "b"]
    assert "x" not in costs and UNK_COST > max(costs.values())


def test_cost_table_is_integer_micro_nats():
    t = _cost_table({"a": 3, "b": 1})
    assert t["a"] == round(-math.log(3 / 4) * 1e6 + 1e-9)
    assert t["b"] == round(-math.log(1 / 4) * 1e6 + 1e-9)
    assert all(isinstance(v, int) for v in t.values())


def test_character_inventory_survives_pruning(spark):
    """Every character of the training corpus stays in the vocab even
    when hard-EM absorbs all its occurrences into longer pieces."""
    docs = spark.createDataFrame(
        [("abab abab abab",)] * 3, ["text"]
    )
    costs = train_unigram(docs, "text", vocab_size=10, seed_size=40,
                          iters=3, max_piece_len=4)
    assert "a" in costs and "b" in costs   # chars kept at +1 smoothing
    assert "abab" in costs                 # the dominant whole piece
    assert viterbi_segment("abab", costs, 4) == ["abab"]


def test_encode_reaches_pieces_longer_than_default_dp_width(spark):
    """Encoding derives the Viterbi width from the vocab's longest
    piece — a model trained with max_piece_len > 8 must still emit its
    long pieces (a hardcoded width-8 DP made them unreachable and
    silently inflated token counts)."""
    from crawl4ai_spark.operators.unigram import (
        unigram_encode_stage, unigram_token_count,
    )

    costs = {c: 5_000_000 for c in "abcdefghijkl"}
    costs["abcdefghijkl"] = 1_000_000  # a 12-char trained piece
    docs = spark.createDataFrame(
        [(1, "abcdefghijkl abcdefghijkl")], "doc_id long, text string"
    )
    toks = unigram_encode_stage(docs, costs).head()["unigram_tokens"]
    assert toks == ["abcdefghijkl", "abcdefghijkl"]
    n = unigram_token_count(docs, costs).head()["unigram_n_tokens"]
    assert n == 2


def test_viterbi_rejects_nonpositive_piece_len():
    import pytest

    from crawl4ai_spark.operators.unigram import viterbi_segment

    with pytest.raises(ValueError):
        viterbi_segment("abc", {"a": 1}, max_piece_len=0)


def test_catalog_uni_piece_fixed_point_boundary(spark):
    """The uni_piece gate rows pin the trained piece table as oracle
    literals {ab:0, abab:1, a:2, b:3}. The derivation needs n >= 11
    (3*floor(n/3) > 2*ceil(n/3) + 2); train at the boundary across all
    three n%3 phases to prove the pinned ranks hold for every corpus
    size the driver can throw at the gate."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.unigram import train_unigram

    for n in (11, 12, 13):
        docs = spark.range(n).select(
            F.array_join(
                F.array_repeat(
                    F.repeat(F.lit("ab"), (F.col("id") % 3 + 1).cast("int")),
                    (F.lit(3) - F.col("id") % 3).cast("int"),
                ),
                " ",
            ).alias("text")
        )
        costs = train_unigram(
            docs, "text", vocab_size=4, seed_size=16, iters=2,
            max_piece_len=4,
        )
        order = [p for p, _ in sorted(costs.items(),
                                      key=lambda kv: (kv[1], kv[0]))]
        assert order == ["ab", "abab", "a", "b"], (n, order)
