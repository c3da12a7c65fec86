"""Randomized property tests for the webtext-pipeline operators.

Spark-side properties run BATCHED (one DataFrame of many random
examples per property — per-example Spark jobs would be 100x slower);
the pure-python BPE core gets hypothesis directly.
"""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.operators.bpe import (
    EOW,
    encode_word,
    merges_from_vocab,
)

# ------------------------------------------------------------------ BPE core

words_st = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(words_st, st.integers(1, 50), min_size=1, max_size=12),
       st.integers(0, 20))
def test_bpe_encode_is_lossless_partition(vocab, n_merges):
    """Concatenating a word's tokens always reproduces word + EOW —
    merges may regroup but never drop or invent characters."""
    merges = merges_from_vocab(vocab, n_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in vocab:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        assert all(toks)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(words_st, st.integers(1, 50), min_size=1, max_size=10))
def test_bpe_training_ignores_dict_order(vocab):
    items = list(vocab.items())
    random.Random(42).shuffle(items)
    assert merges_from_vocab(vocab, 8) == merges_from_vocab(dict(items), 8)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(words_st, st.integers(1, 50), min_size=1, max_size=10),
       st.integers(0, 10))
def test_bpe_more_merges_never_lengthen(vocab, k):
    m1 = merges_from_vocab(vocab, k)
    m2 = merges_from_vocab(vocab, k + 5)
    r1 = {tuple(p): i for i, p in enumerate(m1)}
    r2 = {tuple(p): i for i, p in enumerate(m2)}
    for w in vocab:
        assert len(encode_word(w, r2)) <= len(encode_word(w, r1))


# --------------------------------------------------- batched Spark properties

def _rand_words(rng, n):
    return " ".join(
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 7)))
        for _ in range(n)
    )


def test_fuzz_redact_pii_planted_values_never_survive(spark):
    """200 random documents, each with a random subset of planted PII
    values inside random filler: no planted value may survive the
    scrub, and the audit sees each at least once."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.entities import pii_counts, redact_pii

    rng = random.Random(7)
    plants = {
        "email": lambda i: f"user.{i}+x@host{i}.example.org",
        "ipv4": lambda i: f"10.{i % 250}.{(i * 7) % 250}.{(i * 13) % 250}",
        "uuid": lambda i: f"123e4567-e89b-12d3-a456-4266141{i % 10}4000",
        "mac_addr": lambda i: f"00:1A:2B:3C:4D:{i % 90 + 10:02d}",
    }
    rows, expected = [], []
    for i in range(200):
        labels = rng.sample(sorted(plants), rng.randint(1, 4))
        vals = [plants[l](i) for l in labels]
        parts = [_rand_words(rng, rng.randint(0, 6)) for _ in range(len(vals) + 1)]
        text = parts[0]
        for v, p in zip(vals, parts[1:]):
            text += " " + v + " " + p
        rows.append((i, text.strip()))
        expected.append((i, vals, labels))
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: (r["clean"], r["audit"])
        for r in df.select(
            "i",
            redact_pii("t").alias("clean"),
            pii_counts("t").alias("audit"),
        ).collect()
    }
    for i, vals, labels in expected:
        clean, audit = got[i]
        for v, l in zip(vals, labels):
            assert v not in clean, (i, v, clean)
            assert audit[l] >= 1, (i, l, audit)


def test_fuzz_line_dedup_matches_python_replay(spark):
    """150 random docs of explicit line arrays drawn from a small line
    pool (guaranteeing cross-document duplicates): Spark line_dedup ==
    the obvious python replay, including order and counters."""
    from collections import Counter

    from crawl4ai_spark.operators.dedup import line_dedup

    rng = random.Random(11)
    pool = [_rand_words(rng, rng.randint(1, 4)) for _ in range(40)]
    docs = [
        (i, [rng.choice(pool) for _ in range(rng.randint(0, 8))])
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "lines"])
    for min_dup in (2, 4):
        got = {
            r["doc_id"]: (r["text"], r["kept_lines"], r["removed_lines"])
            for r in line_dedup(
                df, "text", "doc_id", min_dup=min_dup, lines_col="lines"
            ).collect()
        }
        counts = Counter(ln for _, ls in docs for ln in ls)
        for i, ls in docs:
            keep = [ln for ln in ls if counts[ln] < min_dup]
            n_rm = len(ls) - len(keep)
            assert got[i] == (" ".join(keep), len(keep), n_rm), (i, min_dup)


def test_fuzz_lm_total_is_python_exact(spark):
    """80 random docs: distributed LM costs equal the python replay
    bit-for-bit (the integer micro-nat quantization contract)."""
    import math
    from collections import Counter

    from crawl4ai_spark.functions.ngram_lm import lm_self_perplexity

    rng = random.Random(13)
    texts = [_rand_words(rng, rng.randint(1, 30)) for _ in range(80)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["total_cost_e6"])
        for r in lm_self_perplexity(df).collect()
    }
    uni = Counter(w for t in texts for w in t.split(" "))
    bi = Counter(
        (a, b) for t in texts for a, b in zip(t.split(" "), t.split(" ")[1:])
    )
    T, V = sum(uni.values()), len(uni)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        costs = [
            round(
                -math.log(
                    0.7 * (bi[(a, b)] / uni[a]) + 0.3 * ((uni[b] + 1) / (T + V))
                )
                * 1e6
                + 1e-9
            )
            for a, b in zip(ws, ws[1:])
        ]
        assert got[i] == (len(costs), sum(costs)), i


def test_fuzz_decode_never_crashes_or_nulls(spark):
    """300 random byte blobs (including BOM-prefixed garbage and
    truncated multibyte tails): sniff+decode must always yield a
    non-null string — one bad page must never kill a task."""
    from crawl4ai_spark.functions.encoding import decode_html, sniff_charset

    rng = random.Random(23)
    blobs = []
    for i in range(300):
        body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 64)))
        prefix = rng.choice(
            [b"", b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff",
             b'<meta charset="utf-16le">', b'<meta charset="junk-lbl">']
        )
        blobs.append((i, prefix + body))
    df = spark.createDataFrame(blobs, "id int, html binary")
    rows = df.select(
        "id", sniff_charset("html").alias("cs"), decode_html("html").alias("t")
    ).collect()
    assert len(rows) == 300
    assert all(r["t"] is not None and r["cs"] for r in rows)


def test_priors_by_hash_collapses_duplicates(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.frontier import _priors_by_hash

    df = spark.createDataFrame(
        [("https://a/x", 1.0), ("https://a/x", 4.0), ("https://b/y", 2.0)],
        ["url", "prior"],
    )
    out = _priors_by_hash(df).collect()
    assert len(out) == 2  # dup url collapsed
    assert sorted(r["_prior"] for r in out) == [2.0, 4.0]  # max wins
