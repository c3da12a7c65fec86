"""Edge-case parity for chunkers vs the reference's loop semantics
(chunking_strategy.py) re-executed in plain Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.chunking import (
    fixed_word_chunks,
    identity_chunks,
    overlapping_window_chunks,
    regex_chunks,
    sliding_word_chunks,
)


def ref_fixed(text, size):
    words = text.split()
    return [" ".join(words[i : i + size]) for i in range(0, len(words), size)]


def ref_sliding(text, window, step):
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks = []
    for i in range(0, len(words) - window + 1, step):
        chunks.append(" ".join(words[i : i + window]))
    if i + window < len(words):
        chunks.append(" ".join(words[-window:]))
    return chunks


def ref_overlap(text, window, overlap):
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks, start = [], 0
    while start < len(words):
        end = start + window
        chunks.append(" ".join(words[start:end]))
        if end >= len(words):
            break
        start = end - overlap
    return chunks


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["c"] for r in df.select(col.alias("c")).collect()]


TEXTS = [
    "one two three four five six seven eight nine ten eleven twelve",
    "a b c",
    "exactly ten words here now one two three four five",
    "single",
    "  padded   spacing   text   here  ",
    " ".join(f"w{i}" for i in range(37)),
    " ".join(f"w{i}" for i in range(40)),
]


@pytest.mark.parametrize("size", [3, 5, 10])
def test_fixed_parity(spark, size):
    got = _run(spark, TEXTS, fixed_word_chunks("text", size))
    for t, g in zip(TEXTS, got):
        assert list(g) == ref_fixed(t, size), (t, size)


@pytest.mark.parametrize("window,step", [(10, 4), (5, 5), (10, 3), (3, 1)])
def test_sliding_parity(spark, window, step):
    got = _run(spark, TEXTS, sliding_word_chunks("text", window, step))
    for t, g in zip(TEXTS, got):
        assert list(g) == ref_sliding(t, window, step), (t, window, step)


@pytest.mark.parametrize("window,overlap", [(12, 3), (10, 2), (5, 1), (6, 5)])
def test_overlap_parity(spark, window, overlap):
    got = _run(spark, TEXTS, overlapping_window_chunks("text", window, overlap))
    for t, g in zip(TEXTS, got):
        assert list(g) == ref_overlap(t, window, overlap), (t, window, overlap)


def test_overlap_rejects_non_advancing_params(spark):
    # the reference's while loop never advances when overlap >=
    # window_size (chunking_strategy.py:238-256) and hangs; the engine
    # refuses the parameters instead (documented divergence)
    with pytest.raises(ValueError, match="overlap"):
        overlapping_window_chunks("text", window_size=5, overlap=5)
    with pytest.raises(ValueError, match="overlap"):
        overlapping_window_chunks("text", window_size=5, overlap=7)
    # the other windowed chunkers mirror the reference's range()
    # ValueError at plan time
    with pytest.raises(ValueError, match="chunk_size"):
        fixed_word_chunks("text", chunk_size=0)
    with pytest.raises(ValueError, match="step"):
        sliding_word_chunks("text", window_size=5, step=0)


def test_identity_and_regex(spark):
    got = _run(spark, ["a the b the c"], identity_chunks("text"))
    assert list(got[0]) == ["a the b the c"]
    got = _run(spark, ["a the b the c"], regex_chunks("text", [" the "]))
    assert list(got[0]) == ["a", "b", "c"]
    # multi-pattern: second pattern re-splits first-pass chunks
    got = _run(spark, ["a-b|c-d"], regex_chunks("text", ["\\|", "-"]))
    assert list(got[0]) == ["a", "b", "c", "d"]


def test_sentence_chunks_loop_parity(spark):
    """Spark sentence chunker vs a pure-Python reference splitter."""
    import re

    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.chunking import sentence_chunks

    def py_sentences(text, dedupe=True):
        parts = re.findall(r"[^.?!]+[.?!]+|[^.?!]+$", text)
        parts = [p.strip() for p in parts]
        parts = [p for p in parts if p]
        if dedupe:
            seen, out = set(), []
            for p in parts:
                if p not in seen:
                    seen.add(p)
                    out.append(p)
            return out
        return parts

    cases = [
        "One sentence. Two sentences! Three? And a tail without end",
        "Repeat me. Repeat me. Unique one.",
        "No terminator at all",
        "  spaced.   out!  ",
        "",
        "Dr. Who? Yes... sort of.",
        "multi\nline. with breaks\nhere.",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [
        r["s"]
        for r in df.select(sentence_chunks("t").alias("s")).collect()
    ]
    for text, chunks in zip(cases, got):
        assert list(chunks) == py_sentences(text), text


def test_sentence_chunks_no_dedupe(spark):
    from crawl4ai_spark.functions.chunking import sentence_chunks

    df = spark.createDataFrame([("A. A. B.",)], "t string")
    row = df.select(sentence_chunks("t", dedupe=False).alias("s")).first()
    assert list(row["s"]) == ["A.", "A.", "B."]


def test_topic_chunks_loop_parity(spark):
    """topic_chunks (pure Column TextTiling approximation) must match
    its pure-Python mirror on two-topic docs, uniform docs, and edges."""
    import random

    from crawl4ai_spark.functions.chunking import topic_chunks, topic_chunks_py

    rng = random.Random(11)
    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["zeta", "eta", "theta", "iota", "kappa"]
    cases = []
    for _ in range(30):
        n1, n2 = rng.randint(0, 150), rng.randint(0, 150)
        words = [rng.choice(vocab_a) for _ in range(n1)] + [
            rng.choice(vocab_b) for _ in range(n2)
        ]
        cases.append(" ".join(words))
    cases += ["", "one two three", " ".join(["x"] * 20), " ".join(["y"] * 41)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "i int, t string")
    got = {
        r["i"]: list(r["c"])
        for r in df.select("i", topic_chunks("t").alias("c")).collect()
    }
    for i, text in enumerate(cases):
        assert got[i] == topic_chunks_py(text), f"case {i}"


def test_topic_chunks_splits_two_topic_doc(spark):
    """A doc with a hard vocabulary switch must segment at (or near)
    the switch, and chunks must reassemble to the original text."""
    from crawl4ai_spark.functions.chunking import topic_chunks_py

    text = " ".join(["cat dog fish bird"] * 25 + ["engine piston gear axle"] * 25)
    chunks = topic_chunks_py(text)
    assert len(chunks) >= 2
    assert " ".join(chunks) == text
    # the boundary nearest the switch is within one pseudo-sentence (20
    # words) of the true topic change at word 100
    offs = [sum(len(c.split()) for c in chunks[: i + 1]) for i in range(len(chunks) - 1)]
    assert any(abs(o - 100) <= 20 for o in offs)
