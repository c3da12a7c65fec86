"""Benchmark-decontamination operator tests (operators/decontam.py)."""

import pytest

from crawl4ai_spark.operators.decontam import contamination_check

W = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa".split()


def _doc(words):
    return " ".join(words)


def _ref(docs, evals, ngram=13):
    """Brute-force reference."""
    def sh(text):
        ws = text.split()
        if len(ws) < ngram:
            return {text}
        return {" ".join(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1)}

    ev = set()
    for t in evals:
        ev |= sh(t)
    return {i: len(sh(t) & ev) for i, t in docs.items()}


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5", None])
def test_contamination_matches_reference(spark, hash_fn):
    docs = {
        0: _doc(W),                      # 16 words -> 4 13-grams
        1: _doc(W[:13]),                 # exactly one 13-gram, in eval
        2: _doc(W[3:]) + " extra tail words here now",  # partial overlap
        3: "totally unrelated text with no overlap at all whatsoever",
        4: _doc(W[:10]),                 # short doc, whole-text fallback
    }
    evals = [_doc(W[:14]), _doc(W[:10])]
    want = _ref(docs, evals)
    d = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    e = spark.createDataFrame([(t,) for t in evals], "text string")
    got = {
        r["doc_id"]: (r["n_contaminated_ngrams"], r["contaminated"])
        for r in contamination_check(d, e, hash_fn=hash_fn).collect()
    }
    assert set(got) == set(docs)
    for i in docs:
        assert got[i][0] == want[i], (i, got[i], want[i])
        assert got[i][1] == (1 if want[i] > 0 else 0)
    # sanity on the fixture itself: clean + contaminated both present
    assert got[3] == (0, 0)
    assert got[1][1] == 1 and got[4][1] == 1


def test_contamination_counts_distinct_ngrams_once(spark):
    """A repeated 13-gram in one doc counts once (distinct semantics)."""
    g = _doc(W[:13])
    d = spark.createDataFrame([(0, g + " " + g)], "doc_id long, text string")
    e = spark.createDataFrame([(g,)], "text string")
    row = contamination_check(d, e).first()
    # the doubled doc contains the eval 13-gram (several positions) but
    # only distinct matched ngrams are counted
    assert row["contaminated"] == 1
    assert row["n_contaminated_ngrams"] == 1
