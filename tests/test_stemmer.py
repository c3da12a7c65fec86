"""Porter2 stemmer pinned by the worked examples the published Snowball
English algorithm description gives for each step, plus its exceptional
forms, plus structural properties (idempotence-adjacent invariants the
BM25 pipeline relies on)."""

from __future__ import annotations

import pytest

from crawl4ai_spark.functions.stemmer import stem_word, stem_words

# (input, expected) — every pair below is stated verbatim in the
# algorithm description at snowballstem.org (English / Porter2).
SPEC_EXAMPLES = [
    # exceptional forms
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"), ("lying", "lie"),
    ("tying", "tie"), ("idly", "idl"), ("gently", "gentl"), ("ugly", "ugli"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("sky", "sky"), ("news", "news"), ("atlas", "atlas"), ("cosmos", "cosmos"),
    ("bias", "bias"), ("andes", "andes"),
    # step 1a
    ("ties", "tie"), ("cries", "cri"), ("gas", "gas"), ("this", "this"),
    ("gaps", "gap"), ("kiwis", "kiwi"),
    # step 1a exceptional stop-words
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"), ("proceed", "proceed"),
    ("exceed", "exceed"), ("succeed", "succeed"),
    # step 1b (the spec shows the step-1b intermediate, e.g.
    # agreed -> agree; step 5 then drops the e when the stem doesn't end
    # in a short syllable, giving the end-to-end stems below)
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"),
    ("hoping", "hope"), ("charged", "charg"), ("filing", "file"),
    # step 1c
    ("cry", "cri"), ("by", "by"), ("say", "say"),
]

COMMON_PAIRS = [
    # widely-published snowball outputs (sanity beyond the spec text)
    ("running", "run"), ("happiness", "happi"), ("relational", "relat"),
    ("national", "nation"), ("generously", "generous"),
    ("caresses", "caress"), ("ponies", "poni"), ("meeting", "meet"),
    ("argument", "argument"), ("arguments", "argument"),
]


@pytest.mark.parametrize("word,want", SPEC_EXAMPLES)
def test_spec_examples(word, want):
    assert stem_word(word) == want


@pytest.mark.parametrize("word,want", COMMON_PAIRS)
def test_common_pairs(word, want):
    assert stem_word(word) == want


def test_short_words_untouched():
    for w in ["a", "is", "be", "ox", ""]:
        assert stem_word(w) == w


def test_plural_and_base_agree():
    # the property BM25 matching needs: inflections collapse together
    groups = [
        ("connect", "connected", "connecting", "connection", "connections"),
        ("relate", "related", "relating"),
        ("argue", "argued", "arguing", "argues"),
    ]
    for g in groups:
        stems = {stem_word(w) for w in g}
        assert len(stems) == 1, f"{g} -> {stems}"


def test_stem_words_batch():
    assert stem_words(["running", "cries"]) == ["run", "cri"]


def test_case_insensitive():
    assert stem_word("Running") == "run"
