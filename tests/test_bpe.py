"""BPE trainer/encoder tests (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.bpe import (
    EOW,
    bpe_encode_stage,
    bpe_token_count,
    encode_word,
    merges_from_vocab,
    train_bpe,
    word_frequencies,
)


def test_merge_loop_classic_example():
    # Sennrich et al. worked example shape: 'low' family
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = merges_from_vocab(vocab, num_merges=4)
    # highest-count adjacent pair first: ('e','s') appears 6+3=9 times
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert ("l", "o") in merges  # count 7 comes after est</w> (9)


def test_merge_ties_break_lexicographically():
    vocab = {"ab": 3, "cd": 3}
    merges = merges_from_vocab(vocab, num_merges=1)
    # (a,b), (b,</w>), (c,d), (d,</w>) all count 3 -> smallest pair wins
    assert merges == [("a", "b")]


def test_encode_word_applies_training_order():
    vocab = {"newest": 6, "widest": 3}
    merges = merges_from_vocab(vocab, num_merges=3)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert "".join(encode_word("newest", ranks)).replace(EOW, "") == "newest"
    # unseen word degrades to characters + whatever merges apply
    toks = encode_word("best", ranks)
    assert "est" + EOW in toks


def test_distributed_train_matches_local(spark):
    texts = ["low low low low low lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    dist = train_bpe(df, num_merges=5)
    from collections import Counter
    vocab = Counter(w for t in texts for w in t.split(" "))
    local = merges_from_vocab(dict(vocab), num_merges=5)
    assert dist == local


def test_encode_stage_and_token_count(spark):
    df = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab aa"), (3, "")], ["doc_id", "text"]
    )
    merges = train_bpe(df, num_merges=3, min_pair_count=2)
    enc = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode_stage(df, merges).collect()}
    assert enc[3] == []
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert enc[2] == encode_word("ab", ranks) + encode_word("aa", ranks)
    cnt = {r["doc_id"]: r["bpe_n_tokens"]
           for r in bpe_token_count(df, merges).collect()}
    assert cnt == {i: len(v) for i, v in enc.items()}


def test_vocab_guard_raises(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(200)], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe(df, num_merges=2, max_vocab_rows=10)


def test_real_corpus_compression(spark, sf_dir):
    """More merges -> fewer tokens, never more; encoded length is
    bounded below by word count (each word >= 1 token)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(100)
    )
    m10 = train_bpe(docs, num_merges=10)
    m60 = train_bpe(docs, num_merges=60)
    c10 = bpe_token_count(docs, m10).agg(F.sum("bpe_n_tokens")).first()[0]
    c60 = bpe_token_count(docs, m60).agg(F.sum("bpe_n_tokens")).first()[0]
    words = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("w")
    ).first()["w"]
    assert c60 <= c10
    assert c60 >= words


def test_catalog_merges_match_every_sf():
    """The catalog's baked _BPE_MERGES (the oracle's encode table) must
    equal what training on each sf dir's DISTINCT-word vocabulary
    (count=1 each) produces — the construction that makes the merge
    list scale-factor-invariant. Pure python: trains merges_from_vocab
    on the actual parquet vocabularies."""
    import duckdb

    from crawl4ai_spark.catalog import _BPE_MERGES

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        words = [
            r[0]
            for r in con.sql(
                "SELECT DISTINCT unnest(regexp_split_to_array(text, ' ')) w"
                f" FROM read_parquet('{path}')"
            ).fetchall()
            if r[0]
        ]
        got = merges_from_vocab({w: 1 for w in words}, 24, 2)
        assert got == list(map(tuple, _BPE_MERGES)), sf


def test_sequential_replace_equals_lowest_rank_first():
    """The oracle applies merges sequentially in rank order (string
    replaces); encode_word applies lowest-rank-pair-first. For a
    genuinely trained merge list these are equivalent (a merge's inputs
    always predate it in rank order) — pin it per word on the real
    vocabulary."""
    import duckdb

    from crawl4ai_spark.catalog import _BPE_MERGES, _oracle_bpe_counts

    ranks = {tuple(p): i for i, p in enumerate(_BPE_MERGES)}
    con = duckdb.connect()
    path = "/root/testdata/sf0.001/documents.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    # per-doc totals from the oracle SQL vs pure-python encode_word sums
    got = {
        r[0]: r[1] for r in con.sql(_oracle_bpe_counts()).fetchall()
    }
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    for doc_id, text in docs:
        want = sum(
            len(encode_word(w, ranks)) for w in text.split(" ") if w
        )
        assert got[doc_id] == want, doc_id
