"""LLM-stub extraction and CosineStrategy-analog clustering tests."""

from __future__ import annotations

import json

import numpy as np

from crawl4ai_spark.functions.llm_stub import fake_llm, llm_extract_stage, merge_chunks
from crawl4ai_spark.operators.cosine_strategy import (
    agglomerative_clusters,
    cosine_cluster_page,
    cosine_cluster_stage,
    hashed_embedder,
)


def test_merge_chunks_budget_and_overlap():
    # per-doc estimate int(3*1.3)=3, summed over 10 docs -> 30 tokens
    # -> ceil(30/10)=3 pre-allocated chunks; the 30 raw words fill them
    # at exactly target_size each
    chunks = ["one two three"] * 10
    sections = merge_chunks(chunks, target_size=10, overlap=0)
    assert [len(s.split()) for s in sections] == [10, 10, 10]
    # overlap: next section starts with the previous tail words
    s2 = merge_chunks(["a b c d e", "f g h i j", "k l m n o"],
                      target_size=8, overlap=2)
    assert len(s2) >= 2
    tail = s2[0].split()[-2:]
    assert s2[1].split()[:2] == tail
    # reference quirk: a doc whose token estimate rounds to zero is
    # dropped whole
    assert merge_chunks(["solo"], target_size=8, word_token_ratio=0.5) == []


def test_fake_llm_deterministic():
    out1 = fake_llm("Alice met Bob in Paris. More text.", "summarize")
    out2 = fake_llm("Alice met Bob in Paris. More text.", "summarize")
    assert out1 == out2
    parsed = json.loads(out1)
    assert parsed["entities"] == ["Alice", "Bob", "More", "Paris"]


def test_llm_extract_stage(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = llm_extract_stage(docs, "text", instruction="extract").collect()
    for r in out:
        blocks = json.loads(r["extracted_content"])
        assert blocks and blocks[0]["instruction"] == "extract"


def test_embedder_deterministic_and_normalized():
    e1 = hashed_embedder(["alpha beta gamma", "alpha beta gamma", "other words"])
    assert np.allclose(e1[0], e1[1])
    assert not np.allclose(e1[0], e1[2])
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0)


def test_clustering_groups_similar():
    texts = [
        "spark query engine rows", "spark query engine columns",
        "bananas oranges apples pears", "bananas oranges kiwi plums",
    ]
    emb = hashed_embedder(texts)
    labels = agglomerative_clusters(emb, max_dist=0.7)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_cosine_cluster_page_with_filter():
    chunks = [
        "spark engine query plan rows",
        "spark optimizer query execution",
        "bananas oranges apples pears melons",
    ]
    out = cosine_cluster_page(chunks, semantic_filter="spark query",
                              sim_threshold=0.1, max_dist=0.6)
    text = " ".join(c["text"] for c in out)
    assert "spark" in text
    assert "bananas" not in text


def test_cosine_cluster_stage_spark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = cosine_cluster_stage(docs, "text", max_dist=0.5).collect()
    for r in out:
        clusters = json.loads(r["clusters"])
        assert clusters and all("text" in c for c in clusters)


class _FakeTensorDict(dict):
    pass


def _install_fake_transformers(monkeypatch):
    """Stub transformers/torch so hf_embedder's real plumbing
    (batching, tokenize->forward->mean-pool, normalize) runs without
    the actual libraries. The fake model emits a (n, tokens, dim)
    last_hidden_state derived deterministically from token ids."""
    import contextlib
    import sys
    import types

    class _Arr:
        def __init__(self, a):
            self.a = np.asarray(a, dtype=np.float64)

        def mean(self, dim):
            return _Arr(self.a.mean(axis=dim))

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    class _Tok:
        @classmethod
        def from_pretrained(cls, name, **kw):
            return cls()

        def __call__(self, batch, padding, truncation, return_tensors):
            n = max((len(t.split()) for t in batch), default=0) or 1
            ids = [
                [(len(w) % 7) + 1 for w in t.split()][:n]
                + [0] * (n - min(len(t.split()), n))
                for t in batch
            ]
            return _FakeTensorDict(input_ids=ids)

    class _Out:
        def __init__(self, ids):
            ids = np.asarray(ids, dtype=np.float64)
            # (n, tokens, 4): channels are simple functions of the ids
            self.last_hidden_state = _Arr(
                np.stack([ids, ids * 2, ids + 1, np.ones_like(ids)], axis=-1)
            )

    class _Model:
        @classmethod
        def from_pretrained(cls, name, **kw):
            return cls()

        def eval(self):
            return self

        def __call__(self, input_ids):
            return _Out(input_ids)

    tf = types.ModuleType("transformers")
    tf.AutoTokenizer = _Tok
    tf.AutoModel = _Model
    torch = types.ModuleType("torch")
    torch.no_grad = contextlib.nullcontext
    monkeypatch.setitem(sys.modules, "transformers", tf)
    monkeypatch.setitem(sys.modules, "torch", torch)


def test_hf_embedder_plumbing(monkeypatch):
    from crawl4ai_spark.operators.cosine_strategy import hf_embedder

    _install_fake_transformers(monkeypatch)
    embed = hf_embedder(batch_size=2)
    texts = ["a bb ccc", "dd e", "ffff gg hhh ii", "j", "kk ll"]
    emb = embed(texts)
    assert emb.shape == (5, 4)
    # unit-normalized rows
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0)
    # Reference quirk pinned: get_embeddings mean-pools
    # last_hidden_state with NO attention mask
    # (extraction_strategy.py:322-324), so per-batch padding leaks
    # into the mean and values are batch-composition-dependent for
    # unequal-length texts. Invariance holds exactly when every text
    # in a batch has the same token count:
    same_len = ["a bb ccc", "dd e ffff", "g hh iii", "jj k llll"]
    assert np.allclose(
        hf_embedder(batch_size=2)(same_len),
        hf_embedder(batch_size=32)(same_len),
    )
    # and differs (quirk, not a bug in the port) for ragged batches
    emb_big = hf_embedder(batch_size=32)(texts)
    assert not np.allclose(emb, emb_big)
    # deterministic across calls
    assert np.allclose(emb, embed(texts))
    # empty input
    assert embed([]).shape[0] == 0
    # and it slots into the clustering entry point unchanged
    from crawl4ai_spark.operators.cosine_strategy import cosine_cluster_page

    out = cosine_cluster_page(
        ["alpha beta gamma delta", "alpha beta gamma delta"],
        embedder=embed, max_dist=0.5, min_words=1,
    )
    assert out and out[0]["cluster"] == 0


def test_hf_embedder_gated_without_transformers():
    import importlib.util

    if importlib.util.find_spec("transformers") is not None:
        import pytest

        pytest.skip("real transformers present; gate not reachable")
    from crawl4ai_spark.operators.cosine_strategy import hf_embedder

    try:
        hf_embedder()
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as exc:
        assert "hashed_embedder" in str(exc)
