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
