"""Embedding-strategy adaptive crawler: gap geometry, link ranking and
the digest loop (reference adaptive_crawler.py:593-1230 semantics with
a deterministic in-test embedder)."""

from __future__ import annotations

import pytest

from crawl4ai_spark.operators.adaptive_embedding import (
    coverage_gaps,
    embedding_confidence,
    select_links_embedding,
)


def _df(spark, rows, id_name):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        f"{id_name} long, embedding array<double>",
    )


def test_gaps_empty_kb_are_one(spark):
    q = _df(spark, [(0, [1, 0]), (1, [0, 1])], "query_id")
    out = {r["query_id"]: r["gap"] for r in coverage_gaps(None, q).collect()}
    assert out == {0: 1.0, 1: 1.0}


def test_gap_zero_when_kb_contains_query(spark):
    q = _df(spark, [(0, [1, 0]), (1, [0, 1])], "query_id")
    kb = _df(spark, [(10, [1, 0])], "kb_id")
    out = {r["query_id"]: r["gap"] for r in coverage_gaps(kb, q).collect()}
    assert out[0] == pytest.approx(0.0, abs=1e-12)
    assert out[1] == pytest.approx(1.0)  # orthogonal -> distance 1


def test_link_ranking_prefers_gap_filler_over_kb_overlap(spark):
    # KB covers the x-axis; the query space needs the y-axis.
    q = _df(spark, [(0, [0, 1])], "query_id")
    kb = _df(spark, [(10, [1, 0])], "kb_id")
    cand = _df(
        spark,
        [(100, [0.1, 1.0]), (101, [1.0, 0.05])],  # gap-filler vs overlap
        "link_id",
    )
    gaps = coverage_gaps(kb, q)
    out = {r["link_id"]: r["link_score"] for r in
           select_links_embedding(cand, gaps, kb).collect()}
    assert out[100] > out[101]
    assert out[100] > 0.5  # large improvement on a 1.0 gap, doubled


def test_confidence_full_coverage(spark):
    q = _df(spark, [(0, [1, 0]), (1, [0, 1])], "query_id")
    row = embedding_confidence(q.withColumnRenamed("query_id", "kb_id"), q).first()
    assert row["confidence"] == pytest.approx(1.0)
    assert row["median_best_similarity"] == pytest.approx(1.0)
    empty = embedding_confidence(None, q).first()
    assert empty["confidence"] == 0.0


def test_confidence_tau_hit_rate(spark):
    q = _df(spark, [(0, [1, 0]), (1, [0, 1])], "query_id")
    kb = _df(spark, [(10, [1, 0])], "kb_id")
    row = embedding_confidence(kb, q, tau=0.9).first()
    assert row["confidence"] == pytest.approx(0.5)  # 1 of 2 queries covered


def test_digest_loop_converges(spark):
    """Mirror of the statistical digest loop: each round crawls the
    top-ranked link, folds its embedding into the KB, and confidence
    must reach the stopping threshold."""
    import math

    dims = 4
    qs = [(i, [1.0 if j == i else 0.0 for j in range(dims)]) for i in range(dims)]
    q = _df(spark, qs, "query_id")
    # candidate pool: near-axis vectors, one per axis
    cands = [
        (100 + i, [math.cos(0.15) if j == i else (math.sin(0.15) if j == (i + 1) % dims else 0.0)
                   for j in range(dims)])
        for i in range(dims)
    ]
    kb_rows: list = []
    confs = []
    for _round in range(dims):
        kb = _df(spark, kb_rows, "kb_id") if kb_rows else None
        conf = embedding_confidence(kb, q).first()["confidence"]
        confs.append(conf)
        if conf >= 0.95:
            break
        remaining = [c for c in cands if all(c[0] != k[0] for k in kb_rows)]
        gaps = coverage_gaps(kb, q)
        ranked = select_links_embedding(
            _df(spark, remaining, "link_id"), gaps, kb
        ).collect()
        best = ranked[0]["link_id"]
        kb_rows.append(next(c for c in cands if c[0] == best))
    final = embedding_confidence(_df(spark, kb_rows, "kb_id"), q).first()
    assert final["confidence"] >= 0.95
    assert confs == sorted(confs)  # monotone non-decreasing across rounds
