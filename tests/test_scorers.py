"""Scorer golden tests — expected values ported from the reference's
/root/reference/tests/general/test_deep_crawl_scorers.py."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.scorers import (
    composite_score,
    content_type_score,
    domain_authority_score,
    freshness_score,
    keyword_relevance_score,
    path_depth_score,
)

TOL = 1e-5


def _eval(spark, cases, col_factory):
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    rows = df.select("url", col_factory(F.col("url")).alias("s")).collect()
    got = {r["url"]: r["s"] for r in rows}
    for url, expected in cases.items():
        assert abs(got[url] - expected) < TOL, f"{url}: got {got[url]} want {expected}"


def test_keyword_relevance(spark):
    _eval(
        spark,
        {
            "https://example.com/python-blog": 1.0,
            "https://example.com/PYTHON-BLOG": 1.0,
            "https://example.com/python-only": 0.5,
            "https://example.com/other": 0.0,
        },
        lambda c: keyword_relevance_score(c, ["python", "blog"]),
    )


def test_path_depth(spark):
    _eval(
        spark,
        {
            "https://example.com/a/b": 1.0,
            "https://example.com/a": 0.5,
            "https://example.com/a/b/c": 0.5,
            "https://example.com": 0.33333333,
        },
        lambda c: path_depth_score(c, optimal_depth=2),
    )


def test_content_type(spark):
    _eval(
        spark,
        {
            "https://example.com/doc.html": 1.0,
            "https://example.com/doc.pdf": 0.8,
            "https://example.com/img.jpg": 0.6,
            "https://example.com/other.txt": 0.0,
        },
        lambda c: content_type_score(c, {".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}),
    )


def test_freshness(spark):
    _eval(
        spark,
        {
            "https://example.com/2024/01/post": 1.0,
            "https://example.com/2023/12/post": 0.9,
            "https://example.com/2022/post": 0.8,
            "https://example.com/no-date": 0.5,
        },
        lambda c: freshness_score(c, current_year=2024),
    )


def test_domain_authority(spark):
    _eval(
        spark,
        {
            "https://python.org/about": 1.0,
            "https://github.com/repo": 0.8,
            "https://medium.com/post": 0.6,
            "https://unknown.com": 0.3,
        },
        lambda c: domain_authority_score(
            c,
            {"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6},
            default_weight=0.3,
        ),
    )


def test_composite(spark):
    # mean of keyword (1.0) and path-depth(optimal=2 on /a/b -> 1.0) = 1.0;
    # weights multiply through before the mean (CompositeScorer :93-160)
    _eval(
        spark,
        {"https://example.com/python-blog": (1.0 * 0.5 + 0.5 * 1.0) / 2},
        lambda c: composite_score(
            [
                keyword_relevance_score(c, ["python", "blog"], weight=0.5),
                path_depth_score(c, optimal_depth=2, weight=1.0),
            ]
        ),
    )


def test_bm25_duplicate_query_terms_count_per_occurrence(spark):
    """rank_bm25's get_scores iterates the query token LIST — a
    repeated term contributes once per occurrence (the old set() dedup
    halved it)."""
    from crawl4ai_spark.operators.relevance import bm25_scores

    df = spark.createDataFrame(
        [(0, "python crawler tool"), (1, "rust parser tool")],
        "doc_id long, text string",
    )
    one = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_scores(
            df, "text", "doc_id", "python", normalize=False
        ).collect()
    }
    two = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_scores(
            df, "text", "doc_id", "python python", normalize=False
        ).collect()
    }
    import pytest as _pytest

    assert two[0] == _pytest.approx(2 * one[0])
    assert two[1] == one[1] == 0.0
