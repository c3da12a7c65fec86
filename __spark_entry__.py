"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by ``crawl4ai_spark.catalog``:
one entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions (dedup, similarity, text analysis).
``entry`` runs the flagship pipeline on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>0.

    Derive a deterministic URL frontier from the documents table, run it
    through the full URL layer (canonicalize -> filter chain -> scorers
    -> per-host politeness budget -> capacity top-k) — one round of the
    crawl engine's link-processing stage.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawl4ai_spark.catalog import _url1
    from crawl4ai_spark.functions.urls import base_domain, host, url_hash
    from crawl4ai_spark.operators.filters import (
        content_type_filter,
        domain_filter,
        filter_chain,
    )
    from crawl4ai_spark.operators.scorers import (
        composite_score,
        keyword_relevance_score,
        path_depth_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    links = docs.withColumn("url", _url1())
    keep = filter_chain(
        content_type_filter("url", ["text"]),
        domain_filter("url", blocked_domains=["src0.example.com"]),
    )
    scored = (
        links.filter(keep)
        .withColumn("url_hash", url_hash("url"))
        .withColumn("host", host("url"))
        .withColumn("bdom", base_domain("url"))
        .withColumn(
            "priority",
            composite_score(
                [
                    keyword_relevance_score("url", ["html", "www"]),
                    path_depth_score("url", optimal_depth=3),
                ]
            ),
        )
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url_hash"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("doc_id", "url", "url_hash", "host", "bdom", "priority")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
