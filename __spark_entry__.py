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
from crawl4ai_spark.session import ensure_runtime_confs


def _with_confs(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Apply the engine's runtime-settable confs before every query.

    The correctness driver runs the catalog on a VANILLA SparkSession
    (not the repo's get_spark factory); anything the engine needs —
    legacy charset decoding for the byte-boundary queries — must be set
    at runtime here, not only at session-build time (the r4 pages_meta
    regression)."""

    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_runtime_confs(spark)
        return fn(spark, sf_dir)

    return runner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a 2-round BFS crawl (fetch-join -> scrape+markdown ->
    link discovery -> seen anti-join -> politeness-budgeted frontier)
    over the synthetic pages corpus derived from sf0.001 documents.

    Returns the crawl_results table (lineage columns round /
    partition_id / parent_url_hash included).
    """
    import shutil
    import tempfile

    ensure_runtime_confs(spark)

    from crawl4ai_spark.operators.frontier import CrawlConfig, CrawlRun, run_crawl
    from crawl4ai_spark.synth import generate_pages

    sf_dir = "/root/testdata/sf0.001"
    pages = generate_pages(spark, sf_dir)
    seeds = [r["url"] for r in pages.select("url").orderBy("url").limit(5).collect()]
    wd = tempfile.mkdtemp(prefix="crawl_entry_")
    shutil.rmtree(wd, ignore_errors=True)
    cfg = CrawlConfig(max_depth=2, round_seconds=16.0)
    run_crawl(spark, pages, seeds, wd, cfg, max_rounds=2)
    run = CrawlRun(spark, pages, wd, cfg)
    return run.results().select(
        "url", "url_hash", "host", "round", "depth", "partition_id",
        "parent_url_hash", "fetch_status", "success", "title", "n_links",
        "raw_markdown",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_confs(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
