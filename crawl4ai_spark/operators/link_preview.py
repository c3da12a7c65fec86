"""LinkPreview: the filtered-link head-extraction loop as ONE operator
(SURVEY.md §2.11 LinkPreview).

Reference: link_preview.py:71-180 (filter by include_internal/
include_external + fnmatch include/exclude patterns + max_links cap +
order-preserving dedup), :182-225 (head extraction through the seeder
with optional BM25 query scoring + score_threshold), :264-380 (merge
head_data / relevance back into every link, total_score combine).

Spark reformulation: the per-crawler concurrency/timeout knobs map to
the cluster scheduler — ``concurrency`` documents the intended
`spark.sql.shuffle.partitions`-level parallelism of the head fetch and
``timeout`` the fetch-stage timeout; in this batch engine the "head
fetch" is a left join against a heads table (url, head_html), so a
missing row IS the timeout/unreachable case (status 'miss'). Links the
filter drops keep riding through with status 'skipped' — the
reference's merge semantics, so downstream sees every link exactly
once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.headpeek import content_relevance_score, head_title
from ..functions.link_scoring import total_link_score
from .filters import url_pattern_filter


@dataclass
class LinkPreviewConfig:
    """Mirror of the reference LinkPreviewConfig surface
    (link_preview.py:115-167 usage)."""

    include_internal: bool = True
    include_external: bool = False
    include_patterns: tuple = ()
    exclude_patterns: tuple = ()
    max_links: int = 10            # per page, in document order
    query: str | None = None       # BM25 relevance query
    score_threshold: float | None = None
    concurrency: int = 10          # documented mapping: fetch parallelism
    timeout: float = 5.0           # documented mapping: fetch timeout


def link_preview_stage(
    results: DataFrame,
    heads: DataFrame,
    config: LinkPreviewConfig | None = None,
    *,
    url_col: str = "url",
    links_col: str = "links",
    head_col: str = "head_html",
) -> DataFrame:
    """Explode each page's links, run the LinkPreview filter pipeline,
    attach head data + relevance for the selected ones.

    Output: (page_url, href, link_pos, is_internal, status
    ['valid'|'below_threshold'|'miss'|'skipped'], head_title,
    relevance_score, total_score).
    """
    cfg = config or LinkPreviewConfig()

    links = results.select(
        F.col(url_col).alias("page_url"),
        F.posexplode(links_col).alias("link_pos", "lk"),
    ).select(
        "page_url", "link_pos",
        F.col("lk.href").alias("href"),
        F.col("lk.text").alias("text"),
        F.col("lk.is_internal").alias("is_internal"),
    )

    selected = F.when(F.col("is_internal"), F.lit(cfg.include_internal)).otherwise(
        F.lit(cfg.include_external)
    )
    if cfg.include_patterns:
        selected = selected & url_pattern_filter("href", list(cfg.include_patterns))
    if cfg.exclude_patterns:
        selected = selected & url_pattern_filter(
            "href", list(cfg.exclude_patterns), reverse=True
        )
    links = links.withColumn("_sel", selected)

    # reference ordering: internal block first, then external, each in
    # document order; cap, then order-preserving dedup
    w = Window.partitionBy("page_url").orderBy(
        F.desc("is_internal"), F.asc("link_pos")
    )
    links = links.withColumn(
        "_rk", F.when(F.col("_sel"), F.row_number().over(w)).otherwise(None)
    )
    if cfg.max_links > 0:
        links = links.withColumn(
            "_sel", F.col("_sel") & (F.col("_rk") <= cfg.max_links)
        )
    dd = Window.partitionBy("page_url", "href").orderBy(F.asc_nulls_last("_rk"))
    links = links.withColumn(
        "_dup",
        F.col("_sel") & (F.row_number().over(dd) > 1),
    ).withColumn("_sel", F.col("_sel") & ~F.col("_dup"))

    # "head fetch": left join against the heads table (miss = timeout/
    # unreachable in the reference's live loop). Duplicate head rows
    # for one url (e.g. a union of two fetch runs) are collapsed first
    # — a join-side fanout would emit one link row per duplicate,
    # breaking the exactly-once output contract (same defensive
    # max-collapse as frontier.py's url_validators join).
    h = heads.select(
        F.col(url_col).alias("href"), F.col(head_col).alias("_head")
    ).groupBy("href").agg(F.max("_head").alias("_head"))
    joined = links.join(h, "href", "left")

    fetched = F.col("_sel") & F.col("_head").isNotNull()
    relevance = (
        F.when(
            fetched,
            F.round(content_relevance_score(F.col("_head"), cfg.query), 6),
        )
        if cfg.query
        else F.lit(None).cast("double")
    )
    joined = joined.withColumn("relevance_score", relevance)

    below = (
        fetched & (F.col("relevance_score") < cfg.score_threshold)
        if cfg.query and cfg.score_threshold is not None
        else F.lit(False)
    )
    status = (
        F.when(~F.col("_sel"), "skipped")
        .when(~F.col("_head").isNotNull(), "miss")
        .when(below, "below_threshold")
        .otherwise("valid")
    )
    valid = status == "valid"
    return joined.select(
        "page_url", "href", "link_pos", "is_internal",
        status.alias("status"),
        F.when(valid, head_title("_head")).alias("head_title"),
        F.when(valid, F.col("relevance_score")).alias("relevance_score"),
        F.round(
            total_link_score(
                F.lit(None),
                F.when(valid, F.col("relevance_score")),
                score_links_enabled=True,
                query_provided=cfg.query is not None,
            ),
            6,
        ).alias("total_score"),
    )
