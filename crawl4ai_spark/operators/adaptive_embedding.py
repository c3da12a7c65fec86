"""Embedding-strategy adaptive crawler (SURVEY.md §2.11 — the second
AdaptiveCrawler mode beside the statistical one in relevance.py).

Reference: EmbeddingStrategy (adaptive_crawler.py:593-1230):
- query semantic space = the query + LLM-generated variations, embedded
  (:666-735) — the LLM + remote-embedding calls are external services,
  so here the variations arrive as a (query_id, embedding) DataFrame
  through the same pluggable-embedder seam as cosine_strategy;
- coverage gaps = per variation, min cosine DISTANCE to the knowledge
  base (:774-801; empty KB -> gap 1.0);
- link selection = scaled gap-improvement score x overlap penalty
  (:804-921: improvement (gap - new_dist) * 2 summed over gaps
  outside coverage_radius that the link moves closer, averaged over
  gaps needing help; penalty (max_kb_sim - overlap_threshold) * 2
  above the threshold; optional contextual blend 0.8/0.2);
- confidence = mean best-cosine per variation against the KB, or the
  tau hit-rate (:924-952).

Spark shapes: the variation set is tiny (the reference generates ~10)
-> broadcast cross join + one small aggregation per operator. The KB
side of an adaptive crawl is the per-query knowledge base (tens to
hundreds of documents in the reference), so it broadcasts too; both
joins degrade gracefully to shuffle joins if the optimizer rejects the
hint at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine

COVERAGE_RADIUS = 0.2     # adaptive_crawler.py:860 default
OVERLAP_THRESHOLD = 0.85  # adaptive_crawler.py:906 default


def _pair(df: DataFrame, id_col: str | None, emb_col: str, prefix: str) -> DataFrame:
    cols = [F.col(emb_col).cast("array<double>").alias(f"{prefix}_emb")]
    if id_col is not None:
        cols.insert(0, F.col(id_col).alias(f"{prefix}_id"))
    return df.select(*cols)


def coverage_gaps(
    kb: DataFrame | None,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, embedding, gap): per query variation, the min cosine
    distance to any KB document; 1.0 when the KB is empty
    (adaptive_crawler.py:774-801)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("embedding"),
    )
    if kb is None:
        return q.withColumn("gap", F.lit(1.0))
    k = _pair(kb, None, emb_col, "_kb")
    dist = 1.0 - cosine(F.col("embedding"), F.col("_kb_emb"))
    per_q = (
        F.broadcast(q)
        .crossJoin(k)
        .groupBy("query_id")
        .agg(F.min(dist).alias("_gap"))
    )
    return q.join(per_q, "query_id", "left").withColumn(
        "gap", F.coalesce(F.col("_gap"), F.lit(1.0))
    ).drop("_gap")


def select_links_embedding(
    candidates: DataFrame,
    gaps: DataFrame,
    kb: DataFrame | None,
    *,
    id_col: str = "link_id",
    emb_col: str = "embedding",
    coverage_radius: float = COVERAGE_RADIUS,
    overlap_threshold: float = OVERLAP_THRESHOLD,
    contextual_col: str | None = None,
) -> DataFrame:
    """(id, link_score): the reference's gap-filling link ranking
    (adaptive_crawler.py:860-921). ``gaps`` is coverage_gaps() output."""
    cand = candidates.select(
        F.col(id_col).alias("_cid"),
        F.col(emb_col).cast("array<double>").alias("_cemb"),
        *(
            [F.col(contextual_col).cast("double").alias("_ctx")]
            if contextual_col
            else []
        ),
    )
    g = gaps.select(
        F.col("embedding").alias("_gemb"), F.col("gap").alias("_gap")
    )
    new_dist = 1.0 - cosine(F.col("_cemb"), F.col("_gemb"))
    needs_help = F.col("_gap") > coverage_radius
    improvement = F.when(
        needs_help & (new_dist < F.col("_gap")),
        (F.col("_gap") - new_dist) * 2.0,
    ).otherwise(0.0)
    per_cand = (
        cand.crossJoin(F.broadcast(g))
        .groupBy("_cid")
        .agg(
            F.sum(improvement).alias("_total"),
            F.sum(needs_help.cast("int")).alias("_nhelp"),
            *(
                [F.first("_ctx").alias("_ctx")] if contextual_col else []
            ),
        )
        .withColumn(
            "_gap_score",
            F.when(
                F.col("_nhelp") > 0, F.col("_total") / F.col("_nhelp")
            ).otherwise(0.0),
        )
    )

    if kb is not None:
        k = _pair(kb, None, emb_col, "_kb")
        sim = cosine(F.col("_cemb"), F.col("_kb_emb"))
        overlap = (
            cand.crossJoin(F.broadcast(k))
            .groupBy("_cid")
            .agg(F.max(sim).alias("_maxsim"))
        )
        per_cand = per_cand.join(overlap, "_cid", "left")
        penalty = F.when(
            F.col("_maxsim") > overlap_threshold,
            (F.col("_maxsim") - overlap_threshold) * 2.0,
        ).otherwise(0.0)
    else:
        penalty = F.lit(0.0)

    score = F.col("_gap_score") * (1.0 - penalty)
    if contextual_col:
        score = score * 0.8 + F.col("_ctx") * 0.2
    return per_cand.select(
        F.col("_cid").alias(id_col), score.alias("link_score")
    ).orderBy(F.desc("link_score"), F.asc(id_col))


def embedding_confidence(
    kb: DataFrame | None,
    queries: DataFrame,
    *,
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    tau: float | None = None,
) -> DataFrame:
    """One row (confidence, avg_best_similarity, median_best_similarity)
    — adaptive_crawler.py:924-952; 0.0 for an empty KB."""
    spark = queries.sparkSession
    if kb is None:
        return spark.createDataFrame(
            [(0.0, 0.0, 0.0)],
            "confidence double, avg_best_similarity double, "
            "median_best_similarity double",
        )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(emb_col).cast("array<double>").alias("_qemb"),
    )
    k = _pair(kb, None, emb_col, "_kb")
    sim = cosine(F.col("_qemb"), F.col("_kb_emb"))
    best = (
        F.broadcast(q)
        .crossJoin(k)
        .groupBy("_qid")
        .agg(F.max(sim).alias("_best"))
    )
    conf = (
        F.avg((F.col("_best") >= tau).cast("double"))
        if tau is not None
        else F.avg("_best")
    )
    return best.agg(
        conf.alias("confidence"),
        F.avg("_best").alias("avg_best_similarity"),
        F.median("_best").alias("median_best_similarity"),
    )
