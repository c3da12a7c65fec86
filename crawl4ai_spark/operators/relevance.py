"""Corpus-level relevance + adaptive-crawl aggregates (SURVEY.md A4-A8).

- ``bm25_scores``: the seeder's relevance ranking
  (async_url_seeder.py:1380-1426) — BM25Okapi (k1=1.5, b=0.75,
  epsilon=0.25 negative-IDF flooring) over whitespace-lowered tokens,
  followed by the seeder's min-max normalization (all-equal -> 0.5).
- ``coverage`` / ``consistency`` / ``saturation`` / ``confidence``:
  the AdaptiveCrawler's stopping metrics (adaptive_crawler.py:287-389).

Plan shapes: corpus statistics are single aggregation passes
(explode -> groupBy term); consistency is the one O(n^2) op (pairwise
doc Jaccard) — it runs on the knowledge-base sample (tens of docs per
query in the reference), never the full corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(F.lower(col), "\\s+"), lambda w: w != "")


def _adaptive_tokens(col):
    """The AdaptiveCrawler's tokenizer (adaptive_crawler.py:576-585):
    punctuation replaced by spaces, whitespace split, tokens of length
    <= 2 dropped. ``\\w`` is ASCII on both Java and RE2; the reference's
    Python ``\\w`` is unicode-aware — a documented divergence for
    non-ASCII word characters (the engine's corpus is ASCII)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), r"[^\w\s]", " "), "\\s+"),
        lambda w: F.length(w) > 2,
    )


def _adaptive_query_terms(query: str) -> list:
    """Driver-side mirror of _adaptive_tokens for the query string.
    The reference keeps DUPLICATE query terms (adaptive_crawler.py:316
    tokenizes into a list, then averages over its length). re.ASCII
    keeps \\w consistent with the Java/RE2 \\w used on the document
    side — without it a non-ASCII query term would survive here but
    never match any document token."""
    import re as _re

    return [
        t
        for t in _re.sub(r"[^\w\s]", " ", query.lower(), flags=_re.ASCII).split()
        if len(t) > 2
    ]


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    *,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    normalize: bool = True,
) -> DataFrame:
    """(id, bm25_score) for every doc; exact BM25Okapi semantics.

    Three tiny scalar aggregates (N, avgdl, avg-raw-idf for the epsilon
    floor) + one term-stats aggregate + one join back. Driver scalars
    are fine here: this operator ranks seed lists, not the web corpus.
    """
    # BM25Okapi.get_scores iterates the query TOKEN LIST — a repeated
    # query term contributes once per occurrence, so duplicates are
    # kept for scoring (the set is only the vocabulary-lookup key)
    q_tokens = query.lower().split()
    q_terms = sorted(set(q_tokens))
    docs = df.select(
        F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))

    stats = docs.agg(
        F.count("*").alias("n"), F.avg("_dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 0.0)

    terms = docs.select("_id", F.explode("_toks").alias("_t"))
    dfreq = terms.groupBy("_t").agg(F.countDistinct("_id").alias("_df"))
    # raw idf over the WHOLE vocabulary (needed for the epsilon floor)
    idf_raw = F.log(F.lit(float(n_docs)) - F.col("_df") + 0.5) - F.log(
        F.col("_df") + 0.5
    )
    vocab = dfreq.withColumn("_idf_raw", idf_raw)
    avg_idf = vocab.agg(F.avg("_idf_raw")).first()[0] or 0.0
    eps_floor = epsilon * avg_idf
    vocab = vocab.withColumn(
        "_idf",
        F.when(F.col("_idf_raw") < 0, F.lit(eps_floor)).otherwise(
            F.col("_idf_raw")
        ),
    )

    q_stats = {
        r["_t"]: r["_idf"]
        for r in vocab.filter(F.col("_t").isin(q_terms)).collect()
    }

    dl_norm = k1 * (1.0 - b + b * (F.col("_dl").cast("double") / F.lit(avgdl)))
    score = F.lit(0.0)
    for t in q_tokens:
        idf_t = float(q_stats.get(t, 0.0))
        tf = F.size(F.filter(F.col("_toks"), lambda x: x == t)).cast("double")
        score = score + F.lit(idf_t) * tf * (k1 + 1.0) / (tf + dl_norm)

    out = docs.select(F.col("_id").alias(id_col), score.alias("bm25_score"))
    if not normalize:
        return out
    # seeder min-max normalization (:1410-1420); all-equal -> 0.5.
    # Two scalars via agg + broadcast cross-join — an unpartitioned
    # window here would funnel every row through one task.
    mm = out.agg(
        F.min("bm25_score").alias("_mn"), F.max("bm25_score").alias("_mx")
    )
    norm = F.when(F.col("_mx") == F.col("_mn"), 0.5).otherwise(
        (F.col("bm25_score") - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
    )
    return out.crossJoin(F.broadcast(mm)).select(
        id_col, norm.alias("bm25_score")
    )


def coverage(df: DataFrame, text_col: str, id_col: str, query: str) -> DataFrame:
    """Adaptive coverage (adaptive_crawler.py:306-345): per query term
    ``(df/N) * (1 + 0.5 * ln(1+tf)/ln(1+max_tf))`` averaged over the
    query token LIST (duplicates count twice, as in the reference),
    then sqrt-curved and capped at 1. One-row DataFrame."""
    q_terms = _adaptive_query_terms(query)
    if not q_terms:
        return df.sparkSession.createDataFrame([(0.0,)], "coverage double")
    terms = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_adaptive_tokens(F.col(text_col))).alias("_t"),
    )
    stats = terms.groupBy("_t").agg(
        F.count("*").alias("_tf"), F.countDistinct("_id").alias("_df")
    )
    scalars = stats.agg(F.max("_tf").alias("max_tf")).first()
    max_tf = scalars["max_tf"] or 1
    n_docs = df.count()

    q = stats.filter(F.col("_t").isin(q_terms)).select(
        "_t",
        (
            (F.col("_df").cast("double") / F.lit(float(n_docs)))
            * (
                1.0
                + 0.5
                * F.log(1.0 + F.col("_tf"))
                / F.lit(math.log(1.0 + max_tf))
            )
        ).alias("_score"),
    )
    found = {r["_t"]: r["_score"] for r in q.collect()}
    avg = sum(found.get(t, 0.0) for t in q_terms) / len(q_terms)
    cov = min(1.0, math.sqrt(avg))
    spark = df.sparkSession
    return spark.createDataFrame([(cov,)], "coverage double")


def consistency(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Mean pairwise Jaccard of document term SETS
    (adaptive_crawler.py:347-372). Pairs with empty INTERSECTION count
    as 0, but pairs where either doc's term set is EMPTY are excluded
    entirely (the reference's `if terms_i and terms_j` guard) — the
    denominator is C(m,2) over the m docs with nonempty term sets, and
    no qualifying pair at all yields 0.0. The <2-docs early exit of 1.0
    counts ALL docs, empty or not, like the reference's
    knowledge_base length check."""
    n = df.count()
    if n < 2:
        return df.sparkSession.createDataFrame([(1.0,)], "consistency double")
    ts = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_adaptive_tokens(F.col(text_col))).alias("_t"),
    ).distinct()
    sizes = ts.groupBy("_id").agg(F.count("*").alias("_n"))
    a, b = ts.alias("a"), ts.alias("b")
    inter = (
        a.join(b, (F.col("a._t") == F.col("b._t")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
        .agg(F.count("*").alias("_i"))
    )
    j = (
        inter.join(sizes.select(F.col("_id").alias("ia"), F.col("_n").alias("_na")), "ia")
        .join(sizes.select(F.col("_id").alias("ib"), F.col("_n").alias("_nb")), "ib")
        .select(
            (
                F.col("_i").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_i"))
            ).alias("_j")
        )
    )
    total = j.agg(F.sum("_j")).first()[0] or 0.0
    m = sizes.count()  # docs with at least one adaptive token
    pairs = m * (m - 1) / 2
    cons = total / pairs if pairs > 0 else 0.0
    return df.sparkSession.createDataFrame([(cons,)], "consistency double")


def saturation(df: DataFrame, text_col: str, round_col: str) -> DataFrame:
    """New-term discovery decay (adaptive_crawler.py:374-389): per-round
    counts of first-seen terms; saturation = 1 - recent/initial with
    zero-guards; <2 rounds -> 0.

    The reference appends to new_terms_history once per DOCUMENT
    (update_state, adaptive_crawler.py:566-568) — an inherently
    sequential notion; per-round is the batch-engine analogue and is
    EXACTLY the reference number when each round holds one document
    (pinned live in tests/test_reference_differential.py)."""
    first_seen = (
        df.select(
            F.col(round_col).alias("_r"),
            F.explode(_adaptive_tokens(F.col(text_col))).alias("_t"),
        )
        .groupBy("_t")
        .agg(F.min("_r").alias("_first"))
        .groupBy("_first")
        .agg(F.count("*").alias("_new"))
    )
    # rounds that discovered NOTHING still append to the reference's
    # history (update_state records 0 for such documents) — a left join
    # from the distinct round set keeps them; groupBy alone would drop
    # them and skew recent/initial
    hist_df = (
        df.select(F.col(round_col).alias("_first"))
        .distinct()
        .join(first_seen, "_first", "left")
        .select("_first", F.coalesce(F.col("_new"), F.lit(0)).alias("_new"))
        .orderBy("_first")
    )
    hist = [int(r["_new"]) for r in hist_df.collect()]
    if len(hist) < 2:
        sat = 0.0
    else:
        recent = hist[-1] if hist[-1] > 0 else 1
        initial = hist[0] if hist[0] > 0 else 1
        sat = max(0.0, min(1.0 - recent / initial, 1.0))
    return df.sparkSession.createDataFrame([(sat,)], "saturation double")


def confidence(
    df: DataFrame, text_col: str, id_col: str, round_col: str, query: str
) -> DataFrame:
    """0.4*coverage + 0.3*consistency + 0.3*saturation
    (adaptive_crawler.py:287-304)."""
    cov = coverage(df, text_col, id_col, query).first()[0]
    cons = consistency(df, text_col, id_col).first()[0]
    sat = saturation(df, text_col, round_col).first()[0]
    conf = 0.4 * cov + 0.3 * cons + 0.3 * sat
    return df.sparkSession.createDataFrame(
        [(cov, cons, sat, conf)],
        "coverage double, consistency double, saturation double, confidence double",
    )
