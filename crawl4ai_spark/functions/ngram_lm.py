"""Corpus-trained bigram language-model scoring (CCNet's LM stage).

CCNet (Wenzek et al., LREC 2020 §3.3) buckets web documents by the
perplexity of a KenLM n-gram model — the standard "does this read like
language or like noise" quality tier next to the heuristic signals
(functions/text.py, functions/repetition.py) and the hashed linear
classifier (functions/quality_model.py). The reference has no LM
notion at all (its only relevance score is query-BM25,
crawl4ai/adaptive_crawler.py); this module supplies the pipeline shape
with a from-scratch Jelinek-Mercer-interpolated bigram model trained
on the corpus itself (self-perplexity — the common bootstrap when no
external LM ships with the job; a pre-trained count table can be
passed in instead).

Model: for each in-document transition (w1 -> w2)

    p(w2 | w1) = 0.7 * c(w1,w2)/c(w1)  +  0.3 * (c(w2)+1)/(T+V)

(bigram MLE interpolated with an add-one unigram; T = total tokens,
V = vocabulary size). A document's score is its mean token cost
-ln p in MILLI-nats — i.e. 1000 * ln(perplexity) — so low = fluent /
common text, high = gibberish; CCNet keeps the low-to-middle buckets.

Determinism across engines (the CORRECTNESS gate's SQL-replay oracle):
counts are exact integers; p is two IEEE double ops evaluated in the
same order on both sides; the only libm call (ln) is quantized per
token to integer micro-nats with the repo's boundary guard
(round(x*1e6 + 1e-9)) BEFORE summing, so the per-document total is an
order-independent integer sum — the same trick that stabilized
bm25_corpus and the IVF assignment.

Scale design (100 TB):
- training is two groupBys over exploded grams with map-side partial
  aggregation; pass ``hash_keys=True`` to shuffle 8-byte xxhash64 keys
  instead of gram strings (the fastText hashing trick — collisions
  merge counts, acceptable for a quality prior);
- scoring explodes each document's transitions and joins the count
  tables; Spark broadcasts them when small, else the join is keyed by
  the same gram column the training groupBy produced (co-partitioned);
  the per-document re-aggregation partial-aggregates map-side;
- nothing touches the driver; scalar totals (T, V) ride along as
  literal columns via a 1-row cross join (broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LAMBDA_BI = 0.7   # bigram weight
LAMBDA_UNI = 0.3  # unigram backoff weight — an EXPLICIT literal, not
# 1.0 - LAMBDA_BI: that expression is 0.30000000000000004 in IEEE
# doubles, one ulp off the 0.3 the SQL oracle and python replays use,
# which would break the bit-exact cross-engine contract at the
# round-to-micro-nats seam


def _key(col: Column, hash_keys: bool) -> Column:
    return F.xxhash64(col) if hash_keys else col


def train_bigram_counts(
    docs: DataFrame,
    words: Column,
    hash_keys: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables from a corpus: (unigrams, bigrams, totals).

    unigrams: (w, c1) — token occurrence counts;
    bigrams:  (w1, w2, c12) — adjacent-pair counts within documents;
    totals:   one row (t_tokens, v_vocab).
    Keys are gram strings, or xxhash64 of them with ``hash_keys``.
    """
    toks = docs.select(F.explode(words).alias("_w")).select(
        _key(F.col("_w"), hash_keys).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            )
        ).alias("_p")
    ).select(
        _key(F.col("_p.0"), hash_keys).alias("w1"),
        _key(F.col("_p.1"), hash_keys).alias("w2"),
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    totals = uni.agg(
        F.sum("c1").cast("long").alias("t_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_vocab"),
    )
    return uni, bi, totals


def lm_doc_scores(
    docs: DataFrame,
    id_col: str,
    words: Column,
    uni: DataFrame,
    bi: DataFrame,
    totals: DataFrame,
    hash_keys: bool = False,
) -> DataFrame:
    """Per-document LM cost over the count tables.

    Output: (id_col, n_transitions, total_cost_e6, avg_cost_milli) —
    total integer micro-nat cost over the document's (w1 -> w2)
    transitions and its mean in milli-nats (1000*ln(perplexity));
    documents with < 2 tokens score 0. Every input document appears.
    """
    trans = docs.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            )
        ).alias("_i", "_p"),
    ).select(
        id_col,
        _key(F.col("_p.0"), hash_keys).alias("w1"),
        _key(F.col("_p.1"), hash_keys).alias("w2"),
    )
    # LEFT joins: with a PRE-TRAINED count table (documented use) a
    # document can contain out-of-vocabulary tokens — an inner join
    # silently dropped those transitions, so fully-OOV gibberish scored
    # avg_cost_milli=0 (maximally fluent), the exact documents this
    # stage exists to reject. OOV words take the add-one-smoothed
    # unigram floor (c2=0) and contribute no bigram evidence (c1=0
    # guard keeps the 0/0 NaN out). Same-corpus train+score (the gate
    # path) has no OOV rows, so those values are bit-unchanged.
    j = (
        trans.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1", "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    # identical expression structure on the oracle side: two products,
    # one sum, then ln — quantized per token before any aggregation
    bi_term = F.when(
        F.coalesce(F.col("c1"), F.lit(0)) > 0,
        F.lit(LAMBDA_BI)
        * (F.coalesce(F.col("c12"), F.lit(0)).cast("double") / F.col("c1")),
    ).otherwise(F.lit(0.0))
    p = bi_term + F.lit(LAMBDA_UNI) * (
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("t_tokens") + F.col("v_vocab"))
    )
    cost_e6 = F.round(-F.log(p) * F.lit(1000000.0) + F.lit(1e-9), 0).cast("long")
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum(cost_e6).cast("long").alias("total_cost_e6"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_transitions"), F.lit(0))
            .cast("long")
            .alias("n_transitions"),
            F.coalesce(F.col("total_cost_e6"), F.lit(0))
            .cast("long")
            .alias("total_cost_e6"),
            F.when(
                F.coalesce(F.col("n_transitions"), F.lit(0)) > 0,
                # integer division (SQL `div`), not floor(double/): a
                # double quotient can round up across an integer
                # boundary when the divisor almost exactly divides the
                # total, flaking the cross-engine hash
                F.expr("total_cost_e6 div (1000L * n_transitions)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("avg_cost_milli"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    cost_col: str = "avg_cost_milli",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet §3.3 head/middle/tail split: EXACT per-language perplexity
    tiers via ntile (bucket 1 = lowest perplexity = most fluent; CCNet
    keeps head+middle). Deterministic: ties broken by ``id_col``.

    This is the bit-exact/gate shape — a per-language window sort. At
    100 TB a handful of giant languages make those sorted partitions
    the job's skew ceiling; use ``bucket_thresholds`` +
    ``assign_buckets`` there instead (CCNet itself assigns by cutoff
    values computed once, not by globally sorting every shard).
    """
    w = Window.partitionBy(lang_col).orderBy(
        F.col(cost_col).asc(), F.col(id_col).asc()
    )
    return scored.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))


def bucket_thresholds(
    scored: DataFrame,
    lang_col: str = "lang",
    cost_col: str = "avg_cost_milli",
    n_buckets: int = 3,
) -> DataFrame:
    """Per-language perplexity cutoffs — the 100 TB path.

    One partial-aggregated groupBy computing the exact
    ``i/n_buckets`` percentiles of ``cost_col`` per language; output is
    a #languages-row dimension ``(lang_col, thresholds array)`` meant
    to be broadcast by ``assign_buckets``. Swap ``percentile`` for
    ``percentile_approx`` when even the per-language value lists strain
    executor memory (a documented accuracy seam, not a shape change).
    """
    qs = ", ".join(
        repr(i / n_buckets) for i in range(1, n_buckets)
    )
    return scored.groupBy(lang_col).agg(
        F.expr(f"percentile({cost_col}, array({qs}))").alias("thresholds")
    )


def assign_buckets(
    scored: DataFrame,
    thresholds: DataFrame,
    lang_col: str = "lang",
    cost_col: str = "avg_cost_milli",
) -> DataFrame:
    """Assign each document its CCNet bucket by cutoff comparison: a
    broadcast join against the ``bucket_thresholds`` dimension plus a
    row-local fold — zero sort, zero extra shuffle (the scan stays
    wherever it was partitioned).

    Semantics vs the exact ntile in ``perplexity_buckets``: cutoffs are
    interpolated percentiles, so rows adjacent to a boundary (and rows
    tying a boundary value) can land one bucket away from the ntile
    assignment; both tierings are monotone in cost and converge as the
    per-language population grows — this is CCNet's own shape (fixed
    cutoff values applied per shard), not an approximation bug.
    Languages absent from the threshold dimension default to bucket 1
    (kept) — score them against a training corpus that covers them."""
    return scored.join(F.broadcast(thresholds), lang_col, "left").withColumn(
        "ppl_bucket",
        F.aggregate(
            F.coalesce("thresholds", F.array()),
            F.lit(1),
            lambda acc, t: acc + (F.col(cost_col) > t).cast("int"),
        ),
    ).drop("thresholds")


def lm_self_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_keys: bool = False,
) -> DataFrame:
    """Train on the corpus, score the corpus (CCNet-style buckets from
    a single pass). Output as ``lm_doc_scores``."""
    words = F.split(F.col(text_col), " ")
    uni, bi, totals = train_bigram_counts(docs, words, hash_keys=hash_keys)
    return lm_doc_scores(
        docs, id_col, words, uni, bi, totals, hash_keys=hash_keys
    )
