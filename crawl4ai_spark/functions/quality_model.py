"""Hashed-n-gram linear quality classifier (fastText-style plumbing).

Model-based quality filtering is the other half of a training-data
pipeline's quality stage (next to the heuristic signals in
functions/text.py and functions/repetition.py): hash the document's
word n-grams into a weight table, average the weights, threshold. The
reference has no model-based filter (its relevance scoring is BM25 —
crawl4ai/adaptive_crawler.py); this module adds the standard CCNet /
fastText-classifier shape with a pluggable weight table.

Two execution paths with IDENTICAL results (both gate-checked through
the tagged-union catalog entry):

- row-local: weights derived per-gram by a hash expression — zero
  shuffle, the whole score is one array aggregate inside codegen.
  This is the shape for hash-bucketed models (fastText's hashing
  trick): at 100 TB every row is scored where it sits.
- vocab-join: explode grams, broadcast-join an explicit weights table,
  re-aggregate per doc. This is the shape for REAL trained weights
  (vocab of millions doesn't fit an expression); the explode rows are
  (id, gram) only, the join is broadcast (no shuffle of the corpus),
  and the groupBy(id) re-aggregation partial-aggregates map-side
  because a document's grams never leave their partition.

Weights are integer milli-units in [-1000, 1000]; the default table
derives them from an md5 hash of the gram, which is implemented
identically in Spark and DuckDB, so the full pipeline — including the
broadcast-join path — replays exactly in the SQL oracle. Real users
swap in a trained weights DataFrame with the same (gram, w_shift)
schema. All arithmetic is on SHIFTED weights (w + 1000 >= 0): integer
division of nonnegative operands is engine-portable floor division,
where negative-operand semantics differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .repetition import word_ngrams

SHIFT = 1000  # weights live in [-1000, 1000] milli-units


def gram_weight_shifted(gram: Column) -> Column:
    """Deterministic md5-derived weight, SHIFTED to [0, 2000].

    True weight = this - 1000. Portable: Spark and DuckDB md5 agree
    byte-for-byte, and the 60-bit hex prefix fits a BIGINT.
    """
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
    return h % (2 * SHIFT + 1)


def classifier_score_milli(words: Column, ngram: int = 2) -> Column:
    """Row-local mean n-gram weight in milli-units [-1000, 1000].

    score = (sum of shifted weights div gram count) - 1000; documents
    with fewer than `ngram` words score a neutral 0.
    """
    g = word_ngrams(words, ngram)
    zero = F.lit(0).cast("long")
    s = F.aggregate(g, zero, lambda acc, x: acc + gram_weight_shifted(x))
    n = F.size(g).cast("long")
    return F.when(
        n > 0, ((s - s % n) / n).cast("long") - F.lit(SHIFT).cast("long")
    ).otherwise(zero)


def default_weights(docs: DataFrame, words: Column) -> DataFrame:
    """The md5-derived weight table over the corpus vocabulary of
    n-grams — stands in for trained weights in tests/oracles."""
    return (
        docs.select(F.explode(words).alias("gram"))
        .distinct()
        .select("gram", gram_weight_shifted(F.col("gram")).alias("w_shift"))
    )


def classifier_scores_vocab(
    docs: DataFrame,
    id_col: str,
    words: Column,
    weights: DataFrame,
    ngram: int = 2,
) -> DataFrame:
    """Vocab-join path: explode n-grams, broadcast-join `weights`
    (gram, w_shift in [0, 2000]), mean per document.

    Unseen grams score neutral (shift = 1000). Returns
    (id_col, score_milli) — identical to classifier_score_milli when
    `weights` carries the default hash weights for every gram.
    """
    g = docs.select(id_col, F.explode(word_ngrams(words, ngram)).alias("gram"))
    joined = g.join(F.broadcast(weights), "gram", "left").select(
        id_col,
        F.coalesce(F.col("w_shift"), F.lit(SHIFT)).cast("long").alias("w"),
    )
    agg = joined.groupBy(id_col).agg(
        F.sum("w").alias("s"), F.count("*").cast("long").alias("n")
    )
    score = ((F.col("s") - F.col("s") % F.col("n")) / F.col("n")).cast(
        "long"
    ) - F.lit(SHIFT).cast("long")
    scored = agg.select(id_col, score.alias("score_milli"))
    # docs below `ngram` words have no exploded rows: neutral 0
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("score_milli"), F.lit(0).cast("long")).alias(
                "score_milli"
            ),
        )
    )
