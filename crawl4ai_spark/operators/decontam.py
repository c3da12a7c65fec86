"""Benchmark decontamination — n-gram overlap between a training corpus
and an evaluation set.

Standard training-data hygiene (GPT-3 appendix C / The Pile: flag any
training document sharing a 13-gram with a benchmark): the reference
crawler has no notion of it (its dedup is URL/content-hash only,
async_database.py:527-541), but any 100 TB corpus built from crawl
output needs the check before training.

Scale design:
- The eval set is small (benchmarks are MBs); its distinct shingle keys
  are BROADCAST, so the corpus side is one narrow scan + explode +
  broadcast hash join — the 100 TB side never shuffles for the join.
- Only MATCHED (doc, shingle) rows reach the aggregation, and
  countDistinct partial-aggregates map-side — the shuffle is bounded by
  the contamination volume, not the corpus size.
- Shingle keys: xxhash64 (default, cheapest), md5-prefix (engine-
  portable — used by the SQL-replay gate oracle), or raw strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def _shingle_key(col: Column, hash_fn: str | None) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.substring(F.md5(col), 1, 16)
    if hash_fn is None:
        return col
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    ngram: int = 13,
    hash_fn: str | None = "xxhash64",
) -> DataFrame:
    """Per training document: how many of its distinct `ngram`-grams
    appear anywhere in the eval set, and a contaminated flag.

    Documents shorter than `ngram` tokens fall back to one whole-text
    shingle (same rule as functions.text.shingles) so short docs are
    still checked, not silently passed.

    Returns (<id_col>, n_contaminated_ngrams, contaminated) for every
    input document (zero-match docs included).
    """
    key = lambda c: _shingle_key(c, hash_fn)  # noqa: E731
    ev = (
        eval_docs.select(
            F.explode(shingles(F.col(eval_text_col or text_col), ngram)).alias("_s")
        )
        .select(key(F.col("_s")).alias("_k"))
        .distinct()
    )
    ds = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), ngram)).alias("_s")
    ).select(id_col, key(F.col("_s")).alias("_k"))
    hits = (
        ds.join(F.broadcast(ev), "_k")
        .groupBy(id_col)
        .agg(F.count_distinct("_k").alias("_n"))
    )
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("long")
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n.alias("n_contaminated_ngrams"),
            (n > 0).cast("int").alias("contaminated"),
        )
    )
