"""Sequence packing: turn a ragged document corpus into fixed-length
training sequences.

The last mile of a training-data pipeline (after quality filtering,
dedup, decontamination, sampling) is packing tokenized documents into
the fixed-length examples the trainer consumes. The reference stops at
extraction (crawl4ai produces markdown/text per page, e.g.
crawl4ai/content_scraping_strategy.py); this supplies the packing tier
on top, in the two standard shapes:

- **concat-and-chunk** (the GPT/LLaMA recipe): concatenate all
  documents in a deterministic order with one EOS separator token after
  each, then cut the global token stream every `seq_len` tokens.
  Utilization is ~100 % (only the final partial sequence pads);
  documents crossing a cut are split across two (or more) sequences.
- **truncate-and-pad**: one document per sequence, truncated to
  `seq_len`, padded to fill. No document ever splits; the padding waste
  is the price.

Everything is integer arithmetic on token COUNTS — the assignment
(which doc lands where in which sequence) is decided without touching
token ids, so the expensive tokenized arrays only move once, in the
final gather. The output is the assignment table
(id, seq_id, doc_offset, seq_offset, n_piece): one row per
(document × sequence) intersection.

Scale shape — the global prefix sum is the crux. A bare
``sum() over (order by id)`` window has no partition key, so Spark
funnels the whole corpus through ONE task: correct at sf0.1, dead at
100 TB. Instead the offset is computed in two phases, mirroring the
classic distributed scan:

1. per-bucket local prefix sums — ``partition by bucket order by id``
   windows run in parallel, one task per bucket;
2. bucket base offsets — aggregate one row per bucket (num_buckets
   rows total), exclusive-prefix-sum THAT tiny table (its unpartitioned
   window touches only num_buckets rows, bounded by construction), and
   broadcast-join the bases back.

``bucket`` must be monotone non-decreasing in the order key (bucket
boundaries are contiguous id ranges); for dense integer ids
``id div docs_per_bucket`` does it. global_offset = bucket_base +
local_offset, bit-exact regardless of parallelism — the whole pipeline
replays in portable SQL, so the CORRECTNESS oracle checks the exact
assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_offsets(
    df: DataFrame,
    id_col: str,
    n_col: str,
    docs_per_bucket: int = 4096,
) -> DataFrame:
    """Exclusive prefix sum of `n_col` in `id_col` order, two-phase.

    Adds `_g` (the global token offset of each row) without any
    unpartitioned window over the corpus. `id_col` must be a dense-ish
    integer key (bucket = id div docs_per_bucket must be monotone in
    id — gaps are fine, interleaving is not).
    """
    bucketed = df.withColumn(
        "_bk", (F.col(id_col) / F.lit(int(docs_per_bucket))).cast("long")
    )
    w_local = (
        Window.partitionBy("_bk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "_lend", F.sum(F.col(n_col)).over(w_local).cast("long")
    )
    totals = bucketed.groupBy("_bk").agg(
        F.sum(F.col(n_col)).cast("long").alias("_btot")
    )
    # num_buckets rows only: the unpartitioned window is bounded.
    w_bk = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bases = totals.withColumn(
        "_bbase", (F.sum("_btot").over(w_bk) - F.col("_btot")).cast("long")
    ).select("_bk", "_bbase")
    return (
        local.join(F.broadcast(bases), "_bk")
        .withColumn(
            "_g", (F.col("_bbase") + F.col("_lend") - F.col(n_col)).cast("long")
        )
        .drop("_bk", "_lend", "_bbase")
    )


def pack_concat_chunk(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    seq_len: int,
    eos_tokens: int = 1,
    docs_per_bucket: int = 4096,
) -> DataFrame:
    """Concat-and-chunk assignment table.

    Returns one row per (document × sequence) intersection:
    (id_col, seq_id, doc_offset, seq_offset, n_piece) — read: tokens
    [doc_offset, doc_offset + n_piece) of the doc (its `n_tokens` ids
    followed by `eos_tokens` separators) land at [seq_offset,
    seq_offset + n_piece) of sequence seq_id. Zero-token docs still
    contribute their EOS (they mark a document boundary), matching the
    concatenation semantics.
    """
    L = int(seq_len)
    eff = (n_tokens.cast("long") + F.lit(int(eos_tokens))).alias("_n")
    base = df.select(F.col(id_col), eff)
    with_g = global_offsets(base, id_col, "_n", docs_per_bucket)
    # zero-effective-length docs (eos_tokens=0) occupy no positions and
    # must emit no assignment rows: at a sequence boundary their
    # last_seq < first_seq, and F.sequence would generate a DESCENDING
    # range — phantom pieces with out-of-range seq_offset
    with_g = with_g.filter(F.col("_n") > 0)
    first_seq = (F.col("_g") / F.lit(L)).cast("long")
    last_seq = ((F.col("_g") + F.col("_n") - 1) / F.lit(L)).cast("long")
    pieces = with_g.select(
        id_col,
        "_g",
        "_n",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * F.lit(L)
    p_start = F.greatest(F.col("_g"), seq_start)
    p_end = F.least(F.col("_g") + F.col("_n"), seq_start + F.lit(L))
    return pieces.select(
        id_col,
        "seq_id",
        (p_start - F.col("_g")).cast("long").alias("doc_offset"),
        (p_start - seq_start).cast("long").alias("seq_offset"),
        (p_end - p_start).cast("long").alias("n_piece"),
    )


def pack_truncate_pad(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    seq_len: int,
    eos_tokens: int = 1,
) -> DataFrame:
    """Truncate-and-pad assignment: one sequence per document
    (seq_id = the document id), same schema as pack_concat_chunk.
    Row-local — no shuffle at all."""
    L = int(seq_len)
    eff = n_tokens.cast("long") + F.lit(int(eos_tokens))
    return df.select(
        F.col(id_col),
        F.col(id_col).cast("long").alias("seq_id"),
        F.lit(0).cast("long").alias("doc_offset"),
        F.lit(0).cast("long").alias("seq_offset"),
        F.least(eff, F.lit(L)).cast("long").alias("n_piece"),
    )


def packing_stats(assignment: DataFrame, seq_len: int) -> DataFrame:
    """Utilization summary of an assignment table: sequences emitted,
    tokens placed, padding fraction in parts-per-million (integer —
    engine-portable), and how many documents were split across
    sequences."""
    L = int(seq_len)
    id_col = assignment.columns[0]
    splits = (
        assignment.groupBy(id_col)
        .agg(F.count("*").alias("_pieces"))
        .agg(
            F.sum((F.col("_pieces") > 1).cast("long"))
            .cast("long")
            .alias("split_docs")
        )
    )
    agg = assignment.agg(
        F.countDistinct("seq_id").cast("long").alias("n_seqs"),
        F.coalesce(F.sum("n_piece"), F.lit(0)).cast("long")
        .alias("tokens_placed"),
    )
    cap = F.col("n_seqs") * F.lit(L)
    pad = (cap - F.col("tokens_placed")) * F.lit(1_000_000)
    # integer floor division on nonnegative operands (engine-portable);
    # cap == 0 (empty assignment) must yield a zero-stats row, not a
    # null (or an ANSI divide-by-zero)
    pad_ppm = F.when(
        cap > 0, ((pad - pad % cap) / cap).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return agg.crossJoin(splits).select(
        "n_seqs",
        "tokens_placed",
        pad_ppm.alias("pad_ppm"),
        F.coalesce(F.col("split_docs"), F.lit(0).cast("long"))
        .alias("split_docs"),
    )
