"""Distributed unigram-LM tokenizer training + encoding (the unigram
model of SentencePiece; Kudo, ACL 2018 "Subword Regularization").

The second tokenizer tier next to operators/bpe.py: BPE grows a vocab
bottom-up by merging; the unigram model starts from a large seed vocab
and PRUNES it under a piece-probability model, segmenting by Viterbi.
Production trainers (SentencePiece) run this over a word-frequency
table, which is exactly what Spark is good at:

1. **one corpus pass** — the same ``word_frequencies`` groupBy the BPE
   trainer uses (Heaps-law bounded distinct-word table; partial-agg,
   8-byte-ish shuffle rows). The corpus is never touched again.
2. **seeding** is a pure-Column substring explode over the word table
   (every substring up to ``max_piece_len`` weighted by word count)
   plus a distributed top-k — no driver collect of the word table.
3. **each EM iteration is a distributed E-step**: broadcast the
   current piece-cost table (vocab_size rows, KBs) into one Arrow
   mapInPandas that Viterbi-segments every distinct word and emits
   task-preaggregated piece counts; an M-step groupBy sums them. The
   driver only ever materializes the PIECE table — unlike BPE's merge
   loop it never holds the word table, so there is no driver guard to
   trip at 100 TB.
4. **encoding** is one mapInPandas with the final costs in the
   closure and a per-task word cache — zero shuffle, the scrape-stage
   shape (operators/bpe.py bpe_encode_stage).

Determinism / honest divergences from SentencePiece:
- piece costs are INTEGER micro-nats derived from exact integer
  counts (round(-ln(c/total) * 1e6 + 1e-9) — the repo's standard
  cross-engine quantization), so training is bit-reproducible across
  partitionings, engines, and re-runs;
- the E-step uses hard (Viterbi) counts, not forward-backward
  expected counts — the classic hard-EM simplification; pruning keeps
  the highest-Viterbi-count pieces rather than re-scoring the
  likelihood loss per removed piece;
- ties in the Viterbi DP break toward the LONGER piece, then by the
  DP's deterministic scan order; pruning ties break (count desc,
  piece asc).

Single-character pieces are never pruned (full coverage — every word
segments); characters unseen at encode time cost ``UNK_COST``.

No reference counterpart (crawl4ai has no tokenizer tier); cited as
training-pipeline surface alongside BPE/packing (SURVEY.md §8).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_frequencies

UNK_COST = 20_000_000  # micro-nats for a character not in the vocab


def _cost_table(counts: dict[str, int]) -> dict[str, int]:
    """Integer micro-nat costs from integer counts (drops count<=0)."""
    total = sum(c for c in counts.values() if c > 0)
    if total <= 0:
        return {}
    return {
        p: int(round(-math.log(c / total) * 1e6 + 1e-9))
        for p, c in counts.items()
        if c > 0
    }


def viterbi_segment(
    word: str, costs: dict[str, int], max_piece_len: int = 8
) -> list[str]:
    """Min-total-cost segmentation; ties prefer the longer final piece
    (scanned in ascending length with ``<=`` update). Every position is
    reachable: unknown single characters cost ``UNK_COST``."""
    n = len(word)
    if max_piece_len < 1:
        raise ValueError(
            f"max_piece_len must be >= 1, got {max_piece_len}"
        )
    best = [0] + [None] * n          # type: list[int | None]
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        b, bl = None, 0
        for l in range(1, min(max_piece_len, i) + 1):
            prev = best[i - l]
            if prev is None:
                continue
            piece = word[i - l : i]
            c = costs.get(piece)
            if c is None:
                if l != 1:
                    continue
                c = UNK_COST
            cand = prev + c
            if b is None or cand <= b:
                b, bl = cand, l
        best[i], back[i] = b, bl
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def seed_piece_counts(
    wf: DataFrame, max_piece_len: int = 8, seed_size: int = 16_000
) -> DataFrame:
    """(piece, count) seed vocabulary: every substring of every
    distinct word up to ``max_piece_len``, weighted by word frequency;
    the top ``seed_size`` multi-char pieces by (count desc, piece asc)
    plus ALL single characters. Pure Column substring explode + two
    partial-agg groupBys + a distributed top-k — the word table never
    reaches the driver."""
    n = F.length("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), n - i + 1),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    pieces = (
        wf.select(F.explode(subs).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").cast("long").alias("count"))
    )
    chars = pieces.filter(F.length("piece") == 1)
    multi = (
        pieces.filter(F.length("piece") > 1)
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(int(seed_size))
    )
    return chars.unionByName(multi)


def em_piece_counts(
    wf: DataFrame, costs: dict[str, int], max_piece_len: int = 8
) -> DataFrame:
    """Distributed hard-EM E-step: Viterbi-segment every distinct word
    under ``costs`` and return (piece, count) Viterbi counts weighted
    by word frequency. Counts are pre-aggregated per Arrow batch
    (manual map-side combine) before the M-step groupBy."""
    import pandas as pd

    mpl = int(max_piece_len)

    def estep(batches):
        for pdf in batches:
            agg: dict[str, int] = {}
            # no word cache here: wf is the word_frequencies groupBy
            # output, so every word in the batch is already distinct
            for w, c in zip(pdf["word"], pdf["count"]):
                seg = viterbi_segment(w, costs, mpl)
                for p in seg:
                    agg[p] = agg.get(p, 0) + int(c)
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "n": list(agg.values())}
            )

    return (
        wf.mapInPandas(estep, "piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("count"))
    )


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4_000,
    seed_size: int | None = None,
    iters: int = 4,
    max_piece_len: int = 8,
    prune_keep: float = 0.75,
    word_freqs: "DataFrame | None" = None,
) -> dict[str, int]:
    """Train the unigram vocab; returns {piece: cost in micro-nats}.

    Each iteration: distributed Viterbi E-step over the (persisted)
    word table -> M-step count groupBy -> collect the piece table
    (<= seed_size rows) -> prune multi-char pieces toward
    ``vocab_size`` keeping every single character -> rebuild costs.

    ``word_freqs``: a precomputed (word, count) table to share one
    corpus pass with a sibling trainer (caller persists and owns it;
    it is not unpersisted here).
    """
    owned = word_freqs is None
    wf = (
        word_frequencies(docs, text_col).persist()
        if owned
        else word_freqs
    )
    try:
        seed = seed_piece_counts(
            wf, max_piece_len, seed_size or 4 * vocab_size
        )
        counts = {r["piece"]: r["count"] for r in seed.collect()}
        # the corpus' character inventory — kept in the vocab forever
        # (full coverage): a char whose every occurrence is absorbed
        # into longer pieces would otherwise get Viterbi count 0 and
        # silently fall out, leaving coverage to the UNK fallback
        char_set = {p for p in counts if len(p) == 1}
        costs = _cost_table(counts)
        for it in range(int(iters)):
            em = em_piece_counts(wf, costs, max_piece_len)
            counts = {r["piece"]: r["count"] for r in em.collect()}
            chars = {p: max(counts.get(p, 0), 1) for p in char_set}
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            # prune multi-char pieces geometrically toward the target
            # (SentencePiece's gradual shrink); the LAST iteration
            # lands exactly on vocab_size so the returned vocab always
            # meets the contract
            target = max(int(vocab_size) - len(chars), 0)
            if it == int(iters) - 1:
                n_multi = min(len(multi), target)
            else:
                n_multi = min(
                    len(multi),
                    max(target, int(len(multi) * float(prune_keep))),
                )
            kept = dict(multi[:n_multi])
            kept.update(chars)
            costs = _cost_table(kept)
        return costs
    finally:
        if owned:
            wf.unpersist()


def unigram_encode_stage(
    docs: DataFrame,
    costs: dict[str, int],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Append the unigram token array — one Arrow-batched mapInPandas,
    costs in the closure (KBs), per-task word cache, zero shuffle.

    ``max_piece_len`` defaults to the longest piece in ``costs`` so a
    vocab trained with any width segments exactly as trained — passing
    a smaller width would silently make long pieces unreachable."""
    import pandas as pd  # noqa: F401  (imported for the worker)

    mpl = int(
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in costs), default=1)
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{fields}, {out_col} array<string>"

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                out: list[str] = []
                for w in (t or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = viterbi_segment(w, costs, mpl)
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(encode, schema)


def unigram_token_count(
    docs: DataFrame,
    costs: dict[str, int],
    text_col: str = "text",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Docs plus an exact ``unigram_n_tokens`` column (packing input,
    same contract as operators/bpe.py bpe_token_count). The DP width
    follows the vocab's longest piece unless overridden."""
    enc = unigram_encode_stage(
        docs, costs, text_col, out_col="_ut", max_piece_len=max_piece_len
    )
    return enc.withColumn(
        "unigram_n_tokens", F.size("_ut").cast("long")
    ).drop("_ut")
