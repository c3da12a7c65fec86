"""Distributed BPE tokenizer training + corpus encoding.

The tokenizer is part of the training-data pipeline (the corpus this
engine builds gets tokenized before packing —
operators/packing.py consumes token counts; functions/text.py
`bpe_ish_token_count` is only a regex proxy). This module implements
real byte-pair-encoding (Sennrich et al., ACL 2016) the way production
trainers do it at scale (HuggingFace tokenizers, SentencePiece):

1. **word-frequency aggregation is the distributed part** — BPE never
   iterates over the corpus; it iterates over the DISTINCT-WORD
   frequency table, which is Heaps-law bounded (a 100 TB corpus has
   ~10^7-10^8 distinct words, not 10^13). One partial-agg groupBy
   shuffles (word, count) pairs only.
2. **the merge loop runs on the collected vocabulary** — each of the
   `num_merges` iterations scans the vocab dict in memory; a driver
   guard (same discipline as the politeness broadcast and merge_by_key
   guards) refuses vocabularies past `max_vocab_rows` instead of
   silently OOMing the driver. Ties break deterministically
   (count desc, pair lexicographic asc) so training is reproducible
   across engines and partitionings.
3. **encoding fans back out** — the learned merge ranks broadcast to
   executors (a merge table is KBs), and the corpus encodes through
   one Arrow-batched mapInPandas: embarrassingly parallel, zero
   shuffle, the same shape as the scrape stage.

Word-level BPE (GPT-2 style): merges never cross word boundaries; each
word starts as its character sequence plus a trailing end-of-word
marker `</w>` so the tokenizer distinguishes "low" in "lowest" from
the standalone word.

No reference counterpart (crawl4ai has no tokenizer tier); cited as
training-pipeline surface alongside packing (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


# ---------------------------------------------------------------------------
# pure-python core (runs on the driver over the vocab, and in tests)
# ---------------------------------------------------------------------------

def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def merges_from_vocab(
    vocab: dict[str, int], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a {word: count} table.

    Deterministic: the winning pair is max by (count, then
    lexicographically SMALLEST pair on ties). Stops early when no pair
    reaches ``min_pair_count``.
    """
    seqs: dict[tuple[str, ...], int] = {}
    for w, c in vocab.items():
        s = _word_symbols(w)
        seqs[s] = seqs.get(s, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for s, c in seqs.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < int(min_pair_count):
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        nxt: dict[tuple[str, ...], int] = {}
        for s, c in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pair[0] and s[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        seqs = nxt
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank pair first — the
    standard BPE inference order, matching training order)."""
    s = list(_word_symbols(word))
    while len(s) > 1:
        best_i, best_r = -1, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


# ---------------------------------------------------------------------------
# distributed API
# ---------------------------------------------------------------------------

def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the corpus — the only corpus-wide pass BPE
    needs. Partial-aggregable groupBy; empty tokens dropped."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    max_vocab_rows: int = 2_000_000,
    word_freqs: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge loop.

    The collect is of the DISTINCT-word table only; ``max_vocab_rows``
    is the explicit driver guard — raise it consciously or pre-filter
    (e.g. drop hapaxes with a count>=2 filter) rather than letting a
    pathological corpus (random bytes -> unbounded vocab) OOM the
    driver.

    ``word_freqs`` lets a caller training several tokenizer tiers over
    the same corpus share ONE (word, count) pass (persist it first) —
    the corpus scan is the only non-driver cost here.
    """
    wf = word_freqs if word_freqs is not None else word_frequencies(docs, text_col)
    # one job: the limited collect both enforces the guard and returns
    # the vocab (a separate count() would re-run the corpus aggregation)
    rows = wf.limit(int(max_vocab_rows) + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"distinct-word table exceeds max_vocab_rows={max_vocab_rows}; "
            "pre-filter rare words or raise the guard"
        )
    vocab = {r["word"]: r["count"] for r in rows}
    return merges_from_vocab(vocab, num_merges, min_pair_count)


def bpe_encode_stage(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append the BPE token array (one Arrow-batched mapInPandas; the
    merge ranks ride the closure — KBs — no join, no shuffle)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
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
                        got = encode_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(encode, schema)


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Docs plus an exact `bpe_n_tokens` column — the real-tokenizer
    replacement for functions/text.py bpe_ish_token_count, feeding
    operators/packing.py directly."""
    enc = bpe_encode_stage(docs, merges, text_col, out_col="_bpe")
    return enc.withColumn(
        "bpe_n_tokens", F.size("_bpe").cast("long")
    ).drop("_bpe")
