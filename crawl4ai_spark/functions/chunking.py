"""Chunking strategies as native Spark array expressions (SURVEY.md X5).

Reference: /root/reference/crawl4ai/chunking_strategy.py —
IdentityChunking (:28-34), RegexChunking (:38-61, default pattern
r"\\n\\n"), FixedLengthWordChunking (:146-171, chunk_size=100),
SlidingWindowChunking (:174-210, window=100 step=50),
OverlappingWindowChunking (:213-256, window=1000 overlap=100).

All chunkers are pure Column expressions over `split` + `sequence` +
`slice` + `array_join` — whole-stage codegen, no Python, no shuffle.
Word splitting matches Python's ``str.split()`` (any whitespace run,
no empty tokens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _words(text: Column) -> Column:
    """Python str.split() semantics: split on whitespace runs, drop
    empties (leading/trailing whitespace produces no tokens)."""
    return F.filter(F.split(text, "\\s+"), lambda w: w != "")


def identity_chunks(text: Column | str) -> Column:
    return F.array(_c(text))


def regex_chunks(text: Column | str, patterns: list[str] | None = None) -> Column:
    """Iterative regex splitting: each pattern re-splits every chunk
    produced by the previous one (reference :54-61)."""
    patterns = patterns or [r"\n\n"]
    arr = F.array(_c(text))
    for p in patterns:
        arr = F.flatten(F.transform(arr, lambda x: F.split(x, p)))
    return arr


def fixed_word_chunks(text: Column | str, chunk_size: int = 100) -> Column:
    """Non-overlapping chunks of `chunk_size` words (reference :166-171).

    chunk_size < 1 raises here at plan time. Divergence, deliberately
    safer: the reference's range() raises only for chunk_size == 0
    (ValueError: step cannot be zero); NEGATIVE sizes silently yield an
    empty range there — no chunks at all — which we treat as a caller
    bug rather than reproducing."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    w = _words(_c(text))
    n = F.size(w)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(chunk_size))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        starts, lambda s: F.array_join(F.slice(w, s, chunk_size), " ")
    )


def sliding_word_chunks(
    text: Column | str, window_size: int = 100, step: int = 50
) -> Column:
    """Overlapping windows advanced by `step` (reference :195-210):
    - len <= window -> [original text] (NOT re-joined words);
    - windows at i = 0, step, ... while i <= len - window;
    - if the loop's final i + window < len, append the last `window`
      words as a tail chunk.

    step < 1 raises here at plan time. Divergence, deliberately safer:
    the reference's range() raises only for step == 0; a NEGATIVE step
    there silently yields an empty range (tail-chunk-only output).
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    c = _c(text)
    w = _words(c)
    n = F.size(w)
    starts = F.sequence(F.lit(1), n - F.lit(window_size) + 1, F.lit(step))
    body = F.transform(starts, lambda s: F.array_join(F.slice(w, s, window_size), " "))
    # reference tail check uses the final loop i (= last element of starts)
    last_i = F.element_at(starts, -1) - 1  # back to 0-based
    tail_needed = (last_i + F.lit(window_size)) < n
    tail = F.array(F.array_join(F.slice(w, -window_size, window_size), " "))
    return F.when(n <= window_size, F.array(c)).otherwise(
        F.when(tail_needed, F.concat(body, tail)).otherwise(body)
    )


def overlapping_window_chunks(
    text: Column | str, window_size: int = 1000, overlap: int = 100
) -> Column:
    """Windows that restart at end - overlap (reference :240-256):
    starts are k*(window-overlap); the first start whose window reaches
    the end terminates the loop (its chunk included).

    overlap >= window_size is rejected here: the reference's while loop
    never advances on that input (start = end - overlap) and hangs on
    any text longer than the window — refusing the parameters is the
    deliberate divergence.
    """
    if overlap >= window_size:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than window_size "
            f"({window_size}) — the reference loops forever on this input"
        )
    c = _c(text)
    w = _words(c)
    n = F.size(w)
    stride = window_size - overlap
    n_chunks = F.lit(1) + F.ceil(
        (n - F.lit(window_size)).cast("double") / F.lit(float(stride))
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda k: k * stride + 1
    )
    body = F.transform(
        starts, lambda s: F.array_join(F.slice(w, s, window_size), " ")
    )
    return F.when(n <= window_size, F.array(c)).otherwise(body)


def sentence_chunks(text: Column | str, dedupe: bool = True) -> Column:
    """Regex sentence chunker standing in for NlpSentenceChunking
    (reference chunking_strategy.py:65-91: NLTK sent_tokenize, then
    ``list(set(...))``). nltk isn't in this environment; sentences are
    instead extracted natively as maximal runs ending in [.?!] (tail
    without terminator kept), trimmed, empties dropped. ``dedupe``
    mirrors the reference's set() dedup but keeps first-occurrence
    order rather than arbitrary set order (documented divergence — the
    reference discards order entirely)."""
    c = _c(text)
    arr = F.regexp_extract_all(c, F.lit(r"[^.?!]+[.?!]+|[^.?!]+$"), 0)
    arr = F.filter(F.transform(arr, lambda s: F.trim(s)), lambda s: s != "")
    return F.array_distinct(arr) if dedupe else arr


def topic_chunks(text: Column | str, w: int = 20, k: int = 2) -> Column:
    """TextTiling-style topic segmentation (X5's last chunker).

    Reference: /root/reference/crawl4ai/chunking_strategy.py:112-161
    TopicSegmentationChunking, which wraps nltk's TextTilingTokenizer.
    nltk is absent in this environment, so this is a from-scratch
    TextTiling approximation (Hearst 1997's published block-comparison
    scheme): pseudo-sentences of ``w`` words; at every gap, similarity =
    number of DISTINCT tokens shared by the ``k``-sentence blocks on
    either side; depth score = summed rises toward both neighbors; a
    boundary wherever depth strictly exceeds the per-document mean
    depth (``depth * n_gaps > sum(depths)``, all-integer so the result
    is bit-exact across engines and SQL-oracle-able).

    Pure Column expression form — correct everywhere, but only suitable
    for small inputs: Catalyst re-expands the chained intermediates at
    every reference (see :func:`topic_chunk_table`, the Arrow-batched
    production form, for the measured blowup and the scale story).
    """
    ws = _words(_c(text))
    n = F.size(ws)
    m = F.ceil(n / F.lit(float(w))).cast("int")
    empty_i = F.array().cast("array<int>")
    gaps = F.when(m >= 2, F.sequence(F.lit(0), m - 2)).otherwise(empty_i)

    def lstart(i):
        return F.greatest(i - (k - 1), F.lit(0))

    sims = F.transform(
        gaps,
        lambda i: F.size(
            F.array_intersect(
                F.slice(ws, lstart(i) * w + 1, (i + 1 - lstart(i)) * w),
                F.slice(ws, (i + 1) * w + 1, F.lit(k * w)),
            )
        ),
    )
    g = F.size(sims)
    depths = F.when(
        g > 0,
        F.transform(
            F.sequence(F.lit(0), g - 1),
            lambda j: F.greatest(
                F.when(
                    j > 0, F.element_at(sims, j) - F.element_at(sims, j + 1)
                ).otherwise(F.lit(0)),
                F.lit(0),
            )
            + F.greatest(
                F.when(
                    j < g - 1,
                    F.element_at(sims, j + 2) - F.element_at(sims, j + 1),
                ).otherwise(F.lit(0)),
                F.lit(0),
            ),
        ),
    ).otherwise(empty_i)
    total = F.aggregate(depths, F.lit(0), lambda a, x: a + x)
    bounds = F.filter(
        F.when(g > 0, F.sequence(F.lit(0), g - 1)).otherwise(empty_i),
        lambda j: F.element_at(depths, j + 1) * g > total,
    )
    starts = F.concat(F.array(F.lit(0)), F.transform(bounds, lambda b: (b + 1) * w))
    ends = F.concat(F.transform(bounds, lambda b: (b + 1) * w), F.array(n))
    chunks = F.zip_with(
        starts, ends, lambda s, e: F.array_join(F.slice(ws, s + 1, e - s), " ")
    )
    return F.filter(chunks, lambda c: c != "")


def topic_chunk_table(
    df,
    text_col: str,
    id_cols: list[str],
    w: int = 20,
    k: int = 2,
    spread: bool = True,
):
    """:func:`topic_chunks` as an Arrow-batched mapInPandas stage ->
    (ids..., chunk_idx, chunk) rows. Identical output to the Column
    form; this is the one to use on real data.

    Why not the pure Column expression: the algorithm's intermediates
    chain (tokens -> gap sims -> depths -> total -> boundaries ->
    spans) and each later stage references earlier ones several times.
    Catalyst re-inlines non-trivial subexpressions at every reference
    (measured: 277 copies of the tokenizing split in the optimized
    plan, ~50x per-row cost), staged ``withColumn`` projections get
    collapsed right back, and let-binding through
    ``transform(array(e), x -> body)`` sends the optimizer itself
    superlinear. A per-row dependency CHAIN like this is the documented
    boundary where built-in operators stop being expressible
    efficiently — so the kernel runs as vectorized Python over Arrow
    batches (~us/row), preserving narrowness: no shuffle, partitioning
    carried through. ``spread`` repartitions first because parquet
    scans arrive in file-sized partitions that would serialize the
    stage onto a few cores.
    """
    if spread:
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartition(n_part)
    in_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_ddl = ", ".join(
        [f"{c} {in_fields[c]}" for c in id_cols] + ["chunk_idx int", "chunk string"]
    )

    def process(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for tup in pdf[[*id_cols, text_col]].itertuples(index=False):
                *ids, text = tup
                for idx, chunk in enumerate(topic_chunks_py(text or "", w, k)):
                    rows.append((*ids, idx, chunk))
            yield pd.DataFrame(rows, columns=[*id_cols, "chunk_idx", "chunk"])

    return df.mapInPandas(process, schema=out_ddl)


def topic_chunks_py(text: str, w: int = 20, k: int = 2) -> list[str]:
    """Pure-Python mirror of :func:`topic_chunks` for loop-parity tests."""
    toks = text.split()
    n = len(toks)
    m = -(-n // w)
    sims: list[int] = []
    for i in range(max(m - 1, 0)):
        ls = max(i - (k - 1), 0)
        left = toks[ls * w : (i + 1) * w]
        right = toks[(i + 1) * w : (i + 1 + k) * w]
        sims.append(len(set(left) & set(right)))
    g = len(sims)
    depths = [
        max((sims[j - 1] - sims[j]) if j > 0 else 0, 0)
        + max((sims[j + 1] - sims[j]) if j < g - 1 else 0, 0)
        for j in range(g)
    ]
    total = sum(depths)
    bounds = [j for j in range(g) if depths[j] * g > total]
    starts = [0] + [(b + 1) * w for b in bounds]
    ends = [(b + 1) * w for b in bounds] + [n]
    out = [" ".join(toks[s:e]) for s, e in zip(starts, ends)]
    return [c for c in out if c]


def chunk_table(df, text_col: str, chunks: Column, id_cols: list[str]):
    """Explode a chunk array into (ids..., chunk_idx, chunk) rows."""
    return df.select(
        *id_cols, F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
