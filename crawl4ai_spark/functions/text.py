"""Text-analysis column functions for the documents/pages tables.

All native Column expressions (whole-stage codegen) — language ID,
quality scoring, token counting, fingerprinting. These extend the
reference's text handling (clean_tokens at utils.py:2405+, word-count
thresholds at content_scraping_strategy.py:824-833) with the standard
large-scale training-data-pipeline signals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, deterministic stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "this", "had", "not"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "als", "auch", "auf", "für", "sich", "dem", "des"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "qui",
           "pour", "pas", "sur", "avec", "par", "mais", "nous", "vous"],
    "es": ["el", "la", "los", "las", "que", "una", "por", "con", "para",
           "del", "se", "su", "es", "como", "más", "pero", "sus"],
}

WORD_SPLIT_RX = "[^\\p{L}\\p{N}']+"


def tokens(text: Column | str) -> Column:
    """Lowercased word tokens (empty strings removed)."""
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(F.lower(c), WORD_SPLIT_RX)
    return F.filter(arr, lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace-ish token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate BPE token count: words + digits + punctuation runs.

    A regex proxy for subword tokenizers (roughly 1 token per word piece
    of <=6 chars): ceil(len(word)/6) summed, plus punctuation marks.
    """
    c = F.col(text) if isinstance(text, str) else text
    word_pieces = F.aggregate(
        tokens(c),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(6.0)).cast("long"),
    )
    punct = F.size(F.filter(F.split(c, ""), lambda ch: ch.rlike("[\\p{Punct}]")))
    return word_pieces + punct.cast("long")


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang` (with multiplicity)."""
    t = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(t, lambda tok: F.array_contains(sw, tok)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit rate.

    Returns 'und' when no stopwords of any candidate language appear.
    """
    c = F.col(text) if isinstance(text, str) else text
    hits = {lg: stopword_hits(c, lg) for lg in STOPWORDS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so that ties resolve to the first language in STOPWORDS order
    for lg in reversed(list(STOPWORDS)):
        out = F.when((hits[lg] > 0) & (hits[lg] == best), lg).otherwise(out)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)


def quality_score(text: Column | str) -> Column:
    """Boilerplate/quality heuristic in [0,1] (Gopher-rule flavored).

    Components (equal weights):
      - length score: 1 at >=50 words, linear below
      - mean word length in [3,10] chars
      - alpha ratio: fraction of word-chars among non-space chars
      - stopword ratio >= 0.05 (any supported language)
      - not mostly uppercase
    """
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n = F.size(t).cast("double")

    length_score = F.least(n / F.lit(50.0), F.lit(1.0))

    total_chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_wl = F.when(n > 0, total_chars / n).otherwise(F.lit(0.0))
    wl_score = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.3)

    nonspace = F.length(F.regexp_replace(c, "\\s+", "")).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^\\p{L}\\p{N}]+", "")).cast("double")
    alpha_ratio = F.when(nonspace > 0, alpha / nonspace).otherwise(F.lit(0.0))
    alpha_score = F.least(alpha_ratio / F.lit(0.8), F.lit(1.0))

    sw_hits = None
    for lg in STOPWORDS:
        h = stopword_hits(c, lg)
        sw_hits = h if sw_hits is None else sw_hits + h
    sw_ratio = F.when(n > 0, sw_hits.cast("double") / n).otherwise(F.lit(0.0))
    sw_score = F.when(sw_ratio >= 0.05, 1.0).otherwise(sw_ratio / F.lit(0.05))

    upper = F.length(F.regexp_replace(c, "[^A-Z]", "")).cast("double")
    letters = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    upper_ratio = F.when(letters > 0, upper / letters).otherwise(F.lit(0.0))
    case_score = F.when(upper_ratio < 0.3, 1.0).otherwise(0.2)

    score = (length_score + wl_score + alpha_score + sw_score + case_score) / F.lit(5.0)
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(score)


def content_hash(text: Column | str) -> Column:
    """sha256 content hash — reference utils.py:2681-2685."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(c, 256)


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles (n-grams over tokens), space-joined."""
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))).otherwise(
        F.array(F.array_join(t, " "))
    )


def doc_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Order-insensitive 64-bit document fingerprint: xor-free stable
    combination (min of shingle hashes) — cheap near-dup prefilter."""
    sh = shingles(text, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    return F.array_min(hashes)


def doc_fingerprint_portable(text: Column | str, k: int = 3) -> Column:
    """Same min-over-shingle-hashes fingerprint built on md5 instead of
    xxhash64 — md5 is implemented identically in Spark and DuckDB, so
    this variant is exactly mirrorable by the SQL oracle (the xxhash64
    one above is the production fast path; both run the identical
    shingle -> hash -> array_min pipeline)."""
    sh = shingles(text, k)
    return F.array_min(F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16)))


def winnow_fingerprints(text: Column | str, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every k-token shingle, slide a window of ``w``
    consecutive hashes, keep each window's MINIMUM, then dedup.

    The winnowing guarantee: any run of ``w + k - 1`` tokens shared by
    two documents contributes at least one identical fingerprint to
    both — the local-similarity detector behind MOSS-style overlap
    search, here as a near-dup prefilter finer than the single
    ``doc_fingerprint`` min (which only catches whole-document
    near-identity) and far cheaper than full MinHash.

    Row-local Column expression — zero shuffle at any scale; md5-prefix
    hashes so the SQL oracle replays it exactly (selection keeps the
    minimum VALUE, so rightmost-vs-leftmost tie policy cannot change
    the returned set). Output: array<string> in first-seen order;
    sort before cross-engine comparison.

    Shape note: the sliding minimum is w-1 chained zip_withs over
    shifted slices of the hash array — NOT array_min(slice(hs, j, w))
    inside a transform lambda, which embeds the whole md5 pipeline in
    the lambda body and re-evaluates it per window (Catalyst does no
    loop-invariant hoisting inside higher-order functions; the naive
    form is O(windows x shingles) md5 calls and took minutes per task
    at sf0.1)."""
    sh = shingles(text, k)
    hs = F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16))
    m = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(1))
    wins = F.slice(hs, 1, m)
    for j in range(1, w):
        # zip_with pads the shorter (tail-clipped) side with null;
        # keeping `a` there is correct — a missing hash can't lower a
        # window minimum
        wins = F.zip_with(
            wins,
            F.slice(hs, j + 1, m),
            lambda a, b: F.when(b < a, b).otherwise(a),
        )
    return F.array_distinct(wins)


def shingle_hashes_md5(text: Column | str, k: int = 3) -> Column:
    """Engine-portable 60-bit shingle hashes: md5-prefix integers over
    the shingle strings — computed identically by Spark and DuckDB, so
    the minhash/simhash oracles can replay the exact pipeline (the
    xxhash64 path below is the production fast path)."""
    sh = shingles(text, k)
    return F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )


def shingle_hashes(text: Column | str, k: int = 3) -> Column:
    """64-bit k-shingle hashes WITHOUT materializing shingle strings.

    Per-token xxhash64 once, then a polynomial combination of k shifted
    slices via zip_with — three whole-array ops instead of a per-element
    slice+join (the string-shingle path was the hot spot of every dedup
    operator: ~8s for 500k shingles at sf0.1, ~3x faster this way).
    Short texts (< k tokens) hash the whole token list as one shingle.
    """
    t = tokens(text)
    h = F.transform(t, lambda w: F.xxhash64(w))
    if k == 1:
        return h
    n = F.size(h)
    m = F.greatest(n - F.lit(k - 1), F.lit(0))
    out = F.slice(h, 1, m)
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(h, F.lit(j + 1), m),
            lambda a, b: F.xxhash64(a, b),  # pair-hash mix (ANSI-safe)
        )
    return F.when(n >= k, out).otherwise(
        F.array(F.xxhash64(F.array_join(t, " ")))
    )


def blocklist_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """C4-style content-blocklist hit count: how many of the document's
    tokens appear in ``words`` (C4 drops any page with >= 1 hit against
    its "bad words" list; Raffel et al. 2020 §2.2). Kept as a COUNT so
    callers can audit before dropping; row-local, zero shuffle."""
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(text), lambda w: F.array_contains(lit, w))
    ).cast("long")


def gopher_quality_flags(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_e2: int = 300,
    max_mean_word_len_e2: int = 1000,
    min_alpha_word_frac_e6: int = 800_000,
) -> Column:
    """Gopher §A1 document-quality rules (Rae et al. 2021) as a struct
    of integer signals + the keep conjunction: word-count bounds, mean
    word length in [3, 10] characters, and >= 80 % of words containing
    an alphabetic character. Integer units (e2 / e6) keep the signals
    engine-exact; the floor-of-double divisions are exact here because
    a non-integer rational a/n sits >= 1/n from any integer while the
    double error is ~q*2^-53 — orders below 1/n for any real document.
    """
    ws = tokens(text)
    n = F.size(ws).cast("long")
    total_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mwl_e2 = F.when(
        n > 0, F.floor(F.lit(100) * total_chars / n).cast("long")
    ).otherwise(F.lit(0))
    alpha = F.size(F.filter(ws, lambda w: w.rlike("(?i)[a-z]"))).cast("long")
    frac_e6 = F.when(
        n > 0, F.floor(F.lit(1_000_000) * alpha / n).cast("long")
    ).otherwise(F.lit(0))
    keep = (
        n.between(int(min_words), int(max_words))
        & mwl_e2.between(int(min_mean_word_len_e2), int(max_mean_word_len_e2))
        & (frac_e6 >= int(min_alpha_word_frac_e6))
    ).cast("int")
    return F.struct(
        mwl_e2.alias("mean_word_len_e2"),
        frac_e6.alias("alpha_word_frac_e6"),
        keep.alias("gopher_keep"),
    )
