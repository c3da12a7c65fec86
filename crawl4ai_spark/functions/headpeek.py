"""Head-section analytics in pure Spark SQL (SURVEY.md F5/F6/F8).

Reference semantics:
- HeadPeekr (utils.py:2806-2861): take everything before ``</head>``;
  title via ``<title>(.*?)</title>`` (IGNORECASE|DOTALL); meta tags via
  ``<meta[^>]+>`` + name/property/content attribute regexes (last
  occurrence of a key wins — dict assignment).
- ContentRelevanceFilter (deep_crawling/filters.py:501-573): BM25 with
  simplified IDF ``ln(2/(tf+0.5)+1)`` over a weighted head document
  ``title*3 + description*2 + keywords + all-meta-values``, k1=1.2,
  b=0.75, avgdl=1000.
- SEOFilter (filters.py:576-686): weighted head-quality score with the
  published default weights; threshold 0.65.

Everything here is a Column expression — the head never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEO_DEFAULT_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def head_section(html: Column | str) -> Column:
    """Everything before (and including) ``</head>``."""
    c = _c(html)
    return F.concat(F.substring_index(c, "</head>", 1), F.lit("</head>"))


def head_title(head: Column | str) -> Column:
    return F.regexp_extract(_c(head), r"(?is)<title>(.*?)</title>", 1)


def meta_value(head: Column | str, key: str) -> Column:
    """Content of the LAST <meta name=key|property=key> tag ('' if none)
    — reference dict semantics keep the last occurrence."""
    tags = F.regexp_extract_all(_c(head), F.lit(r"<meta[^>]+>"), F.lit(0))
    matching = F.filter(
        tags,
        lambda t: (
            (F.regexp_extract(t, r'name=["\'](.*?)["\']', 1) == key)
            | (F.regexp_extract(t, r'property=["\'](.*?)["\']', 1) == key)
        )
        # the reference dict only stores tags WITH a content attribute
        # (extract_meta_tags skips on no content_match) — a later
        # content-less tag must not shadow an earlier real value
        & F.regexp_like(t, F.lit("content=[\"']")),
    )
    last = F.try_element_at(matching, F.lit(-1))
    return F.coalesce(
        F.regexp_extract(last, r'content=["\'](.*?)["\']', 1), F.lit("")
    )


def meta_entries(head: Column | str) -> Column:
    """All meta tags as array<struct<key,content>> (document order)."""
    tags = F.regexp_extract_all(_c(head), F.lit(r"<meta[^>]+>"), F.lit(0))
    entries = F.transform(
        tags,
        lambda t: F.struct(
            F.when(
                F.regexp_extract(t, r'name=["\'](.*?)["\']', 1) != "",
                F.regexp_extract(t, r'name=["\'](.*?)["\']', 1),
            )
            .otherwise(F.regexp_extract(t, r'property=["\'](.*?)["\']', 1))
            .alias("key"),
            F.regexp_extract(t, r'content=["\'](.*?)["\']', 1).alias("content"),
        ),
    )
    return F.filter(
        entries, lambda e: (e["key"] != "") & (e["content"] != "")
    )


def _tokens_ws(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "\\s+"), lambda w: w != "")


def relevance_document(head: Column | str) -> Column:
    """Weighted BM25 document (reference _build_document :538-547):
    title repeated 3x, description 2x, keywords 1x, then every meta
    content value space-joined."""
    title = head_title(head)
    desc = meta_value(head, "description")
    kw = meta_value(head, "keywords")
    # reference joins meta DICT values — one per key, last wins — so
    # duplicate keys (name=/property= pairs, repeated og: tags) must
    # not double their terms' BM25 tf: keep each key's LAST entry
    # (value order differs from dict insertion order, which is fine —
    # BM25 only counts frequencies)
    entries = meta_entries(head)
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda e2: e2["key"] == e["key"],
        ),
    )
    all_vals = F.array_join(
        F.transform(deduped, lambda e: e["content"]), " "
    )
    return F.concat_ws(
        " ", F.repeat(title, 3), F.repeat(desc, 2), kw, all_vals
    )


def content_relevance_score(
    head: Column | str,
    query: str,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: int = 1000,
) -> Column:
    """Per-row BM25 score of the head document vs the query
    (reference _bm25 :554-573 — simplified IDF ln(2/(tf+0.5)+1))."""
    doc = relevance_document(head)
    toks = _tokens_ws(doc)
    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for term in sorted(set(query.lower().split())):
        tf = F.size(F.filter(toks, lambda t: t == term)).cast("double")
        idf = F.log(F.lit(2.0) / (tf + 0.5) + 1.0)
        num = tf * (k1 + 1.0)
        den = tf + k1 * (1.0 - b + b * (dl / avgdl))
        score = score + idf * (num / den)
    return score


def seo_score(
    head: Column | str,
    url: Column | str,
    keywords: list[str] | None = None,
    weights: dict | None = None,
) -> Column:
    """Full SEOFilter score (reference :576-686) as one expression."""
    w = weights or SEO_DEFAULT_WEIGHTS
    title = head_title(head)
    desc = meta_value(head, "description")
    robots = meta_value(head, "robots")
    canonical = meta_value(head, "canonical")
    u = _c(url)
    tl = F.length(title)
    s_title_len = (
        F.when((tl >= 50) & (tl <= 60), 1.0)
        .when(((tl >= 40) & (tl < 50)) | ((tl > 60) & (tl <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        import re as _re

        pat = r"(?i)\b(" + "|".join(_re.escape(k) for k in keywords) + r")\b"
        matches = F.size(F.regexp_extract_all(title, F.lit(pat), F.lit(0)))
        s_title_kw = F.least(matches.cast("double") * 0.3, F.lit(1.0))
    else:
        s_title_kw = F.lit(0.0)
    dl_ = F.length(desc)
    s_desc = (
        F.when((dl_ >= 140) & (dl_ <= 160), 1.0)
        .when((dl_ >= 120) & (dl_ <= 200), 0.5)
        .otherwise(0.2)
    )
    s_canon = (
        F.when(canonical == "", 0.5).when(canonical == u, 1.0).otherwise(0.2)
    )
    s_robot = F.when(robots.contains("noindex"), 0.0).otherwise(1.0)
    s_schema = F.when(
        _c(head).rlike(r'<script[^>]+type=["\']application/ld\+json'), 1.0
    ).otherwise(0.0)
    path = F.lower(F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")))
    query_part = F.try_parse_url(u, F.lit("QUERY"))
    s_url = F.lit(1.0)
    s_url = s_url * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
    s_url = s_url * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
    s_url = s_url * F.when(
        query_part.isNotNull() & (query_part != ""), 0.6
    ).otherwise(1.0)
    s_url = s_url * F.when(path.contains("_"), 0.9).otherwise(1.0)

    return (
        F.lit(w["title_length"]) * s_title_len
        + F.lit(w["title_kw"]) * s_title_kw
        + F.lit(w["meta_description"]) * s_desc
        + F.lit(w["canonical"]) * s_canon
        + F.lit(w["robot_ok"]) * s_robot
        + F.lit(w["schema_org"]) * s_schema
        + F.lit(w["url_quality"]) * s_url
    )
