"""Link quality scoring as native Spark expressions (SURVEY.md §2.8).

Reference: utils.py:3078-3120 (extract_page_context), :3123-3235
(calculate_link_intrinsic_score — attribute/url/text/contextual/domain
rules, clamped 0..10), :3238-3283 (calculate_total_score — 70/30
intrinsic/contextual combine, neutral 5.0).

Everything is pure Column arithmetic over the exploded links table —
whole-stage codegen, no Python. The page context (term set, docs-site
flag) is computed once per page and carried as array/boolean columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PUNCT_STRIP = '^[.,!?;:"()\\[\\]{}]+|[.,!?;:"()\\[\\]{}]+$'

NAV_CLASSES = ["nav", "menu", "primary", "main", "important"]
BAD_CLASSES = ["ad", "sponsor", "track", "promo", "banner"]
GOOD_RELS = ["canonical", "next", "prev", "chapter"]
BAD_RELS = ["nofollow", "sponsored", "ugc"]
GOOD_PATHS = ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]
MEDIUM_PATHS = ["/blog/", "/article/", "/post/", "/news/"]
BAD_PATHS = ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]
GENERIC_TEXTS = ["click here", "read more", "more info", "link", "here"]
DOCS_DOMAIN_MARKS = ["docs.", "api.", "developer.", "reference."]
DOC_KEYWORDS = ["api", "reference", "guide", "tutorial", "example"]


def _terms(text: Column) -> Column:
    """Words > 2 chars after punctuation strip — the reference's fast
    tokenization (utils.py:3112-3116)."""
    words = F.split(F.lower(F.coalesce(text, F.lit(""))), " ")
    stripped = F.transform(words, lambda w: F.regexp_replace(w, _PUNCT_STRIP, ""))
    return F.array_distinct(F.filter(stripped, lambda w: F.length(w) > 2))


def page_terms(title: Column | str, headlines: Column | str,
               meta_description: Column | str) -> Column:
    t = F.col(title) if isinstance(title, str) else title
    h = F.col(headlines) if isinstance(headlines, str) else headlines
    m = F.col(meta_description) if isinstance(meta_description, str) else meta_description
    return _terms(
        F.concat_ws(
            " ", F.coalesce(t, F.lit("")), F.coalesce(h, F.lit("")),
            F.coalesce(m, F.lit("")),
        )
    )


def is_docs_site(base_url: Column | str) -> Column:
    c = F.col(base_url) if isinstance(base_url, str) else base_url
    dom = F.lower(F.coalesce(F.try_parse_url(c, F.lit("HOST")), F.lit("")))
    out = F.lit(False)
    for mark in DOCS_DOMAIN_MARKS:
        out = out | dom.contains(mark)
    return out


def _any_contains(col: Column, needles: list[str]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def link_intrinsic_score(
    link_text: Column,
    url: Column,
    title_attr: Column,
    class_attr: Column,
    rel_attr: Column,
    terms: Column,
    docs_site: Column,
) -> Column:
    """calculate_link_intrinsic_score as one expression (0..10)."""
    score = F.lit(0.0)

    # 1. attribute quality
    score = score + F.when(
        F.length(F.trim(F.coalesce(title_attr, F.lit("")))) > 3, 1.0
    ).otherwise(0.0)
    cls = F.lower(F.coalesce(class_attr, F.lit("")))
    score = score + F.when(_any_contains(cls, NAV_CLASSES), 1.5).otherwise(0.0)
    score = score - F.when(_any_contains(cls, BAD_CLASSES), 1.0).otherwise(0.0)
    rel = F.lower(F.coalesce(rel_attr, F.lit("")))
    score = score + F.when(_any_contains(rel, GOOD_RELS), 1.0).otherwise(0.0)
    score = score - F.when(_any_contains(rel, BAD_RELS), 0.5).otherwise(0.0)

    # 2. url structure
    low = F.lower(url)
    score = score + (
        F.when(_any_contains(low, GOOD_PATHS), 2.0)
        .when(_any_contains(low, MEDIUM_PATHS), 1.0)
        .otherwise(0.0)
    )
    score = score - F.when(_any_contains(low, BAD_PATHS), 1.5).otherwise(0.0)
    depth = F.size(F.split(url, "/")) - 1 - 2  # url.count('/') - 2
    score = score + F.when(depth <= 2, 1.0).when(depth > 5, -0.5).otherwise(0.0)
    score = score + F.when(url.startswith("https://"), 0.5).otherwise(0.0)

    # 3. text quality
    text_clean = F.trim(F.coalesce(link_text, F.lit("")))
    has_text = F.coalesce(link_text, F.lit("")) != ""
    score = score + F.when(has_text & (F.length(text_clean) > 3), 1.0).otherwise(0.0)
    wc = F.size(F.filter(F.split(text_clean, "\\s+"), lambda w: w != ""))
    score = score + F.when(has_text & (wc >= 2), 0.5).otherwise(0.0)
    score = score + F.when(has_text & (wc >= 4), 0.5).otherwise(0.0)
    score = score - F.when(
        has_text & F.lower(text_clean).isin(GENERIC_TEXTS), 1.0
    ).otherwise(0.0)

    # 4. contextual relevance vs page terms
    link_words = _terms(link_text)
    overlap = F.size(F.array_intersect(link_words, F.coalesce(terms, F.array())))
    denom = F.least(F.size(link_words), F.lit(10)).cast("double")
    rel_bonus = F.when(
        (F.size(F.coalesce(terms, F.array())) > 0)
        & has_text
        & (F.size(link_words) > 0)
        & (overlap > 0),
        overlap.cast("double") / denom * 2.0,
    ).otherwise(0.0)
    score = score + rel_bonus

    # 5. docs-site bonus
    lowtext = F.lower(text_clean)
    score = score + F.when(
        F.coalesce(docs_site, F.lit(False))
        & has_text
        & _any_contains(lowtext, DOC_KEYWORDS),
        1.0,
    ).otherwise(0.0)

    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def total_link_score(
    intrinsic: Column | None,
    contextual: Column | None,
    *,
    score_links_enabled: bool = True,
    query_provided: bool = False,
) -> Column:
    """calculate_total_score (utils.py:3238-3283)."""
    if not score_links_enabled:
        return F.lit(5.0)
    i = F.coalesce(intrinsic, F.lit(0.0))
    if not query_provided or contextual is None:
        return F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    c_scaled = F.least(F.coalesce(contextual, F.lit(0.0)) * 10.0, F.lit(10.0))
    total = i * 0.7 + c_scaled * 0.3
    return F.greatest(F.lit(0.0), F.least(total, F.lit(10.0)))


def score_page_links(results: DataFrame) -> DataFrame:
    """Explode a crawl-results table's links and score each one against
    its page context: (page_url, href, text, is_internal,
    intrinsic_score, total_score)."""
    ctx = results.select(
        F.col("url").alias("page_url"),
        page_terms(
            F.col("title"),
            F.coalesce(F.col("headings"), F.lit("")),
            F.coalesce(F.col("meta").getItem("description"), F.lit("")),
        ).alias("_terms"),
        is_docs_site(F.col("url")).alias("_docs"),
        F.explode("links").alias("lk"),
    )
    intrinsic = link_intrinsic_score(
        F.col("lk.text"), F.col("lk.href"), F.col("lk.title"),
        F.lit(None).cast("string"), F.lit(None).cast("string"),
        F.col("_terms"), F.col("_docs"),
    )
    return ctx.select(
        "page_url",
        F.col("lk.href").alias("href"),
        F.col("lk.text").alias("text"),
        F.col("lk.is_internal").alias("is_internal"),
        F.round(intrinsic, 6).alias("intrinsic_score"),
        F.round(
            total_link_score(intrinsic, None, score_links_enabled=True), 6
        ).alias("total_score"),
    )
