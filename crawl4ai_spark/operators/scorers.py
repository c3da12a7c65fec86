"""URL scorers as native Spark Column expressions.

Reference: /root/reference/crawl4ai/deep_crawling/scorers.py —
KeywordRelevanceScorer (:272-300), PathDepthScorer (:302-365),
ContentTypeScorer (:367-452), FreshnessScorer (:454-538),
DomainAuthorityScorer (:540-518/end), CompositeScorer (:93-160),
lookup tables _SCORE_LOOKUP / _FRESHNESS_SCORES (:14-24).

Every scorer is a DoubleType Column; the reference's per-URL lru_cache
memoization is unnecessary under vectorized evaluation (dedup before
scoring is the Spark analogue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.urls import path_depth

# reference scorers.py:14 — scores for |depth - optimal| of 0..3
SCORE_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]

# reference scorers.py:17-24 — scores for (current_year - url_year) of 0..5
FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]

# reference scorers.py:497-517 — combined date pattern (year group 1)
_DATE_RX = r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"


def _url(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def keyword_relevance_score(
    url: Column | str,
    keywords: list[str],
    *,
    weight: float = 1.0,
    case_sensitive: bool = False,
) -> Column:
    """matches/len(keywords) — reference scorers.py:286-300."""
    c = _url(url)
    if not case_sensitive:
        c = F.lower(c)
        keywords = [k.lower() for k in keywords]
    matches = None
    for k in keywords:
        m = c.contains(k).cast("int")
        matches = m if matches is None else matches + m
    if matches is None:
        return F.lit(0.0)
    return (matches.cast("double") / F.lit(float(len(keywords)))) * F.lit(weight)


def path_depth_score(
    url: Column | str, *, optimal_depth: int = 3, weight: float = 1.0
) -> Column:
    """Lookup-table distance score — reference scorers.py:342-365."""
    depth = path_depth(url)
    distance = F.abs(depth - F.lit(optimal_depth))
    score = (
        F.when(distance == 0, SCORE_LOOKUP[0])
        .when(distance == 1, SCORE_LOOKUP[1])
        .when(distance == 2, SCORE_LOOKUP[2])
        .when(distance == 3, SCORE_LOOKUP[3])
        .otherwise(F.lit(1.0) / (F.lit(1.0) + distance.cast("double")))
    )
    return score * F.lit(weight)


def _quick_extension(url: Column | str) -> Column:
    """reference scorers.py:394-422 — chars after the LAST dot up to the
    first non-alphanumeric / '?#;' char, lowercased; '' if no dot."""
    c = _url(url)
    after_last_dot = F.substring_index(c, ".", -1)
    ext = F.lower(F.regexp_extract(after_last_dot, "^([A-Za-z0-9]+)", 1))
    return F.when(c.contains("."), ext).otherwise(F.lit(""))


def content_type_score(
    url: Column | str, type_weights: dict[str, float], *, weight: float = 1.0
) -> Column:
    """Extension/pattern score map — reference scorers.py:367-452.

    '.ext$' keys are exact-extension fast paths; other keys are regex
    patterns tried in descending score order.
    """
    exact: dict[str, float] = {}
    regexes: list[tuple[str, float]] = []
    for pattern, s in type_weights.items():
        if pattern.startswith(".") and pattern.endswith("$"):
            exact[pattern[1:-1]] = s
        else:
            regexes.append((pattern, s))
    regexes.sort(key=lambda x: -x[1])

    ext = _quick_extension(url)
    score: Column = F.lit(None).cast("double")
    for e, s in exact.items():
        score = F.when(ext == e, F.lit(s)).otherwise(score)
    # regex fallback only when no exact match fired
    fallback: Column = F.lit(0.0)
    for pattern, s in reversed(regexes):
        fallback = F.when(_url(url).rlike(pattern), F.lit(s)).otherwise(fallback)
    return F.coalesce(score, fallback) * F.lit(weight)


def freshness_score(
    url: Column | str, *, current_year: int = 2024, weight: float = 1.0
) -> Column:
    """Most-recent-year freshness — reference scorers.py:454-538."""
    years = F.regexp_extract_all(_url(url), F.lit(_DATE_RX), F.lit(1))
    years = F.transform(years, lambda y: y.cast("int"))
    years = F.filter(years, lambda y: y <= F.lit(current_year))
    latest = F.array_max(years)
    diff = F.lit(current_year) - latest
    score = (
        F.when(latest.isNull(), 0.5)
        .when(diff == 0, FRESHNESS_SCORES[0])
        .when(diff == 1, FRESHNESS_SCORES[1])
        .when(diff == 2, FRESHNESS_SCORES[2])
        .when(diff == 3, FRESHNESS_SCORES[3])
        .when(diff == 4, FRESHNESS_SCORES[4])
        .when(diff == 5, FRESHNESS_SCORES[5])
        .otherwise(F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * 0.1))
    )
    return score * F.lit(weight)


def _scorer_domain(url: Column | str) -> Column:
    """reference scorers.py DomainAuthorityScorer._extract_domain — text
    between optional '://' and the first '/?#', port stripped, lowered."""
    c = _url(url)
    dom = F.regexp_extract(c, r"^(?:[^:/?#]+://)?([^/?#]+)", 1)
    dom = F.regexp_replace(dom, ":\\d+$", "")
    return F.lower(dom)


def domain_authority_score(
    url: Column | str,
    domain_weights: dict[str, float],
    *,
    default_weight: float = 0.5,
    weight: float = 1.0,
) -> Column:
    """Authority lookup with default — reference DomainAuthorityScorer."""
    dom = _scorer_domain(url)
    score: Column = F.lit(float(default_weight))
    for d, s in domain_weights.items():
        score = F.when(dom == d.lower(), F.lit(float(s))).otherwise(score)
    return score * F.lit(weight)


def composite_score(scores: list[Column], *, normalize: bool = True) -> Column:
    """Sum (optionally mean) of weighted scorer columns — reference
    CompositeScorer (:93-160). Individual weights are already applied by
    each scorer's ``weight=`` argument."""
    if not scores:
        return F.lit(0.0)
    total = scores[0]
    for s in scores[1:]:
        total = total + s
    if normalize:
        return total / F.lit(float(len(scores)))
    return total
