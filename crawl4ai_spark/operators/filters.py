"""URL filters as native Spark Column expressions.

Reference: /root/reference/crawl4ai/deep_crawling/filters.py —
FilterChain (:69-116), URLPatternFilter (:119-255), ContentTypeFilter
(:258-421), DomainFilter (:424-498), SEOFilter url-quality subscore
(:655-668).

Design: each reference filter class compiles (on the driver) to ONE
boolean Column. A FilterChain is a conjunction — Catalyst short-circuits
and reorders the cheap predicates ahead of the regex ones, which is the
reference's hand-rolled "sync filters first" optimization (:91-116) for
free. Per-filter pass/reject stats are a single aggregate pass.

No Python executes per row anywhere in this module.
"""

from __future__ import annotations

import fnmatch
import re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import extension

# ---------------------------------------------------------------------------
# URLPatternFilter — reference filters.py:119-255
# ---------------------------------------------------------------------------

def _is_regex_pattern(pattern: str) -> bool:
    return pattern.startswith("^") or pattern.endswith("$") or "\\d" in pattern


def _translate_glob(pattern: str) -> str:
    """reference filters.py:196-207 — '**' -> '.*', '{a,b}' -> '(a|b)',
    then fnmatch.translate."""
    if "**" in pattern:
        pattern = pattern.replace("**", ".*")
    if "{" in pattern:
        pattern = re.sub(
            r"\{([^}]+)\}",
            lambda m: f'({"|".join(m.group(1).split(","))})',
            pattern,
        )
    return fnmatch.translate(pattern)


def url_pattern_filter(
    url: Column | str, patterns, *, reverse: bool = False
) -> Column:
    """Compile URLPatternFilter(patterns) to one boolean Column.

    Pattern categories (reference filters.py:154-176):
      *.html        -> SUFFIX  (extension of last path segment)
      /foo/*        -> PREFIX  (with path-boundary check, :236-244)
      *.example.com w/ '://' -> DOMAIN (anchored regex match)
      ^...$ or \\d  -> REGEX   (search semantics)
      anything else -> PATH    (glob -> regex, search semantics)
    """
    c = F.col(url) if isinstance(url, str) else url
    if isinstance(patterns, str):
        patterns = [patterns]

    suffixes: list[str] = []
    prefixes: list[str] = []
    domain_regexes: list[str] = []
    path_regexes: list[str] = []

    for p in patterns:
        if _is_regex_pattern(p):
            path_regexes.append(p)
        elif p.count("*") == 1 and p.startswith("*."):
            # reference order (:163-173): a single-star '*.' pattern is
            # SUFFIX even when '://' is present — its DOMAIN check runs
            # AFTER the count==1 branches, so only multi-star patterns
            # like 'https://*.example.com/*' reach it
            suffixes.append(p[2:])
        elif p.count("*") == 1 and p.endswith("/*"):
            prefixes.append(p[:-2])
        elif "://" in p and p.startswith("*."):
            # anchored-match parity with the reference's re.match();
            # remaining glob chars stay raw regex, bug-for-bug (:191)
            domain_regexes.append("^" + p.replace("*.", r"[^/]+\."))
        else:
            path_regexes.append(_translate_glob(p))

    disjuncts: list[Column] = []

    if suffixes:
        pre_query = F.split(c, "\\?").getItem(0)
        last_seg = F.element_at(F.split(pre_query, "/"), -1)
        ext = F.element_at(F.split(last_seg, "\\."), -1)
        disjuncts.append(ext.isin(suffixes))

    for rx in domain_regexes:
        disjuncts.append(c.rlike(rx))

    if prefixes:
        pre_query = F.split(c, "\\?").getItem(0)
        for pref in prefixes:
            n = len(pref)
            after = F.substring(pre_query, n + 1, 1)
            disjuncts.append(
                pre_query.startswith(pref)
                & ((F.length(pre_query) == n) | after.isin(["/", "?", "#"]))
            )

    for rx in path_regexes:
        disjuncts.append(c.rlike(rx))

    if not disjuncts:
        result = F.lit(False)
    else:
        result = reduce(lambda a, b: a | b, disjuncts)
    return ~result if reverse else result


# ---------------------------------------------------------------------------
# ContentTypeFilter — reference filters.py:258-421 (MIME table :264-360)
# ---------------------------------------------------------------------------

# Standard extension -> MIME type table, same contents as the reference's
# _MIME_MAP (filters.py:264-360) — factual data, redeclared.
MIME_MAP = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf",
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel", "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tar.gz": "application/gzip", "tgz": "application/gzip",
    "bz2": "application/x-bzip2",
    "rtf": "application/rtf", "apk": "application/vnd.android.package-archive",
    "epub": "application/epub+zip", "jar": "application/java-archive",
    "swf": "application/x-shockwave-flash", "midi": "audio/midi",
    "mid": "audio/midi", "ps": "application/postscript",
    "ai": "application/postscript", "eps": "application/postscript",
    "bin": "application/octet-stream", "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image", "deb": "application/x-debian-package",
    "rpm": "application/x-rpm", "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
    "php": "application/x-httpd-php", "php3": "application/x-httpd-php",
    "php4": "application/x-httpd-php", "php5": "application/x-httpd-php",
    "php7": "application/x-httpd-php", "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


def content_type_filter(
    url: Column | str, allowed_types, *, check_extension: bool = True
) -> Column:
    """True when the URL's extension maps to an allowed MIME family.

    Extension-less URLs pass (reference filters.py:413-417). The allowed
    extension set is computed on the driver (substring match against the
    MIME value, :399-404) so the row-side test is a plain isin.
    """
    if not check_extension:
        return F.lit(True)
    if isinstance(allowed_types, str):
        allowed_types = [allowed_types]
    allowed = {t.lower() for t in allowed_types}
    allowed_exts = [
        ext for ext, mime in MIME_MAP.items() if any(a in mime for a in allowed)
    ]
    ext = extension(url)
    return (ext == "") | ext.isin(allowed_exts)


# ---------------------------------------------------------------------------
# DomainFilter — reference filters.py:424-498
# ---------------------------------------------------------------------------


def _filter_domain(url: Column | str) -> Column:
    """reference filters.py:431 _DOMAIN_REGEX — '://([^/]+)', lowered.
    Keeps the port, exactly like the reference."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, "://([^/]+)", 1))


def domain_filter(
    url: Column | str, allowed_domains=None, blocked_domains=None
) -> Column:
    """Subdomain-aware allow/block — reference filters.py:459-461,471-497.

    blocked checked first; allowed=None accepts all non-blocked.
    """
    if isinstance(allowed_domains, str):
        allowed_domains = [allowed_domains]
    if isinstance(blocked_domains, str):
        blocked_domains = [blocked_domains]
    if not blocked_domains and allowed_domains is None:
        return F.lit(True)

    dom = _filter_domain(url)

    def is_sub(parent: str) -> Column:
        p = parent.lower()
        return (dom == p) | dom.endswith("." + p)

    blocked = F.lit(False)
    for b in blocked_domains or []:
        blocked = blocked | is_sub(b)

    if allowed_domains is None:
        return ~blocked

    allowed = F.lit(False)
    for a in allowed_domains:
        allowed = allowed | is_sub(a)
    return ~blocked & allowed


# ---------------------------------------------------------------------------
# SEO url-quality subscore — reference filters.py:655-668 (the URL-only
# part of SEOFilter; the head-content parts live in the scrape stage)
# ---------------------------------------------------------------------------


def seo_url_quality_score(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    path = F.lower(F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("")))
    query = F.try_parse_url(c, F.lit("QUERY"))
    score = F.lit(1.0)
    score = score * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
    score = score * F.when(path.rlike("\\d{4}"), 0.8).otherwise(1.0)
    score = score * F.when(query.isNotNull() & (query != ""), 0.6).otherwise(1.0)
    score = score * F.when(path.contains("_"), 0.9).otherwise(1.0)
    return score


def is_crawler_trap(
    url: Column | str,
    *,
    max_depth: int = 12,
    max_params: int = 10,
    max_param_repeats: int = 3,
    max_date_segments: int = 2,
    max_url_len: int = 2048,
) -> Column:
    """Spider-trap heuristics as one pure Column predicate.

    No reference counterpart (its FilterChain matches user globs only)
    — at frontier scale infinite URL spaces are a top-3 crawl killer,
    so the classic trap signals run as admission filters:

    - adjacent repeated path segments (``/a/a/a`` — self-linking dirs),
    - pathological path depth (> ``max_depth`` segments),
    - query-parameter explosion (> ``max_params`` params) or same-name
      duplicate params totalling >= ``max_param_repeats`` (session
      loops),
    - calendar traps: more than ``max_date_segments`` 4-digit-year
      segments in one path (``/2026/01/2025/12/...`` infinite archive
      walks),
    - absurd URL length (> ``max_url_len``).

    True = trap. Cheap (JVM-only), so run it before the seen anti-join.
    """
    c = F.col(url) if isinstance(url, str) else url
    path = F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.try_parse_url(c, F.lit("QUERY")), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda p: p != "")
    n = F.size(segs)

    # zip_with pads the shorter array with null -> coalesce each pair
    # comparison, else `exists` goes three-valued and returns null
    repeated_seg = F.exists(
        F.zip_with(segs, F.slice(segs, 2, F.greatest(n - 1, F.lit(0))),
                   lambda a, b: F.coalesce(a == b, F.lit(False))),
        lambda x: x,
    )
    too_deep = n > max_depth

    params = F.filter(F.split(query, "&"), lambda p: p != "")
    too_many_params = F.size(params) > max_params
    names = F.transform(params, lambda p: F.split(p, "=")[0])
    # total same-name duplicates beyond the budget. O(p) via
    # array_distinct — the naive per-name count is O(p²) per row, which
    # an adversarial 100k-param URL turns into a task stall inside the
    # very filter that exists to shed adversarial URLs
    repeated_param = (
        F.size(names) - F.size(F.array_distinct(names)) >= max_param_repeats
    )

    date_segs = F.size(F.filter(segs, lambda s: s.rlike("^(19|20)\\d{2}$")))
    calendar = date_segs > max_date_segments

    return (
        repeated_seg
        | too_deep
        | too_many_params
        | repeated_param
        | calendar
        | (F.length(c) > max_url_len)
    )


# ---------------------------------------------------------------------------
# FilterChain — reference filters.py:69-116
# ---------------------------------------------------------------------------


def filter_chain(*predicates: Column) -> Column:
    """Short-circuit AND of compiled filters."""
    if not predicates:
        return F.lit(True)
    return reduce(lambda a, b: a & b, predicates)


def filter_stats(df: DataFrame, predicates: dict[str, Column]) -> DataFrame:
    """Per-filter pass/reject counters (reference FilterStats) in ONE
    aggregate pass over the input — no per-filter scans."""
    aggs = [F.count(F.lit(1)).alias("total_urls")]
    for name, pred in predicates.items():
        aggs.append(F.sum(pred.cast("int")).alias(f"{name}_passed"))
    return df.agg(*aggs)
