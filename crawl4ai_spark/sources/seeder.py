"""URL seeding: sitemap + Common-Crawl-index sources -> round-0 frontier
(SURVEY.md S5-S8, F9, T5).

Reference: AsyncUrlSeeder (/root/reference/crawl4ai/async_url_seeder.py)
- sitemap source with sitemapindex recursion (:765-958),
- CC index scan with glob pattern (:709-762),
- the urls() pipeline: source union -> dedup -> nonsense filter ->
  pattern filter -> optional relevance scoring -> threshold -> sort ->
  max_urls cap (:267-448),
- the nonsense-URL blacklist (:1284-1379, active rules).

Spark shape: ONE declarative pipeline. Sitemap XML never leaves the
JVM — ``<loc>`` extraction is regexp_extract_all; sitemapindex
recursion is a driver loop over a (tiny) sitemap dimension table. The
bounded-queue backpressure of the reference is Spark's partitioned
execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.headpeek import content_relevance_score, head_section
from ..operators.filters import url_pattern_filter

UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]
NON_CONTENT_PATHS = [
    "/wp-admin", "/wp-includes", "/wp-content/uploads",
    "/admin", "/login", "/signin", "/signup", "/register",
    "/checkout", "/cart", "/account", "/profile",
    "/search", "/404", "/error",
    "/.git", "/.svn", "/.hg",
    "/cgi-bin", "/scripts", "/includes",
]
SHORT_PATH_WHITELIST = ["/", "/en", "/de", "/fr", "/es", "/it"]


def is_nonsense_url(url: Column | str) -> Column:
    """Native-expression port of _is_nonsense_url (active rules 1-3,
    9-12): robots/sitemap files, utility files, hidden path segments,
    non-content paths, print params, too-short paths."""
    c = F.col(url) if isinstance(url, str) else url
    low = F.lower(c)
    path = F.lower(F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("")))

    r1 = (
        path.endswith("/robots.txt")
        | path.endswith("/sitemap.xml")
        | path.endswith("/sitemap_index.xml")
    )
    r2 = path.contains("/sitemap") & (
        path.endswith(".xml") | path.endswith(".xml.gz") | path.endswith(".txt")
    )
    r3 = F.lit(False)
    for f in UTILITY_FILES:
        r3 = r3 | path.endswith("/" + f)
    parts = F.filter(F.split(path, "/"), lambda p: p != "")
    r9 = F.exists(parts, lambda p: p.startswith("."))
    r10 = F.lit(False)
    for ncp in NON_CONTENT_PATHS:
        r10 = r10 | path.contains(ncp)
    r11 = (
        low.contains("?print=")
        | low.contains("&print=")
        | low.contains("/print/")
        | low.contains("_print.")
    )
    stripped = F.regexp_replace(path, "^/+|/+$", "")
    r12 = (F.length(stripped) < 3) & ~path.isin(SHORT_PATH_WHITELIST)
    return r1 | r2 | r3 | r9 | r10 | r11 | r12


def sitemap_locs(xml: Column | str) -> Column:
    """All <loc> entries of a sitemap document (whitespace-trimmed)."""
    c = F.col(xml) if isinstance(xml, str) else xml
    return F.regexp_extract_all(c, F.lit(r"(?s)<loc>\s*(.*?)\s*</loc>"), F.lit(1))


def sitemap_entries(xml: Column | str) -> Column:
    """Full sitemap-protocol <url> entries as an array of structs
    (loc, lastmod, changefreq, priority) — sitemaps.org §XML format.

    ``sitemap_locs`` keeps the loc-only fast path; this variant feeds
    freshness-aware seeding: lastmod/changefreq are exactly the priors
    the recrawl scheduler (operators/recrawl.py) consumes. All JVM
    regex — no Python.
    """
    c = F.col(xml) if isinstance(xml, str) else xml
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)
    )

    def field(b: Column, tag: str) -> Column:
        v = F.regexp_extract(
            b, f"(?s)<{tag}>\\s*(.*?)\\s*</{tag}>", 1
        )
        return F.when(v == "", F.lit(None)).otherwise(v)

    return F.transform(
        blocks,
        lambda b: F.struct(
            field(b, "loc").alias("loc"),
            F.try_to_timestamp(
                F.substring(field(b, "lastmod"), 1, 10), F.lit("yyyy-MM-dd")
            ).alias("lastmod"),
            field(b, "changefreq").alias("changefreq"),
            # try_cast: a junk <priority> in one sitemap must not kill
            # the whole seeding job under ANSI mode (Spark 4 default)
            field(b, "priority").try_cast("double").alias("priority"),
        ),
    )


# changefreq -> prior change intensity (changes/day) for the recrawl
# scheduler's cold-start (sitemaps.org vocabulary; "always" ~ hourly+)
CHANGEFREQ_LAMBDA_PER_DAY = {
    "always": 24.0,
    "hourly": 24.0,
    "daily": 1.0,
    "weekly": 1.0 / 7.0,
    "monthly": 1.0 / 30.0,
    "yearly": 1.0 / 365.0,
    "never": 1.0 / 3650.0,
}


def changefreq_lambda(changefreq: Column | str) -> Column:
    """Map a sitemap changefreq string to a prior lambda (changes/day);
    unknown/missing values take the monthly default."""
    c = F.col(changefreq) if isinstance(changefreq, str) else changefreq
    expr = F.lit(CHANGEFREQ_LAMBDA_PER_DAY["monthly"])
    for name, lam in CHANGEFREQ_LAMBDA_PER_DAY.items():
        expr = F.when(F.lower(c) == name, F.lit(lam)).otherwise(expr)
    return expr


def robots_sitemap_locs(body: Column | str) -> Column:
    """``Sitemap:`` URLs declared in a robots.txt body (any group —
    sitemaps.org protocol scope is the whole file). Mirrors the
    reference seeder's robots fallback parse
    (async_url_seeder.py:807-818)."""
    c = F.col(body) if isinstance(body, str) else body
    return F.regexp_extract_all(
        c, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1)
    )


def expand_sitemaps(
    spark: SparkSession,
    sitemaps: DataFrame,
    roots: list[str],
    max_depth: int = 5,
) -> DataFrame:
    """Resolve sitemapindex recursion: starting from ``roots``, follow
    <sitemapindex> loc entries through the (sitemap_url, xml) dimension
    table; returns a DataFrame(url) of page URLs.

    The per-level sitemap list is collected to the driver — sitemap
    counts are tiny relative to the URLs they enumerate.
    """
    entries = sitemaps.select(
        "sitemap_url",
        F.col("xml").contains("<sitemapindex").alias("is_index"),
        F.explode(sitemap_locs("xml")).alias("loc"),
    )
    seen = set(roots)
    frontier = list(roots)
    url_parts: list[DataFrame] = []
    for _ in range(max_depth):
        if not frontier:
            break
        batch = entries.filter(F.col("sitemap_url").isin(frontier))
        url_parts.append(
            batch.filter(~F.col("is_index")).select(F.col("loc").alias("url"))
        )
        children = [
            r["loc"]
            for r in batch.filter(F.col("is_index")).select("loc").collect()
        ]
        frontier = [c for c in children if c not in seen]
        seen.update(frontier)
    if not url_parts:
        return spark.createDataFrame([], "url string")
    out = url_parts[0]
    for p in url_parts[1:]:
        out = out.unionByName(p)
    return out


def seed_urls(
    spark: SparkSession,
    *,
    sitemaps: DataFrame | None = None,
    sitemap_roots: list[str] | None = None,
    robots_bodies: DataFrame | None = None,
    cc_index: DataFrame | None = None,
    domain: str | None = None,
    pattern: str = "*",
    heads: DataFrame | None = None,
    query: str | None = None,
    score_threshold: float | None = None,
    max_urls: int = -1,
    filter_nonsense: bool = True,
) -> DataFrame:
    """The seeder pipeline: union sources -> dedup -> nonsense filter ->
    pattern filter -> optional head-BM25 relevance -> threshold ->
    sort desc by score -> max_urls cap.

    Returns (url, relevance_score). With no query, every URL scores 0.0
    and ordering falls back to url asc (deterministic).

    ``robots_bodies`` (host, body) adds the reference's robots.txt
    fallback (async_url_seeder.py:768, 807-826): for hosts with NO
    explicit sitemap root (= no successful direct probe), ``Sitemap:``
    lines declared in robots.txt become additional recursion roots.
    """
    roots = list(sitemap_roots or [])
    if robots_bodies is not None and sitemaps is not None:
        from urllib.parse import urlparse

        # drop None (a scheme-less root parses to hostname None): a
        # None inside isin() makes the NOT-IN predicate NULL for every
        # unprobed host, silently disabling the whole robots fallback
        probed = {
            h for h in (urlparse(r).hostname for r in roots)
            if h is not None
        }
        discovered = (
            robots_bodies.select(
                F.col("host"),
                F.explode(robots_sitemap_locs(F.col("body"))).alias("loc"),
            )
            .filter(~F.col("host").isin(list(probed)) if probed else F.lit(True))
            .select("loc")
            .distinct()
            .collect()  # tiny per-host dimension, like the root list itself
        )
        roots += sorted(r["loc"] for r in discovered)
    parts = []
    if sitemaps is not None:
        parts.append(expand_sitemaps(spark, sitemaps, roots))
    if cc_index is not None:
        cc = cc_index.select("url")
        if domain:
            host = F.lower(
                F.coalesce(F.try_parse_url("url", F.lit("HOST")), F.lit(""))
            )
            cc = cc.filter((host == domain) | host.endswith("." + domain))
        parts.append(cc)
    if not parts:
        return spark.createDataFrame([], "url string, relevance_score double")
    urls = parts[0]
    for p in parts[1:]:
        urls = urls.unionByName(p)
    urls = urls.dropDuplicates(["url"])
    if filter_nonsense:
        urls = urls.filter(~is_nonsense_url("url"))
    if pattern != "*":
        urls = urls.filter(url_pattern_filter("url", [pattern]))
    if query and heads is not None:
        h = heads.select("url", F.col("head").alias("__head"))
        urls = (
            urls.join(h, "url", "left")
            .withColumn(
                "relevance_score",
                F.coalesce(
                    content_relevance_score(F.col("__head"), query), F.lit(0.0)
                ),
            )
            .drop("__head")
        )
    else:
        urls = urls.withColumn("relevance_score", F.lit(0.0))
    if score_threshold is not None:
        urls = urls.filter(F.col("relevance_score") >= score_threshold)
    urls = urls.orderBy(F.desc("relevance_score"), F.asc("url"))
    if max_urls > 0:
        urls = urls.limit(max_urls)
    return urls


# ---------------------------------------------------------------------------
# deterministic synthetic fixtures (sitemaps + CC index over the corpus)
# ---------------------------------------------------------------------------


def synthetic_sitemaps(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[str]]:
    """Sitemap dimension table for the synthetic corpus: h0 (the hot
    host) gets a sitemapindex of two child sitemaps split by doc_id
    parity; every other host gets one flat sitemap. Returns
    (sitemaps_df, root_sitemap_urls)."""
    from ..synth import generate_pages

    pages = generate_pages(spark, sf_dir).select("url")
    host = F.regexp_extract("url", r"https://([^./]+)\.", 1)
    tagged = pages.withColumn("host", host).withColumn(
        "sm",
        F.when(
            F.col("host") == "h0",
            F.concat(
                F.lit("https://h0.example.com/sitemap-"),
                (F.xxhash64("url") % 2 == 0).cast("int").cast("string"),
                F.lit(".xml"),
            ),
        ).otherwise(
            F.concat(F.lit("https://"), F.col("host"), F.lit(".example.com/sitemap.xml"))
        ),
    )
    body = tagged.groupBy("sm").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("url")),
                    lambda u: F.concat(F.lit("<url><loc>"), u, F.lit("</loc></url>")),
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    ).select(F.col("sm").alias("sitemap_url"), "xml")

    index_xml = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://h0.example.com/sitemap-0.xml</loc></sitemap>"
        "<sitemap><loc> https://h0.example.com/sitemap-1.xml </loc></sitemap>"
        "</sitemapindex>"
    )
    index_df = spark.createDataFrame(
        [("https://h0.example.com/sitemap_index.xml", index_xml)],
        "sitemap_url string, xml string",
    )
    hosts = [r["host"] for r in tagged.select("host").distinct().collect()]
    roots = ["https://h0.example.com/sitemap_index.xml"] + sorted(
        f"https://{h}.example.com/sitemap.xml" for h in hosts if h != "h0"
    )
    return body.unionByName(index_df), roots


def synthetic_cc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC-index-style url list: every page URL plus deterministic noise
    (robots/sitemap/utility/hidden/admin/print URLs) that the nonsense
    filter must drop."""
    from ..synth import generate_pages

    pages = generate_pages(spark, sf_dir).select("url")
    d = F.abs(F.xxhash64("url"))
    noise = pages.select(
        F.concat(
            F.lit("https://h"),
            (d % 32).cast("string"),
            F.lit(".example.com"),
            F.element_at(
                F.array(
                    F.lit("/robots.txt"),
                    F.lit("/sitemap.xml"),
                    F.lit("/wp-admin/options.php"),
                    F.lit("/.hidden/file.html"),
                    F.lit("/page_print.html"),
                    F.lit("/x"),
                ),
                (d % 6 + 1).cast("int"),
            ),
        ).alias("url")
    )
    return pages.unionByName(noise)
