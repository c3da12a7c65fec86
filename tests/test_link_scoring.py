"""Link intrinsic/total scoring: the Spark column expression is
cross-validated against an independent Python execution of the
reference rules (utils.py:3123-3283)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.functions.link_scoring import (
    is_docs_site,
    link_intrinsic_score,
    page_terms,
    score_page_links,
    total_link_score,
)


def py_intrinsic(link_text, url, title_attr, class_attr, rel_attr, terms, docs):
    """Straight Python transcription of the reference scoring rules."""
    score = 0.0
    if title_attr and len(title_attr.strip()) > 3:
        score += 1.0
    cls = (class_attr or "").lower()
    if any(x in cls for x in ["nav", "menu", "primary", "main", "important"]):
        score += 1.5
    if any(x in cls for x in ["ad", "sponsor", "track", "promo", "banner"]):
        score -= 1.0
    rel = (rel_attr or "").lower()
    if any(x in rel for x in ["canonical", "next", "prev", "chapter"]):
        score += 1.0
    if any(x in rel for x in ["nofollow", "sponsored", "ugc"]):
        score -= 0.5
    low = url.lower()
    if any(x in low for x in ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]):
        score += 2.0
    elif any(x in low for x in ["/blog/", "/article/", "/post/", "/news/"]):
        score += 1.0
    if any(x in low for x in ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]):
        score -= 1.5
    depth = url.count("/") - 2
    if depth <= 2:
        score += 1.0
    elif depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5
    if link_text:
        t = link_text.strip()
        if len(t) > 3:
            score += 1.0
        wc = len(t.split())
        if wc >= 2:
            score += 0.5
        if wc >= 4:
            score += 0.5
        if t.lower() in ["click here", "read more", "more info", "link", "here"]:
            score -= 1.0
    if terms and link_text:
        lw = {
            w.strip('.,!?;:"()[]{}').lower()
            for w in link_text.split()
            if len(w.strip('.,!?;:"()[]{}')) > 2
        }
        if lw:
            overlap = len(lw & terms)
            if overlap > 0:
                score += overlap / min(len(lw), 10) * 2.0
    if docs and link_text and any(
        k in link_text.lower() for k in ["api", "reference", "guide", "tutorial", "example"]
    ):
        score += 1.0
    return max(0.0, min(score, 10.0))


CASES = [
    # (text, url, title_attr, class_attr, rel_attr, page_text, base_url)
    ("API reference guide here", "https://docs.example.com/docs/api", "Full docs",
     "nav primary", "next", "api reference documentation portal", "https://docs.example.com/"),
    ("click here", "http://x.com/track/click/z/y/w/v/u", None, "ad banner",
     "nofollow sponsored", "unrelated words entirely", "https://plain.com/"),
    ("read the full article now", "https://x.com/blog/post-1", "t", None, None,
     "article about the full story", "https://x.com/"),
    ("", "https://x.com/a", None, None, None, "", "https://x.com/"),
    ("hi", "https://x.com/guide/", "Good Title Here", "menu", "ugc",
     "guide hi there", "https://api.site.io/"),
]


def test_intrinsic_matches_python_port(spark):
    rows = [(t, u, ta, ca, ra, pt, bu) for t, u, ta, ca, ra, pt, bu in CASES]
    df = spark.createDataFrame(
        rows,
        "text string, url string, title_attr string, class_attr string, "
        "rel_attr string, page_text string, base_url string",
    )
    out = df.select(
        "text", "url",
        F.round(
            link_intrinsic_score(
                F.col("text"), F.col("url"), F.col("title_attr"),
                F.col("class_attr"), F.col("rel_attr"),
                page_terms(F.col("page_text"), F.lit(""), F.lit("")),
                is_docs_site("base_url"),
            ),
            6,
        ).alias("score"),
    ).collect()
    for row, case in zip(out, CASES):
        text, url, ta, ca, ra, pt, bu = case
        terms = {
            w.strip('.,!?;:"()[]{}').lower()
            for w in pt.split()
            if len(w.strip('.,!?;:"()[]{}')) > 2
        }
        docs = any(m in bu.lower() for m in ["docs.", "api.", "developer.", "reference."])
        want = round(py_intrinsic(text, url, ta, ca, ra, terms, docs), 6)
        assert abs(row["score"] - want) < 1e-9, (case, row["score"], want)


def test_total_score_combination(spark):
    df = spark.range(1)
    got = df.select(
        total_link_score(F.lit(8.0), F.lit(0.5), query_provided=True).alias("both"),
        total_link_score(F.lit(8.0), None, query_provided=False).alias("ionly"),
        total_link_score(F.lit(8.0), F.lit(0.5), score_links_enabled=False).alias("off"),
    ).first()
    assert abs(got["both"] - (8.0 * 0.7 + 5.0 * 0.3)) < 1e-9
    assert got["ionly"] == 8.0
    assert got["off"] == 5.0


def test_score_page_links_on_crawl_output(spark, sf_dir, tmp_path):
    from crawl4ai_spark.functions.scrape import scrape_stage
    from crawl4ai_spark.synth import generate_pages

    pages = generate_pages(spark, sf_dir).limit(20)
    results = scrape_stage(pages, "html", "url").withColumnRenamed(
        "text_extracted", "text_extracted"
    )
    scored = score_page_links(results.select("url", "title", "headings", "meta", "links"))
    rows = scored.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["intrinsic_score"] <= 10.0
        assert r["total_score"] == r["intrinsic_score"]  # no query -> intrinsic
