"""Golden URL tests.

The normalize_url_basic cases are ported 1:1 from the reference's own
hermetic suite (/root/reference/tests/test_normalize_url.py:1-80) — the
byte-parity gate for URL handling.
"""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import (
    base_domain,
    canonicalize_udf,
    canonicalize_url,
    extension,
    get_base_domain_py,
    is_external,
    is_external_url_py,
    normalize_url_basic,
    path_depth,
    url_hash,
)

GOLDEN_BASIC = [
    ("path/to/page.html", "http://example.com/base/", "http://example.com/base/path/to/page.html"),
    ("page.html", "http://example.com/base/", "http://example.com/base/page.html"),
    ("page.html", "http://example.com/base", "http://example.com/page.html"),
    ("http://another.com/page.html", "http://example.com/", "http://another.com/page.html"),
    ("  page.html  ", "http://example.com/", "http://example.com/page.html"),
    ("", "http://example.com/base/", "http://example.com/base/"),
    ("", "http://example.com/base", "http://example.com/base"),
    ("page.html?query=test", "http://example.com/", "http://example.com/page.html?query=test"),
    ("page.html#section", "http://example.com/", "http://example.com/page.html#section"),
    ("https://secure.example.com/page.html", "http://example.com/", "https://secure.example.com/page.html"),
    ("../otherpage.html", "http://example.com/base/current/", "http://example.com/base/otherpage.html"),
    ("/otherpage.html", "http://example.com/base/current/", "http://example.com/otherpage.html"),
    ("file.html", "http://example.com/path", "http://example.com/file.html"),
    ("page.html", "http://example.com", "http://example.com/page.html"),
    ("?query=true", "http://example.com/page.html", "http://example.com/page.html?query=true"),
    ("#fragment", "http://example.com/page.html", "http://example.com/page.html#fragment"),
    (
        "./P020241203375994691134.xlsx",
        "http://example.com/zwgk/fdzdgk/zdxx/spaq/t19360680.shtml",
        "http://example.com/zwgk/fdzdgk/zdxx/spaq/P020241203375994691134.xlsx",
    ),
    (
        "another.doc",
        "http://example.com/zwgk/fdzdgk/zdxx/spaq/t19360680.shtml",
        "http://example.com/zwgk/fdzdgk/zdxx/spaq/another.doc",
    ),
    ("path/file.html", "http://example.com:8080/base/", "http://example.com:8080/base/path/file.html"),
    ("path%20with%20spaces/file.html", "http://example.com/", "http://example.com/path%20with%20spaces/file.html"),
]


@pytest.mark.parametrize("href,base,expected", GOLDEN_BASIC)
def test_normalize_url_basic_golden(href, base, expected):
    assert normalize_url_basic(href, base) == expected


def test_normalize_url_basic_invalid_base():
    with pytest.raises(ValueError):
        normalize_url_basic("page.html", "ftp://example.com/")
    with pytest.raises(ValueError):
        normalize_url_basic("page.html", "http:///path/")


CANON_CASES = [
    # (href, base, expected) — semantics of reference utils.py:2122-2205
    ("page.html#section", "http://example.com/", "http://example.com/page.html"),  # fragment dropped
    ("HTTP://EXAMPLE.com/Path/", "http://x.com/", "HTTP://example.com/Path"),  # see note below
    ("/a/?utm_source=tw&b=2&a=1", "https://Site.COM", "https://site.com/a?a=1&b=2"),
    ("/a//b///c/", "https://site.com", "https://site.com/a//b///c"),  # path kept verbatim but trailing / stripped
    ("/p?gclid=xyz&fbclid=1&REF=2", "https://site.com", "https://site.com/p"),
    ("/p?keep=&z=1&a=2", "https://site.com", "https://site.com/p?a=2&keep=&z=1"),
    (None, "https://site.com", None),
    ("", "https://site.com", None),
]


@pytest.mark.parametrize("href,base,expected", CANON_CASES)
def test_canonicalize_url(href, base, expected):
    got = canonicalize_url(href, base)
    if href == "HTTP://EXAMPLE.com/Path/":
        # urljoin keeps the href's scheme casing via urlparse: scheme is
        # normalized to lowercase by urlparse itself
        assert got == "http://example.com/Path"
    else:
        assert got == expected


def test_canonicalize_quotes_path():
    assert (
        canonicalize_url("/a b/c.html", "https://site.com")
        == "https://site.com/a%20b/c.html"
    )
    # already-encoded stays stable (quote(unquote(x)) idempotent here)
    assert (
        canonicalize_url("/a%20b/c.html", "https://site.com")
        == "https://site.com/a%20b/c.html"
    )


BASE_DOMAIN_CASES = [
    ("https://www.example.com/page", "example.com"),
    ("https://sub.example.co.uk/x", "example.co.uk"),
    ("https://example.com:8080/x", "example.com"),
    ("https://a.b.c.example.com", "example.com"),
    ("https://localhost/x", "localhost"),
    ("not a url", ""),
]


@pytest.mark.parametrize("url,expected", BASE_DOMAIN_CASES)
def test_get_base_domain_py(url, expected):
    assert get_base_domain_py(url) == expected


def test_base_domain_spark_matches_py(spark):
    urls = [u for u, _ in BASE_DOMAIN_CASES]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["bd"] for r in df.select("url", base_domain("url").alias("bd")).collect()}
    for u, expected in BASE_DOMAIN_CASES:
        spark_val = got[u] or ""
        assert spark_val == expected, f"{u}: spark={spark_val!r} py={expected!r}"


EXTERNAL_CASES = [
    ("mailto:x@y.com", "example.com", True),
    ("javascript:void(0)", "example.com", True),
    ("/relative/path", "example.com", False),
    ("https://www.example.com/x", "example.com", False),
    ("https://sub.example.com/x", "example.com", False),
    ("https://other.com/x", "example.com", True),
]


@pytest.mark.parametrize("url,bd,expected", EXTERNAL_CASES)
def test_is_external_py(url, bd, expected):
    assert is_external_url_py(url, bd) is expected


def test_is_external_spark_matches_py(spark):
    df = spark.createDataFrame([(u, b) for u, b, _ in EXTERNAL_CASES], ["url", "bd"])
    rows = df.select("url", is_external("url", "bd").alias("ext")).collect()
    expected = {u: e for u, _, e in EXTERNAL_CASES}
    for r in rows:
        assert r["ext"] == expected[r["url"]], r["url"]


def test_canonicalize_udf_batch(spark):
    data = [(h, b) for h, b, _ in CANON_CASES if h]
    df = spark.createDataFrame(data, ["href", "base"])
    rows = df.select(
        "href", canonicalize_udf("href", "base").alias("canon")
    ).collect()
    py = {h: canonicalize_url(h, b) for h, b in data}
    for r in rows:
        assert r["canon"] == py[r["href"]]


def test_url_hash_deterministic(spark):
    df = spark.createDataFrame([("https://a.com/x",), ("https://a.com/x",)], ["url"])
    vals = [r[0] for r in df.select(url_hash("url")).collect()]
    assert vals[0] == vals[1]
    assert isinstance(vals[0], int)


PATH_DEPTH_CASES = [
    ("http://example.com", 0),
    ("http://example.com/", 0),
    ("http://example.com/a", 1),
    ("http://example.com/a/b", 2),
    ("http://example.com/a/b/", 2),
    ("http://example.com//a//b", 2),
]


def test_path_depth(spark):
    df = spark.createDataFrame([(u,) for u, _ in PATH_DEPTH_CASES], ["url"])
    got = {r["url"]: r["d"] for r in df.select("url", path_depth("url").alias("d")).collect()}
    for u, expected in PATH_DEPTH_CASES:
        assert got[u] == expected, u


EXT_CASES = [
    ("http://example.com/file.HTML", "html"),
    ("http://example.com/file.tar.gz", "gz"),
    ("http://example.com/dir/", ""),
    ("http://example.com", ""),
    ("http://example.com/noext", ""),
    ("http://example.com/a/b.PDF", "pdf"),
]


def test_extension(spark):
    df = spark.createDataFrame([(u,) for u, _ in EXT_CASES], ["url"])
    got = {r["url"]: r["e"] for r in df.select("url", extension("url").alias("e")).collect()}
    for u, expected in EXT_CASES:
        assert (got[u] or "") == expected, u


def test_user_agent_client_hints_branches(spark):
    """Sec-CH-UA derivation matches the reference branch logic
    (user_agent_generator.py:24-66) for all four browser families."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.user_agent import client_hints, user_agent

    cases = [
        ("Mozilla/5.0 (X) AppleWebKit/537.36 Chrome/119.0.1 Safari/537.36",
         '"Chromium";v="119", "Not_A Brand";v="8", "Google Chrome";v="119"'),
        ("Mozilla/5.0 (X) Chrome/118.0.1 Safari/537.36 Edg/118.0.2",
         '"Chromium";v="118", "Not_A Brand";v="8", "Microsoft Edge";v="118"'),
        ("Mozilla/5.0 (X) Gecko/20100101 Firefox/119.0", '""'),
        ("Mozilla/5.0 (iPhone) Version/16.5 Mobile/15E148", 
         '"Safari";v="16", "Not_A Brand";v="8"'),
        # no recognized browser -> EMPTY string (the reference joins an
        # empty hints list; only firefox yields the literal '""')
        ("curl/8.0", ""),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "ua string")
    got = [r["h"] for r in df.select(client_hints("ua").alias("h")).collect()]
    assert got == [c[1] for c in cases]

    # determinism: same index -> same UA
    d = spark.range(20).select(user_agent(F.col("id")).alias("ua"))
    a = [r["ua"] for r in d.collect()]
    b = [r["ua"] for r in d.collect()]
    assert a == b and all(u.startswith("Mozilla/5.0 (") for u in a)
