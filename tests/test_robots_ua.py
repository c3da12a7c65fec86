"""RFC 9309 user-agent group selection (operators/robots.py).

Pure-driver tests: group collection, specificity, urllib-substring
compatibility tier, merge-of-identical-tokens, * fallback.
"""

from crawl4ai_spark.operators.robots import parse_robots_txt

BODY = """
User-agent: *
Disallow: /all/

User-agent: examplebot
Disallow: /eb/
Crawl-delay: 2

User-agent: ExampleBot
Allow: /eb/ok/

User-agent: example
Disallow: /ex/

User-agent: otherbot
User-agent: thirdbot
Disallow: /multi/
"""


def test_star_fallback_unknown_agent():
    r = parse_robots_txt(BODY, "unknownbot/1.0")
    assert r["disallow"] == ["/all/"]
    assert r["crawl_delay"] is None


def test_exact_token_match_case_insensitive_and_merged():
    # both examplebot groups merge (identical token, RFC 9309);
    # product token is taken before the first '/'
    r = parse_robots_txt(BODY, "ExampleBot/2.1 (+https://x)")
    assert r["disallow"] == ["/eb/"]
    assert r["allow"] == ["/eb/ok/"]
    assert r["crawl_delay"] == 2.0


def test_longest_substring_beats_shorter():
    # no exact 'examplebotx' group; 'examplebot' (10) beats
    # 'example' (7) in the urllib-compatibility substring tier
    r = parse_robots_txt(BODY, "examplebotx")
    assert r["disallow"] == ["/eb/"]


def test_substring_tier_matches_reference_semantics():
    # urllib (and so the reference) matches `agent in useragent`
    r = parse_robots_txt(BODY, "example")
    assert r["disallow"] == ["/ex/"]


def test_multi_token_group_applies_to_each_token():
    for ua in ("otherbot", "thirdbot/0.1"):
        assert parse_robots_txt(BODY, ua)["disallow"] == ["/multi/"]


def test_default_ua_unchanged():
    # the pre-existing single-agent behavior: ua omitted -> '*' group
    r = parse_robots_txt(BODY)
    assert r["disallow"] == ["/all/"]


def test_consecutive_agent_lines_after_rules_start_new_group():
    body = "User-agent: a\nDisallow: /1/\nUser-agent: b\nDisallow: /2/\n"
    assert parse_robots_txt(body, "a")["disallow"] == ["/1/"]
    assert parse_robots_txt(body, "b")["disallow"] == ["/2/"]


def test_empty_and_commented_bodies():
    assert parse_robots_txt("", "bot")["disallow"] == []
    assert parse_robots_txt("# only comments\n", "bot")["allow"] == []


def test_decision_matches_stdlib_on_root_and_query_urls(spark):
    """The match target is quote(path + '?' + query) or '/' — exactly
    what stdlib robotparser can_fetch compares (the reference wraps
    it). Pins the two r5 fixes: empty path normalizes to '/' (a
    Disallow-/ host's ROOT url was being allowed), and query-targeted
    rules ('Disallow: /foo?bar') actually see the query."""
    import urllib.robotparser as rp

    from crawl4ai_spark.operators.robots import (
        rules_table,
        with_robots_decision,
    )

    bodies = {
        "blockall.example": "User-agent: *\nDisallow: /",
        "qblock.example": (
            "User-agent: *\nDisallow: /foo?bar\n"
            "Disallow: /search?q=\nDisallow: /a=b\nAllow: /foo?bar=ok\n"
        ),
    }
    urls = [
        "https://blockall.example",
        "https://blockall.example/",
        "https://qblock.example/foo?bar=1",
        "https://qblock.example/foo",
        "https://qblock.example/search?q=x",
        "https://qblock.example/search",
        "https://qblock.example/a=b",
        "https://qblock.example/",
    ]
    df = spark.createDataFrame(
        [(u, u.split("/")[2]) for u in urls]
        + [("https://qblock.example/foo?bar=ok", "qblock.example")],
        "url string, host string",
    )
    rules = rules_table(spark, bodies)
    got = {
        r["url"]: r["robots_allowed"]
        for r in with_robots_decision(df, rules).collect()
    }
    for u in urls:
        p = rp.RobotFileParser()
        p.parse(bodies[u.split("/")[2]].splitlines())
        assert got[u] == p.can_fetch("*", u), u
    # documented divergence (robots.py module doc): RFC 9309
    # longest-match-wins lets the more specific Allow beat the
    # Disallow; stdlib's first-match-in-file-order would block it
    assert got["https://qblock.example/foo?bar=ok"] is True
