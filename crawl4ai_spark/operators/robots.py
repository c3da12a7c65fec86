"""robots.txt rules as a broadcast dimension table (SURVEY.md S12/J6).

Reference semantics: RobotsParser (utils.py:252-365) — per-domain
robots.txt fetched + cached with TTL, ``can_fetch(url, ua)`` consulted
before every fetch (async_webcrawler.py:317-331); disallowed URLs
short-circuit to a 403 result.

Spark reformulation: a ``robots_rules(host, disallow, allow,
crawl_delay)`` table (refreshed out-of-band per round at scale),
broadcast-joined to the frontier on ``host``; the allow/deny decision
is a native path test over the rule arrays — no Python per row.
Wildcard (``*``) and end-anchored (``$``) rules are honored, like the
reference's patched robotparser (utils.py:53-73).

Resolution is RFC 9309 most-specific-wins (longest rule, ties to
allow). Two DOCUMENTED divergences from the reference, both cases
where urllib quirks lose user intent (proven in
tests/test_frontier.py::test_robots_wildcard_rules_unit): the
reference drops ``$``-anchored rules entirely (stdlib quotes ``$`` to
``%24``, which its patch never undoes) and resolves rules first-match
in file order (an early broad Disallow shadows a later specific
Allow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import host as host_of

RULES_SCHEMA = (
    "host string, "
    "disallow array<struct<p:string,rx:string,ln:int>>, "
    "allow array<struct<p:string,rx:string,ln:int>>, "
    "crawl_delay double"
)


def _compile_rule(rule: str) -> tuple[str, str | None, int]:
    """Compile one rule path to (prefix, regex-or-null, specificity).

    The reference monkey-patches urllib's robotparser to honor ``*``
    wildcards and ``$`` end anchors (utils.py:53-73); here wildcard
    rules compile ONCE on the driver to an anchored regex evaluated
    natively via regexp_like, while plain rules stay as prefix tests
    (no regex engine in the common path). Specificity = raw rule
    length, the longest-match-wins weight.
    """
    import re as _re
    from urllib.parse import quote

    # normalize to percent-encoded form so rules written with raw
    # reserved chars match canonicalized (%-encoded) URL paths — the
    # reference gets this via robotparser's quote() of both sides;
    # '%' stays safe so already-encoded rules aren't double-encoded,
    # '*'/'$' keep their wildcard/anchor roles
    norm = "*".join(quote(part, safe="/%$") for part in rule.split("*"))
    if "*" in norm or norm.endswith("$"):
        pat = norm
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        rx = "^" + ".*".join(_re.escape(part) for part in pat.split("*"))
        if anchored:
            rx += "$"
        return (norm, rx, len(rule))
    return (norm, None, len(rule))


def parse_robots_txt(text: str) -> dict:
    """Parse one robots.txt body for the ``*`` user-agent group.

    Line-oriented parse: User-agent / Disallow / Allow / Crawl-delay.
    Rules under any ``User-agent: *`` group apply; other groups are
    skipped (single-agent engine).
    """
    disallow: list[str] = []
    allow: list[str] = []
    crawl_delay = None
    active = False
    seen_agent_line = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_agent_line and (disallow or allow or crawl_delay is not None):
                # a new group after rules: previous group closed
                active = False
            if val == "*":
                active = True
            seen_agent_line = True
        elif key == "disallow" and active:
            if val:
                disallow.append(val)
        elif key == "allow" and active:
            if val:
                allow.append(val)
        elif key == "crawl-delay" and active:
            try:
                crawl_delay = float(val)
            except ValueError:
                pass
    return {"disallow": disallow, "allow": allow, "crawl_delay": crawl_delay}


def rules_table(spark: SparkSession, robots_bodies: dict[str, str]) -> DataFrame:
    """Build the robots_rules dimension from {host: robots.txt text};
    rule paths are compiled driver-side (see :func:`_compile_rule`)."""
    rows = []
    for h, body in sorted(robots_bodies.items()):
        r = parse_robots_txt(body)
        rows.append(
            (
                h,
                [_compile_rule(x) for x in r["disallow"]],
                [_compile_rule(x) for x in r["allow"]],
                r["crawl_delay"],
            )
        )
    return spark.createDataFrame(rows, RULES_SCHEMA)


def _best_match_len(path_col, rules_col):
    """Specificity of the most specific rule matching ``path_col``
    (0 when none match) — pure array expression; wildcard rules use
    their precompiled regex, plain rules a prefix test."""
    matching = F.filter(
        rules_col,
        lambda r: F.when(
            r["rx"].isNull(), path_col.startswith(r["p"])
        ).otherwise(F.regexp_like(path_col, r["rx"])),
    )
    return F.coalesce(
        F.array_max(F.transform(matching, lambda r: r["ln"])), F.lit(0)
    )


def with_robots_decision(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Append ``robots_allowed`` (and ``crawl_delay``) via broadcast join.

    Hosts without a rules row are allowed (reference: missing robots.txt
    => allow-all). Longest matching rule wins; ties go to allow.
    """
    r = F.broadcast(rules.withColumnRenamed("host", "__r_host"))
    joined = frontier.join(
        r, frontier[host_col] == F.col("__r_host"), "left_outer"
    ).drop("__r_host")
    path = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")
    )
    empty_rules = F.array().cast("array<struct<p:string,rx:string,ln:int>>")
    dis = _best_match_len(path, F.coalesce(F.col("disallow"), empty_rules))
    alw = _best_match_len(path, F.coalesce(F.col("allow"), empty_rules))
    allowed = (dis == 0) | (alw >= dis)
    return (
        joined.withColumn("robots_allowed", allowed)
        .withColumn("robots_crawl_delay", F.col("crawl_delay"))
        .drop("disallow", "allow", "crawl_delay")
    )


def synthetic_robots(hosts: list[str]) -> dict[str, str]:
    """Deterministic robots.txt bodies for the synthetic corpus: every
    4th host disallows /de/, h0 sets a crawl-delay; hosts num%8==4
    carry wildcard rules with an allow override, hosts num%8==0 (num>0)
    an end-anchored wildcard — exercising the reference's patched
    wildcard semantics (utils.py:53-73) on hosts that actually receive
    traffic (page hosts are doc_id%32 of doc_id%4==0, i.e. ≡0 mod 4)."""
    bodies = {}
    for h in hosts:
        num = int(h[1:]) if h[1:].isdigit() else 0
        lines = ["User-agent: *"]
        if num % 4 == 1:
            lines.append("Disallow: /de/")
        if num % 8 == 4:
            lines.append("Disallow: /*/p1*.html")
            lines.append("Allow: /*/p13*.html")
        if num % 8 == 0 and num > 0:
            lines.append("Disallow: /de/p*2.html$")
        if num == 0:
            lines.append("Crawl-delay: 0.5")
        lines.append("Disallow: /private/")
        bodies[h + ".example.com"] = "\n".join(lines)
    return bodies
