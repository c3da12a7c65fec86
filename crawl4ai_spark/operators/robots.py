"""robots.txt rules as a broadcast dimension table (SURVEY.md S12/J6).

Reference semantics: RobotsParser (utils.py:252-365) — per-domain
robots.txt fetched + cached with TTL, ``can_fetch(url, ua)`` consulted
before every fetch (async_webcrawler.py:317-331); disallowed URLs
short-circuit to a 403 result.

Spark reformulation: a ``robots_rules(host, disallow, allow,
crawl_delay)`` table (refreshed out-of-band per round at scale),
broadcast-joined to the frontier on ``host``; the allow/deny decision
is a native path-prefix test over the rule arrays — no Python per row.
Longest-match-wins between allow and disallow mirrors the standard
RobotFileParser resolution for the ``*`` agent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import host as host_of

RULES_SCHEMA = (
    "host string, disallow array<string>, allow array<string>, crawl_delay double"
)


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
    """Build the robots_rules dimension from {host: robots.txt text}."""
    rows = []
    for h, body in sorted(robots_bodies.items()):
        r = parse_robots_txt(body)
        rows.append((h, r["disallow"], r["allow"], r["crawl_delay"]))
    return spark.createDataFrame(rows, RULES_SCHEMA)


def _longest_prefix_match(path_col, rules_col):
    """Length of the longest rule in ``rules_col`` that path-prefixes
    ``path_col`` (0 when none match) — pure array expression."""
    matching = F.filter(rules_col, lambda r: path_col.startswith(r))
    return F.coalesce(
        F.array_max(F.transform(matching, lambda r: F.length(r))), F.lit(0)
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
    dis = _longest_prefix_match(path, F.coalesce(F.col("disallow"), F.array()))
    alw = _longest_prefix_match(path, F.coalesce(F.col("allow"), F.array()))
    allowed = (dis == 0) | (alw >= dis)
    return (
        joined.withColumn("robots_allowed", allowed)
        .withColumn("robots_crawl_delay", F.col("crawl_delay"))
        .drop("disallow", "allow", "crawl_delay")
    )


def synthetic_robots(hosts: list[str]) -> dict[str, str]:
    """Deterministic robots.txt bodies for the synthetic corpus: every
    4th host disallows /de/, h0 sets a crawl-delay."""
    bodies = {}
    for h in hosts:
        num = int(h[1:]) if h[1:].isdigit() else 0
        lines = ["User-agent: *"]
        if num % 4 == 1:
            lines.append("Disallow: /de/")
        if num == 0:
            lines.append("Crawl-delay: 0.5")
        lines.append("Disallow: /private/")
        bodies[h + ".example.com"] = "\n".join(lines)
    return bodies
