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

# the live-acquisition cache row: RULES_SCHEMA plus the robots.txt
# fetch outcome and the round it was taken in (the TTL clock — rounds,
# not wall time, so resume/rewind replay deterministically), plus the
# file's global Sitemap: lines for the seeder
ROBOTS_CACHE_SCHEMA = (
    RULES_SCHEMA + ", sitemaps array<string>, robots_status int, "
    "fetched_round int"
)


# the reserved chars urllib.parse.quote(safe="/%$") percent-encodes
# (restricted to those that can appear in a parsed path/query; '$' and
# '*' stay literal — they are the rule side's anchor/wildcard markers,
# so both sides keep them raw). Applied to the URL-side match target in
# with_robots_decision so it compares in _compile_rule's alphabet, the
# way robotparser quotes BOTH sides.
_QUOTE_CHAIN = [
    (" ", "%20"), ("!", "%21"), ('"', "%22"), ("'", "%27"), ("(", "%28"),
    (")", "%29"), ("+", "%2B"), (",", "%2C"), (":", "%3A"), (";", "%3B"),
    ("<", "%3C"), ("=", "%3D"), (">", "%3E"), ("?", "%3F"), ("@", "%40"),
    ("[", "%5B"), ("\\", "%5C"), ("]", "%5D"), ("^", "%5E"), ("`", "%60"),
    ("{", "%7B"), ("|", "%7C"), ("}", "%7D"), ("&", "%26"),
]


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


def _robots_groups(text: str) -> list[tuple[list[str], dict]]:
    """All user-agent groups of a robots.txt body, file order.

    Consecutive ``User-agent`` lines before any rule share one group
    (RFC 9309 §2.1); a ``User-agent`` line after rules starts a new
    group. Returns [(agent_tokens_lowercased, {disallow, allow,
    crawl_delay})].
    """
    groups: list[tuple[list[str], dict]] = []
    cur_tokens: list[str] = []
    cur: dict = {"disallow": [], "allow": [], "crawl_delay": None}

    def has_rules() -> bool:
        return bool(
            cur["disallow"] or cur["allow"] or cur["crawl_delay"] is not None
        )

    def close() -> None:
        nonlocal cur_tokens, cur
        if cur_tokens:
            groups.append((cur_tokens, cur))
        cur_tokens = []
        cur = {"disallow": [], "allow": [], "crawl_delay": None}

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if has_rules():
                close()
            cur_tokens.append(val.lower())
        elif key == "disallow" and cur_tokens:
            if val:
                cur["disallow"].append(val)
        elif key == "allow" and cur_tokens:
            if val:
                cur["allow"].append(val)
        elif key == "crawl-delay" and cur_tokens:
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass
    close()
    return groups


def _product_token(ua: str) -> str:
    """Crawler product token from a UA string: the part before the
    first '/', lowercased — the same reduction urllib's robotparser
    applies to can_fetch's useragent (and therefore the reference,
    utils.py:252-365)."""
    return (ua or "*").split("/")[0].strip().lower()


def parse_robots_txt(text: str, ua: str = "*") -> dict:
    """Parse one robots.txt body for the group governing crawler `ua`.

    Group selection (RFC 9309 §2.2.1): the most specific matching
    user-agent token wins — exact token match first, else the LONGEST
    token that is a substring of the product token (the
    urllib-compatibility tier: the reference's robotparser matches
    ``agent in useragent``), else the ``*`` groups. All groups carrying
    the winning token merge (RFC: rules of identical tokens combine).
    Divergence from the reference, documented: urllib picks the FIRST
    applicable group in file order, which lets ``*`` shadow a later
    specific group; RFC specificity never does.
    """
    groups = _robots_groups(text)
    token = _product_token(ua)
    exact = [g for t, g in groups if token in t]
    if exact:
        chosen = exact
    else:
        sub_lens = [
            max((len(t) for t in ts if t != "*" and t and t in token),
                default=0)
            for ts, _ in groups
        ]
        best = max(sub_lens, default=0)
        if best > 0:
            chosen = [g for (ts, g), ln in zip(groups, sub_lens) if ln == best]
        else:
            chosen = [g for t, g in groups if "*" in t]
    disallow: list[str] = []
    allow: list[str] = []
    crawl_delay = None
    for g in chosen:
        disallow.extend(g["disallow"])
        allow.extend(g["allow"])
        if g["crawl_delay"] is not None:
            crawl_delay = g["crawl_delay"]
    # Sitemap lines are group-independent (sitemaps.org protocol; RFC
    # 9309 §2.2.4 treats them as "other records" with global scope) —
    # collected from the whole file, mirroring urllib's site_maps() and
    # the reference seeder's robots fallback
    # (async_url_seeder.py:807-818: startswith("sitemap:") on any line)
    sitemaps = [
        line.split(":", 1)[1].strip()
        for line in text.splitlines()
        if line.lower().lstrip().startswith("sitemap:") and ":" in line
    ]
    return {
        "disallow": disallow,
        "allow": allow,
        "crawl_delay": crawl_delay,
        "sitemaps": sitemaps,
    }


def rules_table(
    spark: SparkSession, robots_bodies: dict[str, str], ua: str = "*"
) -> DataFrame:
    """Build the robots_rules dimension from {host: robots.txt text};
    rule paths are compiled driver-side (see :func:`_compile_rule`).
    `ua` selects the per-crawler user-agent group (RFC 9309) — the
    table is per-crawler, exactly like the reference's
    ``can_fetch(url, ua)`` consultations."""
    rows = []
    for h, body in sorted(robots_bodies.items()):
        r = parse_robots_txt(body, ua)
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
    # The reference (stdlib robotparser can_fetch) matches rules against
    # quote(path + '?' + query) or '/', NOT the bare path:
    #   - a root URL with empty path must normalize to '/' (try_parse_url
    #     returns '' there, not NULL, so a plain coalesce never fired and
    #     a Disallow-everything host's root page was fetched);
    #   - query-targeted rules ('Disallow: /foo?bar') must see the query.
    # The quote-normalization chain mirrors _compile_rule's
    # quote(safe="/%$") alphabet for the reserved chars that appear in
    # real URLs, so both sides compare in the same encoding ('%' is
    # never re-encoded on either side).
    q = F.nullif(
        F.try_parse_url(F.col(url_col), F.lit("QUERY")), F.lit("")
    )
    raw_target = F.concat(
        F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
        F.coalesce(F.concat(F.lit("?"), q), F.lit("")),
    )
    enc = raw_target
    for ch, pct in _QUOTE_CHAIN:
        enc = F.replace(enc, F.lit(ch), F.lit(pct))
    path = F.coalesce(F.nullif(enc, F.lit("")), F.lit("/"))
    empty_rules = F.array().cast("array<struct<p:string,rx:string,ln:int>>")
    dis = _best_match_len(path, F.coalesce(F.col("disallow"), empty_rules))
    alw = _best_match_len(path, F.coalesce(F.col("allow"), empty_rules))
    allowed = (dis == 0) | (alw >= dis)
    return (
        joined.withColumn("robots_allowed", allowed)
        .withColumn("robots_crawl_delay", F.col("crawl_delay"))
        .drop("disallow", "allow", "crawl_delay")
    )


def fetch_robots_rules(
    hosts: DataFrame,
    fetcher,
    ua: str = "*",
    scheme: str = "https",
    round_no: int = 0,
) -> DataFrame:
    """Fetch ``scheme://host/robots.txt`` for every row of ``hosts``
    through the pluggable fetch seam and parse the bodies into a
    :data:`ROBOTS_CACHE_SCHEMA` increment — the distributed analogue of
    the reference's RobotsParser fetch-on-cache-miss
    (utils.py:313-353: GET robots.txt, 200 → parse, any other status
    or error → allow).

    Non-200 / error hosts get an EMPTY rules row (allow-all) that is
    still cached — a documented divergence from the reference, which
    does not cache misses and so re-fetches a 404 host's robots.txt on
    every consultation; at frontier scale that is a per-round
    re-request storm, so here the miss ages out via the round TTL like
    any other row.

    One Arrow-batched pass: the fetcher's mapInPandas (or lookup join)
    feeds a parse mapInPandas; rules compile on executors, the driver
    never sees a body. The per-round host increment is frontier-bounded
    and typically tiny (new hosts only).

    When ``hosts`` carries a ``url`` column (an exemplar URL per
    host), the robots.txt request targets THAT url's scheme+authority
    — RFC 9309 scopes robots.txt per origin, port included, so a
    crawl of https://h:8443/ must consult https://h:8443/robots.txt,
    not the default-port origin. ``scheme`` + the bare host are the
    fallback when no exemplar is given (or it fails to parse). NB the
    engine still KEYS robots state by port-stripped host, like the
    reference keys its cache by netloc (utils.py:327).
    """
    import pandas as pd

    if "url" in hosts.columns:
        robots_url = F.concat(
            F.coalesce(
                F.try_parse_url(F.col("url"), F.lit("PROTOCOL")),
                F.lit(scheme),
            ),
            F.lit("://"),
            F.coalesce(
                F.try_parse_url(F.col("url"), F.lit("AUTHORITY")),
                F.col("host"),
            ),
            F.lit("/robots.txt"),
        )
    else:
        robots_url = F.concat(
            F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt")
        )
    req = hosts.select("host", robots_url.alias("url"))
    fetched = fetcher.fetch(req, url_col="url")
    rnd = int(round_no)

    def parse(batches):
        keys = ("p", "rx", "ln")
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "host", "disallow", "allow", "crawl_delay",
                    "sitemaps", "robots_status", "fetched_round",
                )
            }
            for h, body, status in zip(
                pdf["host"], pdf["html"], pdf["http_status"]
            ):
                dis: list = []
                alw: list = []
                cd = None
                sm: list = []
                st = None if status is None or status != status else int(status)
                if st == 200 and isinstance(body, str) and body:
                    r = parse_robots_txt(body, ua)
                    dis = [
                        dict(zip(keys, _compile_rule(x)))
                        for x in r["disallow"]
                    ]
                    alw = [
                        dict(zip(keys, _compile_rule(x)))
                        for x in r["allow"]
                    ]
                    cd = r["crawl_delay"]
                    sm = r["sitemaps"]
                out["host"].append(h)
                out["disallow"].append(dis)
                out["allow"].append(alw)
                out["crawl_delay"].append(cd)
                out["sitemaps"].append(sm)
                out["robots_status"].append(st)
                out["fetched_round"].append(rnd)
            yield pd.DataFrame(out)

    return fetched.mapInPandas(parse, ROBOTS_CACHE_SCHEMA)


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
