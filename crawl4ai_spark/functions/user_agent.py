"""User-agent generation + Sec-CH-UA client hints (SURVEY.md X14).

Reference: UserAgentGenerator
(/root/reference/crawl4ai/user_agent_generator.py:143-420): platform /
rendering-engine / browser-version tables composed as
``Mozilla/5.0 <platform> <engine> (KHTML, like Gecko) <browser stack>``
with random.choice picks, and ``generate_client_hints`` (:24-66)
deriving the Sec-CH-UA header from the UA string.

Spark reformulation: randomness becomes an explicit ``index`` Column
(callers derive it from url_hash / doc_id), so identical inputs always
produce identical UAs — the same determinism rule the politeness
jitter follows. The platform/version tables are the reference's
factual data; composition and client-hint logic are pure Column
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DESKTOP_PLATFORMS = [
    "(Windows NT 10.0; Win64; x64)",
    "(Windows NT 10.0; WOW64)",
    "(Macintosh; Intel Mac OS X 10_15_7)",
    "(Macintosh; Intel Mac OS X 10.15; rv:109.0)",
    "(X11; Linux x86_64)",
    "(X11; Ubuntu; Linux x86_64)",
    "(X11; CrOS x86_64 14541.0.0)",
]
MOBILE_PLATFORMS = [
    "(Linux; Android 13; SM-S901B)",
    "(Linux; Android 12; Pixel 6)",
    "(Linux; Android 13; OnePlus 9 Pro)",
    "(Linux; Android 12; M2102J20SG)",
    "(iPhone; CPU iPhone OS 16_5 like Mac OS X)",
    "(iPad; CPU OS 16_5 like Mac OS X)",
]
CHROME_VERSIONS = [
    "Chrome/119.0.6045.199", "Chrome/118.0.5993.117",
    "Chrome/117.0.5938.149", "Chrome/116.0.5845.187",
    "Chrome/115.0.5790.171",
]
EDGE_VERSIONS = [
    "Edg/119.0.2151.97", "Edg/118.0.2088.76", "Edg/117.0.2045.47",
    "Edg/116.0.1938.81", "Edg/115.0.1901.203",
]
SAFARI_VERSIONS = [
    "Safari/537.36", "Safari/605.1.15", "Safari/604.1", "Safari/602.1",
    "Safari/601.5.17",
]
FIREFOX_VERSIONS = [
    "Firefox/119.0", "Firefox/118.0.2", "Firefox/117.0.1", "Firefox/116.0",
    "Firefox/115.0.3", "Firefox/114.0.2", "Firefox/113.0.1", "Firefox/112.0",
    "Firefox/111.0.1", "Firefox/110.0",
]
CHROME_WEBKIT = "AppleWebKit/537.36"
GECKO = "Gecko/20100101"


def _pick(options: list[str], idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]),
        (F.pmod(idx, F.lit(len(options))) + 1).cast("int"),
    )


def user_agent(
    index: Column | str,
    *,
    device_type: str | None = None,
    browser_type: str | None = None,
) -> Column:
    """Deterministic UA string selected by ``index``.

    browser_type None -> rotate chrome/edge/firefox by index (the
    reference's num_browsers stacks reduce to these head browsers).
    """
    idx = F.col(index) if isinstance(index, str) else index
    if device_type == "desktop":
        platform = _pick(DESKTOP_PLATFORMS, idx)
    elif device_type == "mobile":
        platform = _pick(MOBILE_PLATFORMS, idx)
    else:
        platform = _pick(DESKTOP_PLATFORMS + MOBILE_PLATFORMS, idx)

    # real Chrome UAs always end in the constant 'Safari/537.36' token
    # (SAFARI_VERSIONS[0]); the remaining SAFARI_VERSIONS entries are
    # the 'Version/N ... Safari/X' pairs a real-Safari generator would
    # rotate — kept as data for that (currently ungenerated) stack,
    # which is also why client_hints' 'Version/' branch never fires on
    # this module's own output
    chrome = F.concat_ws(
        " ", F.lit(CHROME_WEBKIT), F.lit("(KHTML, like Gecko)"),
        _pick(CHROME_VERSIONS, idx), _pick(SAFARI_VERSIONS[:1], idx),
    )
    edge = F.concat_ws(
        " ", F.lit(CHROME_WEBKIT), F.lit("(KHTML, like Gecko)"),
        _pick(CHROME_VERSIONS, idx), F.lit("Safari/537.36"),
        _pick(EDGE_VERSIONS, idx),
    )
    firefox = F.concat_ws(" ", F.lit(GECKO), _pick(FIREFOX_VERSIONS, idx))

    if browser_type == "chrome":
        stack = chrome
    elif browser_type == "edge":
        stack = edge
    elif browser_type == "firefox":
        stack = firefox
    else:
        rot = F.pmod(idx, F.lit(3))
        stack = (
            F.when(rot == 0, chrome).when(rot == 1, edge).otherwise(firefox)
        )
    return F.concat_ws(" ", F.lit("Mozilla/5.0"), platform, stack)


def client_hints(ua: Column | str) -> Column:
    """Sec-CH-UA header from a UA string — the reference's
    generate_client_hints branch logic (:24-66) as one expression."""
    c = F.col(ua) if isinstance(ua, str) else ua
    chrome_v = F.regexp_extract(c, r"Chrome/(\d+)", 1)
    edge_v = F.regexp_extract(c, r"Edg/(\d+)", 1)
    firefox_v = F.regexp_extract(c, r"Firefox/(\d+)", 1)
    safari_v = F.regexp_extract(c, r"Version/(\d+)", 1)

    chrome_hint = F.concat(
        F.lit('"Chromium";v="'), chrome_v, F.lit('", "Not_A Brand";v="8", '),
        F.when(
            edge_v != "",
            F.concat(F.lit('"Microsoft Edge";v="'), edge_v, F.lit('"')),
        ).otherwise(
            F.concat(F.lit('"Google Chrome";v="'), chrome_v, F.lit('"'))
        ),
    )
    safari_hint = F.concat(
        F.lit('"Safari";v="'), safari_v, F.lit('", "Not_A Brand";v="8"')
    )
    return (
        F.when(chrome_v != "", chrome_hint)
        .when(firefox_v != "", F.lit('""'))
        .when(safari_v != "", safari_hint)
        # no recognized browser: the reference joins an EMPTY hints
        # list -> "" (only firefox gets the literal '""')
        .otherwise(F.lit(""))
    )
