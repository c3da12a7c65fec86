"""Charset sniffing + decoding for raw HTML bytes, as JVM Column
expressions.

Real crawl corpora are NOT all UTF-8: WARC response payloads
(sources/warc.py) arrive as raw bytes whose encoding must be sniffed
before any text-side operator can run. The reference gets decoding
for free from the browser / aiohttp layer (crawl4ai's fetchers hand it
str); this rebuild's byte-level sources need the standard sniff:

1. BOM (UTF-8 / UTF-16 LE / UTF-16 BE) — highest priority (WHATWG
   encoding standard §4.2 says a BOM wins over everything);
2. `<meta charset=...>` / `<meta http-equiv Content-Type ... charset=>`
   / XML declaration `encoding=` scanned in the first 1024 bytes (the
   WHATWG prescan window), matched case-insensitively;
3. fallback UTF-8 (the web's dominant default).

Everything is a Column expression: the 1024-byte prefix is decoded as
ISO-8859-1 (a total function byte→char, so the regex scan can never
throw) and the final decode is a when-chain over the JVM charsets a
crawler actually meets — zero shuffle, whole-stage codegen,
embarrassingly parallel at 100 TB.

Charset labels are normalized to lowercase canonical forms; unknown
labels fall back to UTF-8 rather than erroring (a bad label on one
page must not kill a task — same degradation contract as parse_dom).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# labels seen in the wild -> JVM charset names (decode targets),
# following the WHATWG rules rather than the labels' face value:
# - a meta/xml UTF-16 label is REWRITTEN to UTF-8 ("get an encoding
#   from meta" step 3: if the ASCII prescan could read the label, the
#   bytes cannot actually be UTF-16 — real UTF-16 is caught by BOM);
# - iso-8859-1 / latin-1 / ascii labels decode as windows-1252 (the
#   WHATWG alias table; Windows-authored pages labelled latin-1 use
#   0x80-0x9F curly quotes that latin-1 would turn into C1 controls).
_CANON = {
    "utf-8": "UTF-8",
    "utf8": "UTF-8",
    "utf-16le": "UTF-8",
    "utf-16be": "UTF-8",
    "utf-16": "UTF-8",
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
}

# explicit-charset spelling aliases (decode_html(charset=...)): face
# value, no WHATWG meta rewrites — the caller is describing the bytes
_EXPLICIT = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
    "utf-16": "utf-16le",
    "iso-8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "us-ascii": "us-ascii",
    "ascii": "us-ascii",
}

_META_RX = (
    r'(?i)<meta[^>]{0,200}charset\s*=\s*["\']?\s*([a-zA-Z0-9._-]+)'
)
_XML_RX = r'(?i)<\?xml[^>]{0,200}encoding\s*=\s*["\']([a-zA-Z0-9._-]+)'


def sniff_charset(data: Column | str) -> Column:
    """Lowercased canonical charset label for an HTML byte column."""
    c = F.col(data) if isinstance(data, str) else data
    head = F.decode(F.substring(c, 1, 1024), "ISO-8859-1")
    meta = F.lower(F.regexp_extract(head, _META_RX, 1))
    xml = F.lower(F.regexp_extract(head, _XML_RX, 1))
    label = F.when(meta != "", meta).when(xml != "", xml).otherwise("utf-8")
    # canonicalize + unknown->utf-8 via ONE map lookup: a sequential
    # when-chain here nests 11 CASEs deep and Catalyst re-inlines the
    # regex extraction at every level (exponential plan text — the
    # same re-inlining trap the PQ encode hit)
    canon_map = F.create_map(
        *[F.lit(x) for kv in _CANON.items() for x in (kv[0], kv[1].lower())]
    )
    canon_label = F.coalesce(F.element_at(canon_map, label), F.lit("utf-8"))
    bom3 = F.hex(F.substring(c, 1, 3))
    bom2 = F.hex(F.substring(c, 1, 2))
    return (
        F.when(bom3 == "EFBBBF", "utf-8")
        .when(bom2 == "FFFE", "utf-16le")
        .when(bom2 == "FEFF", "utf-16be")
        .otherwise(canon_label)
    )


def decode_html(data: Column | str, charset: Column | None = None) -> Column:
    """Decode HTML bytes to string using a sniffed (or given) charset.

    The BOM, when present, is stripped before decoding. The decode is
    a when-chain over the supported JVM charsets — `F.decode` needs a
    literal charset, so per-row charsets dispatch through the chain.
    A caller-supplied ``charset`` column is normalized (lowercase +
    spelling aliases) so "UTF-16LE" / "latin-1" / "cp1252" dispatch
    correctly instead of silently falling through to UTF-8 — but the
    WHATWG utf-16→utf-8 META rewrite is NOT applied here: it exists
    because a prescan-readable label can't be real UTF-16, whereas an
    explicit caller charset is a statement about the actual bytes.
    """
    c = F.col(data) if isinstance(data, str) else data
    if charset is not None:
        canon_map = F.create_map(
            *[F.lit(x) for kv in _EXPLICIT.items() for x in kv]
        )
        low = F.lower(charset)
        cs = F.coalesce(F.element_at(canon_map, low), low)
    else:
        cs = sniff_charset(c)
    bom3 = F.hex(F.substring(c, 1, 3))
    bom2 = F.hex(F.substring(c, 1, 2))
    # strip a BOM only when it belongs to the charset actually being
    # decoded: windows-1252/latin-1/ascii text legitimately starting
    # with 'ÿþ'/'þÿ' (FF FE / FE FF) or 'ï»¿' must keep those chars
    body = (
        F.when((bom3 == "EFBBBF") & (cs == "utf-8"),
               F.substring(c, 4, 2147483647))
        .when(bom2.isin("FFFE", "FEFF") & cs.isin("utf-16le", "utf-16be"),
              F.substring(c, 3, 2147483647))
        .otherwise(c)
    )
    out = F.decode(body, "UTF-8")
    for jvm in ("UTF-16LE", "UTF-16BE", "ISO-8859-1", "windows-1252",
                "US-ASCII"):
        out = F.when(cs == jvm.lower(), F.decode(body, jvm)).otherwise(out)
    return out
