"""The scrape stage: per-page DOM processing inside one vectorized UDF.

Reproduces the semantics of the reference's scraping strategy
(/root/reference/crawl4ai/content_scraping_strategy.py — default lxml
path `LXMLWebScrapingStrategy._scrap` :1566-1864): strip
script/style/link/meta/noscript and comments, remove excluded tags,
harvest + normalize links (internal/external split by base domain,
first-seen dedup per page), harvest images (skip data: URIs), extract
head metadata (title + meta name/property tags), serialize cleaned
HTML, and emit collapsed visible text.

Implementation is a from-scratch stdlib ``html.parser`` DOM (the
container has no lxml/bs4); behavior is pinned by golden tests on the
engine's page corpus rather than by lxml serialization quirks.

Spark shape (SURVEY.md §2.8): one ``mapInPandas`` stage
``scrape(html, url) -> struct(...)`` — Arrow-batched, narrow, no
shuffle; downstream link explosion is a plain ``explode``.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

from .urls import get_base_domain_py

# removed wholesale, subtree and all (reference :1670-1674, :621-623)
STRIP_TAGS = {"script", "style", "link", "meta", "noscript", "template"}
# default excluded tags (reference config: nav/footer/header excluded in
# "text mode"; default excluded_tags is empty — keep configurable)
DEFAULT_EXCLUDED_TAGS: frozenset[str] = frozenset()

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_WS_RX = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag  # "" for text nodes (payload in attrs["text"])
        self.attrs = attrs or {}
        self.children: list[_Node] = []


class TolerantMarkupMixin:
    """Malformed-markup tolerance for HTMLParser subclasses.

    Mirrors the reference's recovering lxml parser
    (content_scraping_strategy.py:1055-1087): the stdlib
    ``_markupbase`` machinery raises a raw ``AssertionError`` on
    garbage marked sections such as ``'<![<'``; degrade those to a
    skipped span instead of letting the exception kill the Arrow
    batch. Shared by the DOM builder here and markdown.py's emitter.
    """

    def parse_marked_section(self, i, report=1):
        try:
            return super().parse_marked_section(i, report)
        except Exception:
            # malformed <![ ... — consume to the closing ]> (or to EOF)
            rawdata = self.rawdata
            j = rawdata.find("]>", i)
            return len(rawdata) if j < 0 else j + 2


class _DomBuilder(TolerantMarkupMixin, HTMLParser):
    """Minimal tolerant DOM builder (stdlib-only)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (tolerant of misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(_Node("", {"text": data}))


def parse_dom(html: str) -> _Node:
    """Parse markup into a tolerant DOM; never raises.

    On a catastrophic parser failure the returned root carries
    ``attrs["parse_error"]`` and holds only an error ``<div>``, mirroring
    the reference's ``crawl4ai_error_message`` fallback
    (content_scraping_strategy.py:1828-1864) — downstream extraction
    sees an empty-but-valid DOM instead of an exception.
    """
    b = _DomBuilder()
    try:
        b.feed(html or "")
        b.close()
        return b.root
    except Exception as exc:  # incl. AssertionError from _markupbase
        root = _Node("#root", {"parse_error": "1"})
        div = _Node("div", {"class": "crawl4ai-error"})
        div.children.append(
            _Node("", {"text": f"Parse error: {type(exc).__name__}"})
        )
        root.children.append(div)
        return root


# ---------------------------------------------------------------------------
# extraction passes
# ---------------------------------------------------------------------------


def _walk(node: _Node):
    # iterative preorder: recursive `yield from` makes every yielded
    # node climb the whole generator chain (O(depth) per node); an
    # explicit stack yields each node once. Same order as the
    # recursive form: node first, then children left-to-right.
    stack = [node]
    pop = stack.pop
    while stack:
        n = pop()
        yield n
        children = n.children
        if children:
            stack.extend(reversed(children))


def _visible_text(node: _Node, out: list[str]) -> None:
    if node.tag in STRIP_TAGS:
        return
    if node.tag == "":
        out.append(node.attrs.get("text", ""))
        return
    for c in node.children:
        _visible_text(c, out)


def extract_metadata(root: _Node) -> dict:
    """title + meta tags -> flat dict (reference utils.py:1562-1642)."""
    meta: dict[str, str] = {}
    title = None
    for n in _walk(root):
        if n.tag == "title" and title is None:
            parts: list[str] = []
            for c in n.children:
                if c.tag == "":
                    parts.append(c.attrs.get("text", ""))
            title = "".join(parts).strip()
        elif n.tag == "meta":
            key = n.attrs.get("name") or n.attrs.get("property")
            content = n.attrs.get("content")
            if key and content is not None and key not in meta:
                meta[key] = content
    if title is not None:
        meta["title"] = title
    return meta


def _abs_url(base: str, href: str) -> str:
    """urljoin with a validated fast path: an absolute lowercase-scheme
    href with a nonempty authority and no query/fragment round-trips
    urljoin unchanged (cross-scheme returns verbatim; same-scheme
    urlunparse∘urlparse is the identity on this shape — the '#'/'?'
    guard excludes the empty-fragment/query normalization cases, the
    authority guard excludes 'http://'). Equality is fuzz-pinned in
    tests/test_markdown_fastpath.py; urljoin was ~14% of the extract
    stage's profile."""
    if (
        href.startswith(("https://", "http://"))
        and "#" not in href
        and "?" not in href
        # urlsplit strips embedded tab/newline/CR (WHATWG, bpo-43882);
        # such hrefs must go through urljoin to get the same stripping
        and "\t" not in href
        and "\n" not in href
        and "\r" not in href
    ):
        rest = href[href.index("://") + 3:]
        if rest and rest[0] not in "/?#":
            return href
    return urljoin(base, href)


def extract_links(root: _Node, page_url: str) -> list[dict]:
    """Harvest <a href> with first-seen dedup per normalized href
    (reference content_scraping_strategy.py:1119-1172, 683-691)."""
    base_dom = get_base_domain_py(page_url)
    seen: set[str] = set()
    links: list[dict] = []
    for n in _walk(root):
        if n.tag != "a":
            continue
        href = n.attrs.get("href")
        if not href or href.startswith(("javascript:", "#")):
            continue
        abs_url = _abs_url(page_url, href.strip())
        if abs_url in seen:
            continue
        seen.add(abs_url)
        text_parts: list[str] = []
        _visible_text(n, text_parts)
        link_dom = get_base_domain_py(abs_url)
        links.append(
            {
                "href": abs_url,
                "text": _WS_RX.sub(" ", "".join(text_parts)).strip(),
                "title": n.attrs.get("title") or "",
                "base_domain": link_dom,
                "is_internal": bool(link_dom) and link_dom == base_dom,
            }
        )
    return links


def extract_images(root: _Node, page_url: str) -> list[dict]:
    """Harvest <img> (skip data: URIs — reference :1725-1728)."""
    seen: set[str] = set()
    images: list[dict] = []
    for n in _walk(root):
        if n.tag != "img":
            continue
        src = n.attrs.get("src")
        if not src or src.startswith("data:"):
            continue
        abs_src = _abs_url(page_url, src.strip())
        if abs_src in seen:
            continue
        seen.add(abs_src)
        images.append({"src": abs_src, "alt": n.attrs.get("alt") or ""})
    return images


def _serialize(node: _Node, out: list[str], excluded: frozenset[str]) -> None:
    if node.tag in STRIP_TAGS or node.tag in excluded:
        return
    if node.tag == "":
        out.append(node.attrs.get("text", ""))
        return
    if node.tag != "#root":
        attrs = "".join(
            f' {k}="{v}"' for k, v in node.attrs.items() if v is not None
        )
        out.append(f"<{node.tag}{attrs}>")
    for c in node.children:
        _serialize(c, out, excluded)
    if node.tag != "#root" and node.tag not in VOID_TAGS:
        out.append(f"</{node.tag}>")


def cleaned_html(root: _Node, excluded: frozenset[str] = DEFAULT_EXCLUDED_TAGS) -> str:
    out: list[str] = []
    _serialize(root, out, excluded)
    return "".join(out).strip()


def _md_events(node: _Node, out: list, excluded: frozenset[str]) -> bool:
    """Collect the exact handler-event stream that reparsing
    ``_serialize``'s output would produce, or return False when the
    page is not provably round-trip-safe:

    - text containing ``&`` or ``<`` re-tokenizes on reparse
      (entityref / tag-open), so its event split differs;
    - attribute values containing ``&`` (reparse unescapes them once
      more), ``<``, or ``"`` (breaks the quoting) likewise.

    Everything else maps 1:1: elements -> starttag [+ endtag unless
    void], text -> data (adjacent text nodes merged, as one string
    segment reparses to ONE data event)."""
    if node.tag in STRIP_TAGS or node.tag in excluded:
        return True
    if node.tag == "":
        t = node.attrs.get("text", "")
        if not t:
            return True
        if "&" in t or "<" in t:
            return False
        if out and out[-1][0] == "d":
            out[-1] = ("d", out[-1][1] + t)
        else:
            out.append(("d", t))
        return True
    attrs = []
    for k, v in node.attrs.items():
        if v is None:
            continue
        if "&" in v or "<" in v or '"' in v:
            return False
        attrs.append((k, v))
    if node.tag != "#root":
        out.append(("s", node.tag, attrs))
    for c in node.children:
        if not _md_events(c, out, excluded):
            return False
    if node.tag != "#root" and node.tag not in VOID_TAGS:
        out.append(("e", node.tag))
    return True


def markdown_from_dom(
    root: _Node,
    base_url: str = "",
    excluded: frozenset[str] = DEFAULT_EXCLUDED_TAGS,
) -> str | None:
    """raw_markdown straight off the cleaned DOM — the fast path of
    ``html_to_markdown(cleaned_html(root), url)``, which serializes the
    tree and RE-PARSES the string (two full HTMLParser passes per page;
    ~1/3 of the extract stage's CPU). Dispatches the identical event
    stream into the same ``_MdState`` emitter, so the output is
    byte-identical by construction on round-trip-safe pages; returns
    None (caller falls back to the string path) otherwise — pinned by
    a corpus-wide equality test in tests/test_markdown_fastpath.py."""
    events: list = []
    if not _md_events(root, events, excluded):
        return None
    # mirror cleaned_html()'s .strip(): it can only affect text at the
    # very start/end of the serialized string
    if events and events[0][0] == "d":
        t = events[0][1].lstrip()
        if t:
            events[0] = ("d", t)
        else:
            events.pop(0)
    if events and events[-1][0] == "d":
        t = events[-1][1].rstrip()
        if t:
            events[-1] = ("d", t)
        else:
            events.pop()
    from .markdown import _MdState, _finish

    p = _MdState(base_url=base_url)
    for ev in events:
        kind = ev[0]
        if kind == "s":
            p.handle_starttag(ev[1], ev[2])
        elif kind == "e":
            p.handle_endtag(ev[1])
        else:
            p.handle_data(ev[1])
    return _finish(p.result())


def page_text(root: _Node) -> str:
    out: list[str] = []
    _visible_text(root, out)
    return _WS_RX.sub(" ", "".join(out)).strip()


def scrape_one(
    html: str | bytes | None,
    url: str,
    excluded_tags: frozenset[str] = DEFAULT_EXCLUDED_TAGS,
    want_root: bool = False,
    want_cleaned: bool = True,
) -> dict:
    """Full scrape of one page -> plain-dict ScrapingResult.

    ``want_root`` adds the parsed DOM under ``"_root"`` (consumed by
    scrape_stage's DOM-direct markdown fast path); ``want_cleaned=False``
    skips the serialization entirely — only valid when the caller drops
    the cleaned_html column and regenerates it on demand."""
    failed = {
        "success": False,
        "title": None,
        "headings": None,
        "meta": {},
        "links": [],
        "images": [],
        "cleaned_html": None,
        "text": None,
    }
    if want_root:
        failed["_root"] = None
    if html is None:
        return failed
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse_dom(html)
    if root.attrs.get("parse_error"):
        # unrecoverable markup: error-fallback row (reference
        # content_scraping_strategy.py:1828-1864 returns success=False
        # with the crawl4ai_error_message div)
        return failed
    meta = extract_metadata(root)
    heads: list[str] = []
    for n in _walk(root):
        if n.tag in ("h1", "h2", "h3"):
            parts: list[str] = []
            _visible_text(n, parts)
            heads.append(_WS_RX.sub(" ", "".join(parts)).strip())
    out = {
        "success": True,
        "title": meta.get("title"),
        "headings": " ".join(h for h in heads if h),
        "meta": meta,
        "links": extract_links(root, url),
        "images": extract_images(root, url),
        "cleaned_html": (
            cleaned_html(root, excluded_tags) if want_cleaned else None
        ),
        "text": page_text(root),
    }
    if want_root:
        out["_root"] = root
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

SCRAPE_FIELDS_DDL = (
    "success boolean, title string, headings string, meta map<string,string>, "
    "links array<struct<href:string,text:string,title:string,"
    "base_domain:string,is_internal:boolean>>, "
    "images array<struct<src:string,alt:string>>, "
    "cleaned_html string, text string"
)


def scrape_stage(df, html_col: str = "html", url_col: str = "url",
                 markdown: bool = True, drop_cols: tuple = ()):
    """Append scrape (+ optional markdown) columns via one mapInPandas.

    Narrow transformation: preserves the input partitioning; one Python
    round-trip per Arrow batch. Input columns are carried through except
    those named in ``drop_cols`` — dropping the raw ``html`` (and
    ``cleaned_html`` when downstream doesn't persist it) roughly halves
    the Arrow traffic OUT of the Python workers, which is the scaling
    bottleneck of the stage at high parallelism.

    Output adds: success, title, headings, meta, links, images,
    cleaned_html, text_extracted (+ raw_markdown,
    markdown_with_citations, references_markdown when ``markdown=True``).
    """
    from .markdown import html_to_markdown, links_to_citations

    in_schema = df.schema
    scrape_ddl = SCRAPE_FIELDS_DDL.replace("text string", "text_extracted string")
    if "cleaned_html" in drop_cols:
        scrape_ddl = scrape_ddl.replace("cleaned_html string, ", "")
    out_ddl = ", ".join(
        [
            f.name + " " + f.dataType.simpleString()
            for f in in_schema.fields
            if f.name not in drop_cols
        ]
    ) + ", " + scrape_ddl
    if markdown:
        out_ddl += (
            ", raw_markdown string, markdown_with_citations string, "
            "references_markdown string"
        )

    # cleaned_html is serialized only if the caller keeps the column
    # (or a page falls off the DOM-direct markdown fast path below) —
    # at drop_cols=("html", "cleaned_html") the stage makes exactly ONE
    # HTMLParser pass per page instead of two plus a serialization
    skip_clean = markdown and "cleaned_html" in drop_cols

    def process(batches):
        import pandas as pd

        for pdf in batches:
            results = []
            for html, url in zip(pdf[html_col], pdf[url_col]):
                r = scrape_one(
                    html, url,
                    want_root=markdown, want_cleaned=not skip_clean,
                )
                root = r.pop("_root", None)
                if markdown:
                    if r["success"]:
                        raw = (
                            markdown_from_dom(root, url or "")
                            if root is not None else None
                        )
                        if raw is None:  # not provably round-trip-safe
                            ch = r["cleaned_html"]
                            if ch is None:
                                ch = cleaned_html(root)
                            raw = html_to_markdown(ch, url or "")
                        cit, refs = links_to_citations(raw, url or "")
                    else:
                        raw = cit = refs = None
                    r["raw_markdown"] = raw
                    r["markdown_with_citations"] = cit
                    r["references_markdown"] = refs
                results.append(r)
            res = pd.DataFrame(results)
            res = res.rename(columns={"text": "text_extracted"})
            carried = pdf.drop(columns=[c for c in drop_cols if c in pdf.columns])
            if "cleaned_html" in drop_cols and "cleaned_html" in res.columns:
                res = res.drop(columns=["cleaned_html"])
            out = pd.concat(
                [carried.reset_index(drop=True), res.reset_index(drop=True)],
                axis=1,
            )
            yield out

    return df.mapInPandas(process, schema=out_ddl)
