"""JSON-CSS schema extraction (SURVEY.md X8).

Reference: JsonCssExtractionStrategy + JsonElementExtractionStrategy
(/root/reference/crawl4ai/extraction_strategy.py:804-1081, 1197-1243):
a user schema {baseSelector, baseFields, fields[...]} drives per-page
structured extraction; field types text / attribute / html / regex /
nested / list / nested_list / computed, transforms lowercase /
uppercase / strip; missing selector -> default.

From-scratch CSS selector engine (subset) over the stdlib DOM:
comma-separated groups; within a group, simple selectors combined by
descendant (whitespace) or child ('>') combinators; each simple
selector is [tag|*][.class]*[#id][[attr=value]]. This covers the
selector shapes in the reference's schema examples; unsupported syntax
raises ValueError at schema-compile time, not per row.

Spark surface: ``schema_extract_stage`` — mapInPandas emitting a JSON
string column (the reference also emits JSON —
async_webcrawler.py:619-621); downstream structure via ``from_json``.
"""

from __future__ import annotations

import json
import re

from .scrape import _Node, parse_dom

_SIMPLE_RX = re.compile(
    r"^(?P<tag>\*|[a-zA-Z][\w-]*)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<id>#[\w-]+)?"
    r"(?P<attr>\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\])?$"
)


class SimpleSelector:
    __slots__ = ("tag", "classes", "id", "attr_key", "attr_val")

    def __init__(self, token: str):
        m = _SIMPLE_RX.match(token)
        if not m or not token:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.classes = [c for c in (m.group("classes") or "").split(".") if c]
        self.id = m.group("id")[1:] if m.group("id") else None
        self.attr_key = self.attr_val = None
        if m.group("attr"):
            inner = m.group("attr")[1:-1]
            if "=" in inner:
                k, _, v = inner.partition("=")
                self.attr_key, self.attr_val = k, v.strip("\"'")
            else:
                self.attr_key = inner

    def matches(self, node: _Node) -> bool:
        if node.tag in ("", "#root"):
            return False
        if self.tag and node.tag != self.tag:
            return False
        if self.id and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            node_classes = (node.attrs.get("class") or "").split()
            if any(c not in node_classes for c in self.classes):
                return False
        if self.attr_key is not None:
            if self.attr_key not in node.attrs:
                return False
            if self.attr_val is not None and node.attrs[self.attr_key] != self.attr_val:
                return False
        return True


def compile_selector(selector: str) -> list[list[tuple[str, SimpleSelector]]]:
    """-> groups of [(combinator, simple)] with combinator in
    {'descendant', 'child'}; first entry's combinator is 'descendant'."""
    groups = []
    for group in selector.split(","):
        tokens = group.replace(">", " > ").split()
        seq: list[tuple[str, SimpleSelector]] = []
        comb = "descendant"
        for tok in tokens:
            if tok == ">":
                comb = "child"
                continue
            seq.append((comb, SimpleSelector(tok)))
            comb = "descendant"
        if not seq:
            raise ValueError(f"empty selector group in {selector!r}")
        groups.append(seq)
    return groups


def _descendants(node: _Node):
    for c in node.children:
        if c.tag != "":
            yield c
            yield from _descendants(c)


def select_all(root: _Node, selector: str) -> list[_Node]:
    """All descendant nodes of `root` matching the selector, in
    document order, de-duplicated across groups."""
    groups = compile_selector(selector)
    matched: list[_Node] = []
    seen: set[int] = set()

    def match_seq(node: _Node, seq) -> bool:
        comb, simple = seq[-1]
        if not simple.matches(node):
            return False
        if len(seq) == 1:
            return True
        rest = seq[:-1]
        if comb == "child":
            parent = _parents.get(id(node))
            return parent is not None and match_seq(parent, rest)
        anc = _parents.get(id(node))
        while anc is not None:
            if match_seq(anc, rest):
                return True
            anc = _parents.get(id(anc))
        return False

    _parents: dict[int, _Node | None] = {}

    def index_parents(n: _Node, parent: _Node | None):
        _parents[id(n)] = parent
        for c in n.children:
            if c.tag != "":
                index_parents(c, n if n.tag not in ("#root",) else None)

    index_parents(root, None)

    for node in _descendants(root):
        for seq in groups:
            if match_seq(node, seq):
                if id(node) not in seen:
                    seen.add(id(node))
                    matched.append(node)
                break
    return matched


# ---------------------------------------------------------------------------
# schema-driven extraction
# ---------------------------------------------------------------------------


def _text_strip(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node):
        if n.tag == "":
            s = n.attrs.get("text", "").strip()
            if s:
                parts.append(s)
            return
        for c in n.children:
            walk(c)

    walk(node)
    return "".join(parts)


def _outer_html(node: _Node) -> str:
    from .content_filter import _serialize

    return _serialize(node)


def _apply_transform(value, transform: str):
    if value is None:
        return None
    if transform == "lowercase":
        return value.lower()
    if transform == "uppercase":
        return value.upper()
    if transform == "strip":
        return value.strip()
    return value


def _extract_single(element: _Node, field: dict):
    if "selector" in field:
        selected = select_all(element, field["selector"])
        if not selected:
            return field.get("default")
        selected = selected[0]
    else:
        selected = element
    ftype = field["type"]
    value = None
    if ftype == "text":
        value = _text_strip(selected)
    elif ftype == "attribute":
        value = selected.attrs.get(field["attribute"])
    elif ftype == "html":
        value = _outer_html(selected)
    elif ftype == "regex":
        m = re.search(field["pattern"], _text_strip(selected))
        value = m.group(1) if m else None
    if "transform" in field:
        value = _apply_transform(value, field["transform"])
    return value if value is not None else field.get("default")


def _compute(item: dict, field: dict):
    # reference evals the expression over the item namespace
    # (extraction_strategy.py:1036-1044); restricted to no builtins
    try:
        if "expression" in field:
            return eval(field["expression"], {"__builtins__": {}}, dict(item))
    except Exception:
        return field.get("default")
    return field.get("default")


def _extract_item(element: _Node | None, fields: list[dict]) -> dict:
    item: dict = {}
    if element is None:
        return item
    for field in fields:
        if field["type"] == "computed":
            value = _compute(item, field)
        else:
            value = _extract_field(element, field)
        if value is not None:
            item[field["name"]] = value
    return item


def _extract_field(element: _Node, field: dict):
    try:
        if field["type"] == "nested":
            nested = select_all(element, field["selector"])
            return _extract_item(nested[0] if nested else None, field["fields"])
        if field["type"] in ("list", "nested_list"):
            els = select_all(element, field["selector"])
            return [_extract_item(el, field["fields"]) for el in els]
        return _extract_single(element, field)
    except Exception:
        return field.get("default")


def json_css_extract(html: str | bytes | None, schema: dict) -> list[dict]:
    """Run a {baseSelector, baseFields?, fields} schema over one page."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse_dom(html)
    out = []
    for base in select_all(root, schema["baseSelector"]):
        item = _extract_item(base, schema.get("fields", []))
        for bf in schema.get("baseFields", []):
            value = _extract_single(base, bf)
            if value is not None:
                item[bf["name"]] = value
        if item:
            out.append(item)
    return out


def schema_extract_stage(df, html_col: str, schema: dict,
                         out_col: str = "extracted_content"):
    """Append a JSON-string column of per-page schema extractions —
    one Arrow-batched mapInPandas, schema compiled once per executor."""
    in_schema = df.schema
    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in in_schema.fields
    ) + f", {out_col} string"

    def process(batches):
        import pandas as pd

        for pdf in batches:
            vals = [
                json.dumps(json_css_extract(h, schema), ensure_ascii=False)
                for h in pdf[html_col]
            ]
            out = pdf.copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(process, schema=out_ddl)
