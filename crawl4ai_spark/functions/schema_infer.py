"""Schema inference — the deterministic core of ``generate_schema``
(SURVEY.md §2.10).

Reference: ``JsonElementExtractionStrategy.generate_schema``
(/root/reference/crawl4ai/extraction_strategy.py:1089-1195) prompts an
LLM to find "a repetitive pattern in crawled HTML, such as a product in
a product list" and emit a JsonElementExtractionStrategy schema. The
LLM call is an external service; this module implements the structural
part from scratch — detect the dominant repeated sibling group, derive
a baseSelector, and mine the first item for text/attribute fields —
and exposes the same {baseSelector, fields} contract, so an LLM
provider can be slotted in through the llm_stub seam for pages the
heuristic can't crack.

The acceptance test is executable: an inferred schema must round-trip
through json_css_extract / json_xpath_extract and recover the items.
"""

from __future__ import annotations

import re

from .scrape import _Node, parse_dom

_NAME_RX = re.compile(r"[^a-z0-9]+")
# classes usable inside an inferred CSS selector: plain identifiers
# only — Tailwind-style names ('w-1/2', 'md:flex') contain CSS
# metacharacters the engine's own selector grammar rejects, so an
# inferred schema embedding them would fail its round-trip contract
_CSS_IDENT_RX = re.compile(r"^-?[A-Za-z_][A-Za-z0-9_-]*$")


def _selector_classes(node: _Node) -> list[str]:
    return [
        c
        for c in (node.attrs.get("class") or "").split()
        if _CSS_IDENT_RX.match(c)
    ]


def _sig(node: _Node) -> tuple:
    """Grouping signature of a candidate repeated item."""
    return (node.tag, node.attrs.get("class") or "")


def _leafish_fields(item: _Node) -> list[dict]:
    """Mine one item for extractable fields: text-bearing descendants
    and link/media attributes, keyed by class else tag, first-seen."""
    fields: list[dict] = []
    used: set[str] = set()

    def name_for(n: _Node) -> str:
        parts = (n.attrs.get("class") or "").split()
        base = parts[0] if parts else n.tag  # whitespace-only class
        name = _NAME_RX.sub("_", base.lower()).strip("_") or n.tag
        cand, k = name, 2
        while cand in used:
            cand, k = f"{name}_{k}", k + 1
        used.add(cand)
        return cand

    def sel_for(n: _Node) -> str:
        cls = _selector_classes(n)
        return n.tag + ("." + ".".join(cls) if cls else "")

    # iterative in-order walk (depth-proof, same visit order as the
    # recursive form: children left-to-right, descend on the else arm)
    stack = [iter(item.children)]
    while stack:
        c = next(stack[-1], None)
        if c is None:
            stack.pop()
            continue
        if c.tag == "":
            continue
        own_text = any(
            g.tag == "" and g.attrs.get("text", "").strip()
            for g in c.children
        )
        if c.tag == "a" and c.attrs.get("href") is not None:
            nm = name_for(c)
            fields.append(
                {"name": nm + "_href", "selector": sel_for(c),
                 "type": "attribute", "attribute": "href"}
            )
            if own_text:
                fields.append(
                    {"name": nm, "selector": sel_for(c), "type": "text"}
                )
        elif c.tag == "img" and c.attrs.get("src") is not None:
            fields.append(
                {"name": name_for(c) + "_src", "selector": sel_for(c),
                 "type": "attribute", "attribute": "src"}
            )
        elif own_text and not any(g.tag != "" for g in c.children):
            fields.append(
                {"name": name_for(c), "selector": sel_for(c), "type": "text"}
            )
        else:
            stack.append(iter(c.children))
    return fields


def _best_repeat_group(root: _Node) -> tuple[_Node | None, list[_Node]]:
    """(parent, items): the sibling group with the best
    count x field-richness score, count >= 2."""
    best: tuple[float, _Node | None, list[_Node]] = (0.0, None, [])

    # iterative (depth-proof — adversarial nesting must not
    # RecursionError the driver-side inference)
    stack = [root]
    while stack:
        parent = stack.pop()
        groups: dict[tuple, list[_Node]] = {}
        for c in parent.children:
            if c.tag not in ("", "script", "style"):
                groups.setdefault(_sig(c), []).append(c)
        for _sig_key, items in groups.items():
            if len(items) >= 2:
                richness = len(_leafish_fields(items[0]))
                score = len(items) * (1 + richness)
                if score > best[0]:
                    best = (score, parent, items)
        # push reversed so children pop left-to-right — score ties
        # break on FIRST-visited, so preorder must match the original
        for c in reversed(parent.children):
            if c.tag != "":
                stack.append(c)

    return best[1], best[2]


def _css_selector(node: _Node) -> str:
    cls = _selector_classes(node)
    return node.tag + ("." + ".".join(cls) if cls else "")


def _xpath_step(node: _Node) -> str:
    cls = node.attrs.get("class")
    if cls and "'" in cls:  # unescapable inside the '...' literal
        cls = None
    return node.tag + (f"[@class='{cls}']" if cls else "")


def infer_schema(html: str | bytes | None, schema_type: str = "CSS") -> dict | None:
    """Infer a {baseSelector, fields} schema from the dominant repeated
    structure, or None when no repetition is found (the LLM-seam case)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse_dom(html)
    parent, items = _best_repeat_group(root)
    if parent is None or not items:
        return None
    item = items[0]
    fields = _leafish_fields(item)
    if not fields:
        fields = [{"name": item.tag, "type": "text"}]
    if schema_type.upper() == "XPATH":
        base = "//" + _xpath_step(item)
        xfields = []
        for f in fields:
            xf = dict(f)
            if "selector" in xf:
                tag, _, cls = xf["selector"].partition(".")
                pred = f"[@class='{cls.replace('.', ' ')}']" if cls else ""
                xf["selector"] = f".//{tag}{pred}"
            xfields.append(xf)
        return {"baseSelector": base, "fields": xfields}
    return {"baseSelector": _css_selector(item), "fields": fields}


def generate_schema(html: str | bytes | None, schema_type: str = "CSS",
                    query: str | None = None, llm=None) -> dict | None:
    """Reference-shaped entry point: structural inference first, the
    pluggable LLM (same seam as llm_stub) only when inference fails."""
    schema = infer_schema(html, schema_type)
    if schema is not None:
        return schema
    if llm is not None:
        return llm(html=html, schema_type=schema_type, query=query)
    return None
