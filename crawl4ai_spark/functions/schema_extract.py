"""JSON-CSS / JSON-XPath schema extraction (SURVEY.md X8).

Reference: JsonCssExtractionStrategy + JsonElementExtractionStrategy
(/root/reference/crawl4ai/extraction_strategy.py:804-1081, 1197-1243)
and JsonXPathExtractionStrategy (:1612-1674): a user schema
{baseSelector, baseFields, fields[...]} drives per-page structured
extraction; field types text / attribute / html / regex / nested /
list / nested_list / computed, transforms lowercase / uppercase /
strip; missing selector -> default.

From-scratch CSS selector engine (subset) over the stdlib DOM:
comma-separated groups; within a group, simple selectors combined by
descendant (whitespace) or child ('>') combinators; each simple
selector is [tag|*][.class]*[#id][[attr=value]]. This covers the
selector shapes in the reference's schema examples; unsupported syntax
raises ValueError at schema-compile time, not per row.

From-scratch XPath engine (subset): absolute or '.'-relative paths of
``/`` (child) and ``//`` (descendant) steps over ``tag | *``;
predicates ``[@attr]``, ``[@attr='v']`` and positional ``[n]``
(per-parent group, lxml semantics); terminal ``text()`` and ``@attr``
steps. The XPath strategy mirrors the reference's dispatch: selectors
containing '/' run as XPath, others fall back through the CSS engine
(extraction_strategy.py:1646-1663 _css_to_xpath).

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
# XPath engine (subset)
# ---------------------------------------------------------------------------

_XP_STEP_RX = re.compile(
    r"(//|/)"                                   # axis
    r"(\*|text\(\)|@[\w-]+|[a-zA-Z][\w-]*)"     # node test
    r"((?:\[[^\]]*\])*)"                        # predicates
)
_XP_PRED_RX = re.compile(
    r"\[(?:"
    r"(?P<pos>\d+)"
    r"|@(?P<attr>[\w-]+)(?:=(?P<q>[\"'])(?P<val>.*?)(?P=q))?"
    r")\]"
)


def _xp_parse(expr: str) -> list[tuple[str, str, list]]:
    e = expr.strip()
    if e.startswith("."):
        e = e[1:]
    if not e.startswith("/"):
        raise ValueError(f"unsupported xpath (must start with / or //): {expr!r}")
    steps, pos = [], 0
    while pos < len(e):
        m = _XP_STEP_RX.match(e, pos)
        if not m:
            raise ValueError(f"unsupported xpath syntax at {e[pos:]!r} in {expr!r}")
        axis, name, raw_preds = m.group(1), m.group(2), m.group(3)
        preds = []
        ppos = 0
        while ppos < len(raw_preds):
            pm = _XP_PRED_RX.match(raw_preds, ppos)
            if not pm:
                raise ValueError(f"unsupported predicate {raw_preds!r} in {expr!r}")
            if pm.group("pos"):
                preds.append(("pos", int(pm.group("pos"))))
            elif pm.group("val") is not None:
                preds.append(("attr_eq", pm.group("attr"), pm.group("val")))
            else:
                preds.append(("attr", pm.group("attr")))
            ppos = pm.end()
        steps.append((axis, name, preds))
        pos = m.end()
    return steps


def _xp_name_match(node: _Node, name: str) -> bool:
    return node.tag not in ("", "#root") and (name == "*" or node.tag == name)


def _xp_text_nodes(node: _Node, deep: bool):
    for c in node.children:
        if c.tag == "":
            yield c.attrs.get("text", "")
        elif deep:
            yield from _xp_text_nodes(c, True)


def _xp_apply_preds(group: list[_Node], preds: list) -> list[_Node]:
    out = group
    for p in preds:
        if p[0] == "pos":
            out = [out[p[1] - 1]] if len(out) >= p[1] else []
        elif p[0] == "attr_eq":
            out = [n for n in out if n.attrs.get(p[1]) == p[2]]
        else:
            out = [n for n in out if p[1] in n.attrs]
    return out


def xpath_select(root: _Node, expr: str):
    """Evaluate an XPath-subset expression.

    Returns a list of _Node, or a list of str when the final step is
    ``text()`` or ``@attr``. Positional predicates index within the
    per-parent sibling group (lxml/XPath semantics: ``//div/p[1]`` is
    the first p under EACH div).
    """
    steps = _xp_parse(expr)
    ctx: list[_Node] = [root]
    for i, (axis, name, preds) in enumerate(steps):
        last = i == len(steps) - 1
        if name == "text()":
            if not last or preds:
                raise ValueError(f"text() must be the final step: {expr!r}")
            out: list[str] = []
            for node in ctx:
                out.extend(_xp_text_nodes(node, deep=axis == "//"))
            return out
        if name.startswith("@"):
            if not last or preds:
                raise ValueError(f"@attr must be the final step: {expr!r}")
            attr = name[1:]
            vals = []
            for node in ctx:
                # '/@attr' reads the context element's own attribute;
                # '//@attr' is descendant-or-self (includes the context)
                pool = (
                    [node, *_descendants(node)] if axis == "//" else [node]
                )
                for n in pool:
                    if attr in n.attrs and n.attrs[attr] is not None:
                        vals.append(n.attrs[attr])
            return vals
        new_ctx: list[_Node] = []
        seen: set[int] = set()
        for node in ctx:
            if axis == "/":
                groups = [[c for c in node.children if _xp_name_match(c, name)]]
            else:
                # descendant axis: positional predicates index within
                # each parent's sibling group, so group by parent
                by_parent: dict[int, list[_Node]] = {}
                order: list[int] = []

                def walk(n: _Node):
                    for c in n.children:
                        if c.tag == "":
                            continue
                        if _xp_name_match(c, name):
                            key = id(n)
                            if key not in by_parent:
                                by_parent[key] = []
                                order.append(key)
                            by_parent[key].append(c)
                        walk(c)

                walk(node)
                # '//x' expands to descendant-or-self::node()/child::x —
                # the context node itself is never its own child
                groups = [by_parent[k] for k in order]
            for group in groups:
                for n in _xp_apply_preds(group, preds):
                    if id(n) not in seen:
                        seen.add(id(n))
                        new_ctx.append(n)
        ctx = new_ctx
    return ctx


def _xpath_text(node: _Node) -> str:
    """Reference XPath text semantics: ''.join(.//text()).strip()
    (extraction_strategy.py:1668-1669) — raw text nodes, outer strip."""
    return "".join(_xp_text_nodes(node, deep=True)).strip()


def xpath_select_elements(root: _Node, selector: str) -> list[_Node]:
    """Selector dispatch mirroring the reference: '/'-containing
    selectors run as XPath; plain CSS falls back to the CSS engine
    (the reference converts CSS to XPath; same result set here)."""
    if "/" in selector:
        out = xpath_select(root, selector)
        if out and not isinstance(out[0], _Node):
            raise ValueError(
                f"selector yields text/attributes, not elements: {selector!r}"
            )
        return out  # type: ignore[return-value]
    return select_all(root, selector)


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


# engine -> (element selector, element text) dispatch. XPath text is
# the reference's ''.join(.//text()).strip() (:1668); CSS text is the
# bs4-style per-node strip+join.
_ENGINES = {
    "css": (lambda root, sel: select_all(root, sel), lambda n: _text_strip(n)),
    "xpath": (
        lambda root, sel: xpath_select_elements(root, sel),
        lambda n: _xpath_text(n),
    ),
}


def _extract_single(element: _Node, field: dict, engine: str = "css"):
    sel_fn, text_fn = _ENGINES[engine]
    if "selector" in field:
        selected = sel_fn(element, field["selector"])
        if not selected:
            return field.get("default")
        selected = selected[0]
    else:
        selected = element
    ftype = field["type"]
    value = None
    if ftype == "text":
        value = text_fn(selected)
    elif ftype == "attribute":
        value = selected.attrs.get(field["attribute"])
    elif ftype == "html":
        value = _outer_html(selected)
    elif ftype == "regex":
        m = re.search(field["pattern"], text_fn(selected))
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


def _extract_item(element: _Node | None, fields: list[dict],
                  engine: str = "css") -> dict:
    item: dict = {}
    if element is None:
        return item
    for field in fields:
        if field["type"] == "computed":
            value = _compute(item, field)
        else:
            value = _extract_field(element, field, engine)
        if value is not None:
            item[field["name"]] = value
    return item


def _extract_field(element: _Node, field: dict, engine: str = "css"):
    sel_fn = _ENGINES[engine][0]
    try:
        if field["type"] == "nested":
            nested = sel_fn(element, field["selector"])
            return _extract_item(
                nested[0] if nested else None, field["fields"], engine
            )
        if field["type"] in ("list", "nested_list"):
            els = sel_fn(element, field["selector"])
            return [_extract_item(el, field["fields"], engine) for el in els]
        return _extract_single(element, field, engine)
    except Exception:
        return field.get("default")


def validate_schema(schema: dict, selector_type: str = "css") -> None:
    """Eagerly compile every selector in a {baseSelector, fields} schema.

    The reference accepts arbitrary lxml XPath
    (extraction_strategy.py:1612-1674); this engine covers the practical
    subset, so users porting schemas with unsupported axes/functions
    (``ancestor::``, ``contains()``, unions, …) must get an immediate
    ValueError — NOT silent empty output. Without this, the per-field
    runtime try/except (which mirrors the reference's per-field error
    fallback) would swallow the syntax error on every row.

    Called driver-side by :func:`schema_extract_stage` (fail fast before
    any executor work) and once per page by the scalar entry points.
    """
    def check(sel: str) -> None:
        if selector_type == "xpath" and "/" in sel:
            _xp_parse(sel)
        else:
            compile_selector(sel)

    def walk_fields(fields: list[dict]) -> None:
        for f in fields:
            sel = f.get("selector")
            if sel:
                check(sel)
            if f.get("fields"):
                walk_fields(f["fields"])

    check(schema["baseSelector"])
    walk_fields(schema.get("fields", []))
    walk_fields(schema.get("baseFields", []))


def _json_schema_extract(html: str | bytes | None, schema: dict,
                         engine: str) -> list[dict]:
    validate_schema(schema, engine)
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse_dom(html)
    sel_fn = _ENGINES[engine][0]
    out = []
    for base in sel_fn(root, schema["baseSelector"]):
        item = _extract_item(base, schema.get("fields", []), engine)
        for bf in schema.get("baseFields", []):
            value = _extract_single(base, bf, engine)
            if value is not None:
                item[bf["name"]] = value
        if item:
            out.append(item)
    return out


def json_css_extract(html: str | bytes | None, schema: dict) -> list[dict]:
    """Run a {baseSelector, baseFields?, fields} schema over one page."""
    return _json_schema_extract(html, schema, "css")


def json_xpath_extract(html: str | bytes | None, schema: dict) -> list[dict]:
    """JsonXPathExtractionStrategy parity: XPath selectors (CSS ones
    fall back through the CSS engine, mirroring _css_to_xpath)."""
    return _json_schema_extract(html, schema, "xpath")


def schema_extract_stage(df, html_col: str, schema: dict,
                         out_col: str = "extracted_content",
                         selector_type: str = "css"):
    """Append a JSON-string column of per-page schema extractions —
    one Arrow-batched mapInPandas, schema compiled once per executor.
    ``selector_type``: 'css' or 'xpath'."""
    if selector_type not in _ENGINES:
        raise ValueError(f"unknown selector_type {selector_type!r}")
    validate_schema(schema, selector_type)  # fail fast, on the driver
    in_schema = df.schema
    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in in_schema.fields
    ) + f", {out_col} string"

    def process(batches):
        import pandas as pd

        for pdf in batches:
            vals = [
                json.dumps(
                    _json_schema_extract(h, schema, selector_type),
                    ensure_ascii=False,
                )
                for h in pdf[html_col]
            ]
            out = pdf.copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(process, schema=out_ddl)
