"""XPath-subset engine + JsonXPathExtractionStrategy parity
(reference extraction_strategy.py:1612-1674)."""

from __future__ import annotations

import pytest

from crawl4ai_spark.functions.schema_extract import (
    json_xpath_extract,
    xpath_select,
    xpath_select_elements,
)
from crawl4ai_spark.functions.scrape import parse_dom

HTML = """
<html><body>
<div class="a" id="top"><p>one</p><p>two</p><a href="/x" title="t0">X</a></div>
<div class="a b"><p>three</p><span>s1</span></div>
<div class="c"><p>four</p><ul><li>i1</li><li>i2</li><li>i3</li></ul></div>
<section><div class="a"><p>five</p></div></section>
</body></html>
"""


@pytest.fixture(scope="module")
def root():
    return parse_dom(HTML)


def _texts(nodes):
    from crawl4ai_spark.functions.schema_extract import _xpath_text

    return [_xpath_text(n) for n in nodes]


def test_descendant_axis(root):
    assert _texts(xpath_select(root, "//p")) == [
        "one", "two", "three", "four", "five",
    ]


def test_child_axis_chain(root):
    assert _texts(xpath_select(root, "//body/div/p")) == [
        "one", "two", "three", "four",
    ]


def test_positional_per_parent(root):
    # //div/p[1]: the FIRST p of each div (lxml semantics)
    assert _texts(xpath_select(root, "//div/p[1]")) == [
        "one", "three", "four", "five",
    ]
    assert _texts(xpath_select(root, "//li[2]")) == ["i2"]


def test_attribute_predicates(root):
    assert _texts(xpath_select(root, "//div[@id='top']/p")) == ["one", "two"]
    assert _texts(xpath_select(root, "//div[@class='a']/p")) == [
        "one", "two", "five",
    ]  # exact attr compare, not class-token compare (lxml parity)
    assert _texts(xpath_select(root, "//a[@title]")) == ["X"]


def test_wildcard(root):
    tags = [n.tag for n in xpath_select(root, "//ul/*")]
    assert tags == ["li", "li", "li"]


def test_text_and_attr_terminals(root):
    assert xpath_select(root, "//a/@href") == ["/x"]
    assert xpath_select(root, "//li/text()") == ["i1", "i2", "i3"]
    assert xpath_select(root, "//div[@id='top']//text()") == [
        "one", "two", "X",
    ]


def test_relative_prefix(root):
    div = xpath_select(root, "//div[@id='top']")[0]
    assert _texts(xpath_select(div, ".//p")) == ["one", "two"]
    # .//x must not match the context node itself
    assert xpath_select(div, ".//div") == []


def test_unsupported_syntax_raises():
    root = parse_dom("<p>x</p>")
    for bad in ["p", "//p[substring(., 1, 2)='x']", "//p/following::a",
                "//p[position() mod 2 = 0]", "//p[name()='p']",
                "id('x')//p"]:
        with pytest.raises(ValueError):
            xpath_select(root, bad)


def test_css_fallback_dispatch(root):
    # no '/' in selector -> CSS engine (reference _css_to_xpath path)
    assert _texts(xpath_select_elements(root, "div.c p")) == ["four"]


def test_json_xpath_extract_schema():
    schema = {
        "baseSelector": "//body/div",
        "fields": [
            {"name": "first_p", "selector": ".//p[1]", "type": "text"},
            {"name": "href", "selector": ".//a", "type": "attribute",
             "attribute": "href", "default": "none"},
            {"name": "items", "selector": ".//li", "type": "list",
             "fields": [{"name": "t", "type": "text"}]},
        ],
    }
    out = json_xpath_extract(HTML, schema)
    assert [o["first_p"] for o in out] == ["one", "three", "four"]
    assert [o["href"] for o in out] == ["/x", "none", "none"]
    assert out[2]["items"] == [{"t": "i1"}, {"t": "i2"}, {"t": "i3"}]


def test_xpath_text_is_joined_raw_then_stripped():
    # reference: "".join(element.xpath(".//text()")).strip()
    html = "<div> a <b>b</b> c </div>"
    root = parse_dom(html)
    node = xpath_select(root, "//div")[0]
    from crawl4ai_spark.functions.schema_extract import _xpath_text

    assert _xpath_text(node) == "a b c"


def test_unsupported_xpath_raises_not_empty():
    """Users porting lxml XPath schemas with unsupported axes/functions
    must get an explicit error, never silent empty extraction."""
    import pytest

    from crawl4ai_spark.functions.schema_extract import (
        json_xpath_extract,
        validate_schema,
    )

    html = "<div><a href='x.html'>link</a></div>"
    for bad in ["//div/following::b", "//a[substring(@href, 1, 1)='x']",
                "//a[number(@href)=1]", "//a[local-name()='a']"]:
        schema = {"baseSelector": "//div",
                  "fields": [{"name": "v", "selector": bad, "type": "text"}]}
        with pytest.raises(ValueError):
            validate_schema(schema, "xpath")
        with pytest.raises(ValueError):
            json_xpath_extract(html, schema)
    # and an unsupported baseSelector fails too
    with pytest.raises(ValueError):
        json_xpath_extract(html, {"baseSelector": "//div/preceding::b",
                                  "fields": []})


def test_validate_schema_walks_nested_fields():
    import pytest

    from crawl4ai_spark.functions.schema_extract import validate_schema

    schema = {
        "baseSelector": "//div",
        "fields": [{
            "name": "inner", "selector": "//ul", "type": "nested",
            "fields": [{"name": "bad", "selector": "//li[lang('en')]",
                        "type": "text"}],
        }],
    }
    with pytest.raises(ValueError):
        validate_schema(schema, "xpath")


HTML_GRAMMAR = """
<body><div id='main'>
  <ul><li><a href='/a1.html' title='t1'>A1</a></li>
      <li><a href='https://x.com/a2.pdf'>A2</a></li>
      <li class='last'><a href='/a3.html'>A3</a></li></ul>
  <p>first</p><p>middle key</p><p>last one</p>
  <section><h2>head</h2><p>sec p</p></section>
</div></body>"""


def _sel_texts(root, expr):
    from crawl4ai_spark.functions.schema_extract import _xpath_text, xpath_select

    out = xpath_select(root, expr)
    return [n if isinstance(n, str) else _xpath_text(n) for n in out]


def test_xpath_extended_grammar():
    """r3 grammar extension: last()/position(), contains/starts-with,
    not(), !=, child-existence predicates, parent/ancestor/sibling
    axes, .., unions (reference accepts arbitrary lxml XPath;
    extraction_strategy.py:1612-1674)."""
    from crawl4ai_spark.functions.scrape import parse_dom

    root = parse_dom(HTML_GRAMMAR)
    cases = [
        ("//p[last()]", ["last one", "sec p"]),  # last() per sibling group
        ("//p[position()<=2]", ["first", "middle key", "sec p"]),
        ("//p[position()>1]", ["middle key", "last one"]),
        ("//a[contains(@href, '.pdf')]", ["A2"]),
        ("//a[starts-with(@href, '/a')]", ["A1", "A3"]),
        ("//p[contains(., 'key')]", ["middle key"]),
        ("//li[not(@class)]/a", ["A1", "A2"]),
        ("//a[@title!='t9']", ["A1"]),  # != requires the attr to exist
        ("//li[a]", ["A1", "A2", "A3"]),
        ("//h2/parent::section/p", ["sec p"]),
        ("//p[1]/following-sibling::p", ["middle key", "last one"]),
        # reverse axes count nearest-first
        ("//p[contains(., 'last')]/preceding-sibling::p[1]", ["middle key"]),
        ("//h2 | //p[1]", ["head", "first", "sec p"]),
        ("//section/h2/text() | //p[1]/text()", ["head", "first", "sec p"]),
    ]
    for expr, want in cases:
        assert _sel_texts(root, expr) == want, expr
    # .. == parent::*
    from crawl4ai_spark.functions.schema_extract import xpath_select

    assert [n.tag for n in xpath_select(root, "//h2/..")] == ["section"]
    assert [n.tag for n in xpath_select(root, "//a/ancestor::ul")] == ["ul"]


def test_xpath_extended_grammar_in_schema():
    """The extended grammar works through the schema-extraction stage
    (validate_schema accepts it; extraction applies it per field)."""
    from crawl4ai_spark.functions.schema_extract import json_xpath_extract

    schema = {
        "baseSelector": "//div[@id='main']",
        "fields": [
            {"name": "pdf", "selector": ".//a[contains(@href, '.pdf')]",
             "type": "text"},
            {"name": "last_p", "selector": ".//ul/following-sibling::p[last()]",
             "type": "text"},
        ],
    }
    out = json_xpath_extract(HTML_GRAMMAR, schema)
    assert out == [{"pdf": "A2", "last_p": "last one"}]


def test_xpath_r3b_grammar():
    """Second grammar widening: boolean and/or/not(...) predicates,
    text()=/.= equality, normalize-space(), count(), string-length(),
    last()-n, and the self/child/descendant[-or-self]/
    ancestor-or-self axes (reference accepts arbitrary lxml XPath;
    extraction_strategy.py:1612-1674)."""
    from crawl4ai_spark.functions.scrape import parse_dom

    root = parse_dom(HTML_GRAMMAR)
    cases = [
        # boolean combinators (and > or precedence; not() nesting)
        ("//a[@title='t1' or contains(@href, '.pdf')]", ["A1", "A2"]),
        ("//a[starts-with(@href, '/') and not(contains(@href, 'a3'))]",
         ["A1"]),
        ("//li[not(@class) and a]/a", ["A1", "A2"]),
        ("//p[position()=1 or position()=last()]",
         ["first", "last one", "sec p"]),
        # string-value / text-node equality
        ("//p[.='middle key']", ["middle key"]),
        ("//p[text()='first']", ["first"]),
        ("//p[normalize-space(.)='last one']", ["last one"]),
        ("//a[normalize-space(@title)='t1']", ["A1"]),
        # counting and length
        ("//ul[count(li)=3]/li[1]/a", ["A1"]),
        ("//div[count(*)>3]/p[1]", ["first"]),
        ("//a[string-length(@href)>10]", ["A2"]),
        ("//p[string-length(.)>=8]", ["middle key", "last one"]),
        # last()-n and predicate re-indexing within the sibling group
        ("//p[last()-1]", ["middle key"]),  # per sibling group: 2 of 3
        ("//p[string-length(.)>=8][2]", ["last one"]),
        # each a is alone in its sibling group, so [2] never matches
        # (true XPath semantics — lxml returns [] here too)
        ("//a[starts-with(@href, '/')][2]", []),
        # starts-with on the string-value
        ("//p[starts-with(., 'mid')]", ["middle key"]),
        # new axes
        ("//h2/self::h2", ["head"]),
        ("//section/child::p", ["sec p"]),
        ("//div/descendant::h2", ["head"]),
        # self is position 1 on the ancestor-or-self reverse axis
        ("//a[1]/ancestor-or-self::*[1]", ["A1", "A2", "A3"]),
        ("//section/descendant-or-self::section/h2", ["head"]),
    ]
    for expr, want in cases:
        assert _sel_texts(root, expr) == want, expr
    # //axis:: expands through descendant-or-self (lxml parity):
    # every ul-descendant's li-ancestor, deduped
    from crawl4ai_spark.functions.schema_extract import xpath_select

    lis = xpath_select(root, "//ul//ancestor::li")
    assert [n.tag for n in lis] == ["li", "li", "li"]


def test_xpath_descendant_axis_positional_is_global():
    """/descendant::p[1] indexes the WHOLE descendant set (one group
    per context node), unlike //p[1] which indexes per parent group —
    the classic XPath distinction."""
    from crawl4ai_spark.functions.scrape import parse_dom

    root = parse_dom(HTML_GRAMMAR)
    assert _sel_texts(root, "/descendant::p[1]") == ["first"]
    assert _sel_texts(root, "/descendant::p[last()]") == ["sec p"]
    # vs per-sibling-group semantics of //p[1]
    assert _sel_texts(root, "//p[1]") == ["first", "sec p"]


def test_xpath_union_mixing_types_raises():
    import pytest

    from crawl4ai_spark.functions.scrape import parse_dom
    from crawl4ai_spark.functions.schema_extract import xpath_select

    root = parse_dom(HTML_GRAMMAR)
    with pytest.raises(ValueError):
        xpath_select(root, "//h2 | //p/text()")
