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
    for bad in ["p", "//p[last()]", "//p/following-sibling::p"]:
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
    for bad in ["//div/ancestor::body", "//a[contains(@href, 'x')]",
                "//a/following-sibling::a", "//a[last()]", "//a | //div"]:
        schema = {"baseSelector": "//div",
                  "fields": [{"name": "v", "selector": bad, "type": "text"}]}
        with pytest.raises(ValueError):
            validate_schema(schema, "xpath")
        with pytest.raises(ValueError):
            json_xpath_extract(html, schema)
    # and an unsupported baseSelector fails too
    with pytest.raises(ValueError):
        json_xpath_extract(html, {"baseSelector": "//div/ancestor::body",
                                  "fields": []})


def test_validate_schema_walks_nested_fields():
    import pytest

    from crawl4ai_spark.functions.schema_extract import validate_schema

    schema = {
        "baseSelector": "//div",
        "fields": [{
            "name": "inner", "selector": "//ul", "type": "nested",
            "fields": [{"name": "bad", "selector": "//li[position()=2]",
                        "type": "text"}],
        }],
    }
    with pytest.raises(ValueError):
        validate_schema(schema, "xpath")
