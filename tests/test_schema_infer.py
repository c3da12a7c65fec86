"""generate_schema structural inference: the inferred schema must
round-trip through the extraction engines and recover the items."""

from __future__ import annotations

from crawl4ai_spark.functions.schema_extract import (
    json_css_extract,
    json_xpath_extract,
)
from crawl4ai_spark.functions.schema_infer import generate_schema, infer_schema

PRODUCTS = """
<html><body>
<header><h1>Shop</h1></header>
<div class="listing">
  <div class="product">
    <h2 class="name">Widget A</h2>
    <span class="price">$10</span>
    <a class="buy" href="/a">Buy A</a>
    <img class="thumb" src="/a.png">
  </div>
  <div class="product">
    <h2 class="name">Widget B</h2>
    <span class="price">$20</span>
    <a class="buy" href="/b">Buy B</a>
    <img class="thumb" src="/b.png">
  </div>
  <div class="product">
    <h2 class="name">Widget C</h2>
    <span class="price">$30</span>
    <a class="buy" href="/c">Buy C</a>
    <img class="thumb" src="/c.png">
  </div>
</div>
<footer><p>fine print</p></footer>
</body></html>
"""


def test_infer_css_schema_round_trip():
    schema = infer_schema(PRODUCTS)
    assert schema["baseSelector"] == "div.product"
    out = json_css_extract(PRODUCTS, schema)
    assert len(out) == 3
    assert [o["name"] for o in out] == ["Widget A", "Widget B", "Widget C"]
    assert [o["price"] for o in out] == ["$10", "$20", "$30"]
    assert [o["buy_href"] for o in out] == ["/a", "/b", "/c"]
    assert [o["thumb_src"] for o in out] == ["/a.png", "/b.png", "/c.png"]


def test_infer_xpath_schema_round_trip():
    schema = infer_schema(PRODUCTS, schema_type="XPATH")
    assert schema["baseSelector"] == "//div[@class='product']"
    out = json_xpath_extract(PRODUCTS, schema)
    assert [o["name"] for o in out] == ["Widget A", "Widget B", "Widget C"]


def test_list_items():
    html = "<ul><li>one</li><li>two</li><li>three</li></ul>"
    schema = infer_schema(html)
    assert schema["baseSelector"] == "li"
    out = json_css_extract(html, schema)
    assert [list(o.values())[0] for o in out] == ["one", "two", "three"]


def test_no_repetition_falls_to_llm_seam():
    html = "<div><p>just one paragraph</p></div>"
    assert infer_schema(html) is None

    def fake_llm(**kw):
        return {"baseSelector": "p", "fields": [{"name": "t", "type": "text"}]}

    schema = generate_schema(html, llm=fake_llm)
    assert json_css_extract(html, schema) == [{"t": "just one paragraph"}]
    assert generate_schema(html) is None  # no llm provided


def test_synthetic_pages_inference(spark, sf_dir):
    """Over the corpus: each page's repeated <li><a> list must be found
    and extraction must recover the item texts."""
    from crawl4ai_spark.synth import generate_pages

    row = generate_pages(spark, sf_dir).select("html").first()
    html = bytes(row["html"]).decode()
    schema = infer_schema(html)
    out = json_css_extract(html, schema)
    assert len(out) >= 2


def test_whitespace_class_and_css_metachars_degrade():
    """A whitespace-only class must not IndexError, and Tailwind-style
    classes ('w-1/2', 'md:flex') must be excluded from inferred
    selectors so the schema round-trips through the engine's own
    validator."""
    from crawl4ai_spark.functions.schema_infer import infer_schema
    from crawl4ai_spark.functions.schema_extract import (
        json_css_extract,
        validate_schema,
    )

    s1 = infer_schema(
        '<ul><li><a class=" " href="/a">A</a></li>'
        '<li><a class=" " href="/b">B</a></li></ul>'
    )
    assert s1 is not None
    validate_schema(s1, "css")

    html = (
        '<ul><li class="w-1/2"><a href="/a">A</a></li>'
        '<li class="w-1/2"><a href="/b">B</a></li></ul>'
    )
    s2 = infer_schema(html)
    assert s2 is not None
    validate_schema(s2, "css")
    out = json_css_extract(html, s2)
    assert len(out) == 2


def test_deeply_nested_page_inference_never_recurses_out():
    from crawl4ai_spark.functions.schema_infer import infer_schema

    deep = "<div>" * 3000 + "<ul><li>a</li><li>b</li></ul>" + "</div>" * 3000
    assert infer_schema(deep) is not None
