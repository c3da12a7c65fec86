"""JSON-CSS schema extraction tests (reference field-type semantics)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crawl4ai_spark.functions.schema_extract import (
    json_css_extract,
    schema_extract_stage,
    select_all,
)
from crawl4ai_spark.functions.scrape import parse_dom

HTML = """
<html><body>
<div class="product" id="p1">
  <h2 class="name">Widget <em>One</em></h2>
  <span class="price">$19.99</span>
  <a class="buy" href="/buy/1" title="Buy now">buy</a>
  <ul class="tags"><li>alpha</li><li>beta</li></ul>
  <div class="meta"><span class="sku">SKU-001</span></div>
</div>
<div class="product" id="p2">
  <h2 class="name">GADGET Two</h2>
  <span class="price">$5.00</span>
  <a class="buy" href="/buy/2">buy</a>
  <ul class="tags"><li>gamma</li></ul>
</div>
<div class="other"><h2 class="name">not a product</h2></div>
</body></html>
"""

SCHEMA = {
    "baseSelector": "div.product",
    "fields": [
        {"name": "name", "selector": "h2.name", "type": "text"},
        {"name": "name_lower", "selector": "h2.name", "type": "text",
         "transform": "lowercase"},
        {"name": "price", "selector": "span.price", "type": "regex",
         "pattern": r"\$([\d.]+)"},
        {"name": "link", "selector": "a.buy", "type": "attribute",
         "attribute": "href"},
        {"name": "link_title", "selector": "a.buy", "type": "attribute",
         "attribute": "title", "default": "none"},
        {"name": "tags", "selector": "ul.tags li", "type": "list",
         "fields": [{"name": "tag", "type": "text"}]},
        {"name": "meta", "selector": "div.meta", "type": "nested",
         "fields": [{"name": "sku", "selector": "span.sku", "type": "text"}]},
        {"name": "name_html", "selector": "h2.name", "type": "html"},
        {"name": "double_price", "type": "computed",
         "expression": "float(price) * 2" if False else "price + price"},
    ],
    "baseFields": [
        {"name": "pid", "type": "attribute", "attribute": "id"},
    ],
}


def test_selector_engine():
    root = parse_dom(HTML)
    assert len(select_all(root, "div.product")) == 2
    assert len(select_all(root, "div.product h2.name")) == 2
    assert len(select_all(root, "#p1")) == 1
    assert len(select_all(root, "ul.tags > li")) == 3
    assert len(select_all(root, "div.product, div.other")) == 3
    assert len(select_all(root, "a[title]")) == 1
    assert len(select_all(root, 'a[href="/buy/2"]')) == 1
    assert select_all(root, "span.sku")[0].attrs == {"class": "sku"}


def test_schema_extraction():
    items = json_css_extract(HTML, SCHEMA)
    assert len(items) == 2
    p1, p2 = items
    assert p1["pid"] == "p1"
    assert p1["name"] == "WidgetOne"  # get_text(strip=True) semantics
    assert p1["name_lower"] == "widgetone"
    assert p1["price"] == "19.99"
    assert p1["link"] == "/buy/1"
    assert p1["link_title"] == "Buy now"
    assert p1["tags"] == [{"tag": "alpha"}, {"tag": "beta"}]
    assert p1["meta"] == {"sku": "SKU-001"}
    assert "<em>" in p1["name_html"]
    assert p1["double_price"] == "19.9919.99"  # computed over item ns
    assert p2["link_title"] == "none"  # default fires
    assert p2["meta"] == {}  # missing nested -> {}


def test_empty_and_garbage():
    assert json_css_extract(None, SCHEMA) == []
    assert json_css_extract("", SCHEMA) == []
    assert json_css_extract("<p>no products</p>", SCHEMA) == []


def test_schema_extract_stage_spark(spark):
    df = spark.createDataFrame([(1, HTML), (2, "<p>none</p>"), (3, None)],
                               "id int, html string")
    out = schema_extract_stage(df, "html", SCHEMA).orderBy("id").collect()
    items = json.loads(out[0]["extracted_content"])
    assert len(items) == 2 and items[0]["pid"] == "p1"
    assert json.loads(out[1]["extracted_content"]) == []
    assert json.loads(out[2]["extracted_content"]) == []
    # downstream structuring via from_json stays native
    parsed = (
        schema_extract_stage(df, "html", SCHEMA)
        .select(
            "id",
            F.from_json(
                "extracted_content",
                "array<struct<pid:string,name:string,price:string>>",
            ).alias("items"),
        )
        .orderBy("id")
        .collect()
    )
    assert parsed[0]["items"][0]["name"] == "WidgetOne"
