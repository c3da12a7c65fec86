"""Data-table detection + extraction tests (reference scoring rules)."""

from __future__ import annotations

from crawl4ai_spark.functions.scrape import parse_dom
from crawl4ai_spark.functions.tables import (
    extract_data_tables,
    extract_table,
    table_score,
    tables_stage,
)

DATA_TABLE = """
<table summary="stats">
  <caption>Quarterly numbers</caption>
  <thead><tr><th>Region</th><th colspan="2">Sales</th></tr></thead>
  <tbody>
    <tr><td>north region</td><td>100 units</td><td>200 units</td></tr>
    <tr><td>south region</td><td>150 units</td><td>250 units</td></tr>
  </tbody>
</table>
"""

LAYOUT_TABLE = """
<table role="presentation">
  <tr><td><div><span><a href='/'>x</a></span></div></td></tr>
  <tr><td>y</td><td>z</td><td>w</td></tr>
</table>
"""


def _first_table(html):
    root = parse_dom(html)
    return next(n for n in _walk(root) if n.tag == "table")


def _walk(node):
    yield node
    for c in node.children:
        if c.tag != "":
            yield from _walk(c)


def test_data_table_scores_high():
    t = _first_table(DATA_TABLE)
    assert table_score(t) >= 7


def test_layout_table_scores_low():
    t = _first_table(LAYOUT_TABLE)
    assert table_score(t) < 7


def test_extract_with_thead_and_colspan():
    d = extract_table(_first_table(DATA_TABLE))
    assert d["headers"] == ["Region", "Sales", "Sales"]  # colspan dup
    assert d["rows"] == [
        ["north region", "100 units", "200 units"],
        ["south region", "150 units", "250 units"],
    ]
    assert d["caption"] == "Quarterly numbers"
    assert d["summary"] == "stats"


def test_extract_first_row_fallback_and_padding():
    html = """
    <table>
      <tr><th>A</th><th>B</th><th>C</th></tr>
      <tr><td>1</td><td>2</td></tr>
      <tr><td>3</td><td>4</td><td>5</td><td>6</td></tr>
    </table>"""
    d = extract_table(_first_table(html))
    assert d["headers"] == ["A", "B", "C"]
    assert d["rows"] == [["1", "2", ""], ["3", "4", "5"]]  # pad + truncate


def test_synth_headers_when_no_th():
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    d = extract_table(_first_table(html))
    # first-row td cells become headers (reference fallback), body = all rows
    assert d["headers"] == ["a", "b"]
    assert d["rows"] == [["a", "b"], ["c", "d"]]


def test_extract_data_tables_threshold():
    page = "<html><body>" + DATA_TABLE + LAYOUT_TABLE + "</body></html>"
    tabs = extract_data_tables(page, score_threshold=7.0)
    assert len(tabs) == 1
    assert tabs[0]["headers"][0] == "Region"
    assert tabs[0]["score"] >= 7


def test_tables_stage_spark(spark, sf_dir):
    from crawl4ai_spark.synth import generate_pages

    # synth pages with doc_id % 5 == 0 carry a small k/v table
    pages = generate_pages(spark, sf_dir).limit(50)
    out = tables_stage(pages, "html", score_threshold=4.0).collect()
    with_tables = [r for r in out if len(r["tables"]) > 0]
    assert with_tables
    t = with_tables[0]["tables"][0]
    assert t["headers"] == ["k", "v"]
    assert t["rows"][0][0] == "id"
