"""Knob-driven scrape-stage semantics (§2.8), pinned against
hand-computed expectations derived from the reference's
content_scraping_strategy.py (LXMLWebScrapingStrategy._scrap
:1566-1750, process_image :1271-1376, remove_empty_elements_fast
:1378-1415, remove_unwanted_attributes_fast :1417-1452,
flatten_nested_elements :1258-1269) and the fetch-time css_selector
projection (async_crawler_strategy.py:1022-1045).

Each test names the reference rule it mirrors; divergences are those
documented on ScrapeOptions.
"""

import pytest

from crawl4ai_spark.functions.scrape import (
    IMPORTANT_ATTRS,
    ScrapeOptions,
    _parent_map,
    cleaned_html,
    extract_media,
    find_closest_parent_with_useful_text,
    flatten_nested_elements,
    parse_dom,
    process_image,
    scrape_one,
    scrape_stage,
)

URL = "https://example.com/dir/page.html"


def _scrape(html, **kw):
    return scrape_one(html, URL, opts=ScrapeOptions(**kw))


# ---------------------------------------------------------------------------
# image scoring (process_image :1271-1376)
# ---------------------------------------------------------------------------


def _score_of(img_html, index=0, total=1, **opt_kw):
    root = parse_dom(f"<body>{img_html}</body>")
    parents = _parent_map(root)
    img = next(n for n in _walk_imgs(root))
    return process_image(
        img, parents, index, total, ScrapeOptions(**opt_kw)
    )


def _walk_imgs(root):
    stack = [root]
    while stack:
        n = stack.pop()
        if n.tag == "img":
            yield n
        stack.extend(reversed(n.children))


def test_image_score_each_term():
    # width>150:+1, height>150:+1, alt:+1, first-half:+1, format:+1,
    # srcset:+1 -> 6; threshold default 2 (config.py:94)
    v = _score_of(
        '<img src="a.jpg" width="400" height="300" alt="x" '
        'srcset="a2.jpg 2w">'
    )
    assert v[0]["score"] == 6
    # width=150 is NOT >150 (reference uses strict >)
    v = _score_of('<img src="a.jpg" width="150" height="151" alt="x">')
    assert v[0]["score"] == 4  # height + alt + first-half + format
    # non-digit width ignored
    v = _score_of('<img src="a.jpg" width="100%" height="200" alt="x">')
    assert v[0]["score"] == 4


def test_image_score_threshold_cut_is_strict():
    # score == threshold -> dropped (reference `score <= threshold`)
    # alt + first-half = 2 <= 2
    assert _score_of('<img src="a.bin" alt="x">') is None
    # 3 > 2 -> kept (format pushes it over)
    v = _score_of('<img src="a.jpg" alt="x">')
    assert v[0]["score"] == 3
    # raising the knob drops it again
    assert _score_of('<img src="a.jpg" alt="x">', image_score_threshold=3) is None


def test_image_second_half_of_page_loses_position_point():
    v = _score_of('<img src="a.jpg" alt="x">', index=5, total=10)
    assert v is None  # 5/10 = 0.5 not < 0.5 -> alt+format = 2 <= 2
    v = _score_of('<img src="a.jpg" alt="x">', index=4, total=10)
    assert v[0]["score"] == 3


def test_image_icon_button_logo_skips():
    # src/alt containing button|icon|logo -> skipped (:1296-1300)
    assert _score_of('<img src="icon-big.jpg" width="999" height="999" alt="y">') is None
    assert _score_of('<img src="a.jpg" width="999" height="999" alt="site logo">') is None
    # display:none -> skipped (:1283)
    assert _score_of('<img src="a.jpg" style="display:none" width="999" height="999" alt="y">') is None
    # parent button/input -> skipped (:1286-1288)
    root = parse_dom('<body><button><img src="a.jpg" width="999" height="999" alt="y"></button></body>')
    parents = _parent_map(root)
    img = next(_walk_imgs(root))
    assert process_image(img, parents, 0, 1) is None
    # parent class containing icon/button/logo -> skipped (:1290-1294)
    root = parse_dom('<body><div class="nav-icon x"><img src="a.jpg" width="999" height="999" alt="y"></div></body>')
    parents = _parent_map(root)
    img = next(_walk_imgs(root))
    assert process_image(img, parents, 0, 1) is None


def test_image_variant_expansion_srcset_picture_framework():
    html = (
        '<picture><source srcset="p-800.webp 800w, p-1600.webp 1600w">'
        '<img src="p.webp" alt="pic" data-src="lazy.webp" '
        'data-lazy-src="http://cdn/f.webp" '
        'srcset="s1.webp 1w"></picture>'
    )
    v = _score_of(html)
    # alt+first-half+format+srcset+picture = 5
    assert all(x["score"] == 5 for x in v)
    srcs = [x["src"] for x in v]
    # order: src, data-src, srcset entries, picture sources, framework
    assert srcs == [
        "p.webp", "lazy.webp", "s1.webp", "p-800.webp", "p-1600.webp",
        "http://cdn/f.webp",
    ]
    widths = {x["src"]: x["width"] for x in v}
    assert widths["p-800.webp"] == "800" and widths["s1.webp"] == "1"
    assert widths["p.webp"] is None
    assert all(x["format"] == "webp" for x in v)
    assert all(x["group_id"] == 0 for x in v)


def test_image_variants_skip_data_uris_and_dups():
    # dup of src skipped; a data: URI in data-src skipped by add_variant
    v = _score_of(
        '<img src="a.jpg" alt="x" data-src="data:image/png;base64,AA" '
        'srcset="a.jpg 1w, b.jpg 2w">'
    )
    assert [x["src"] for x in v] == ["a.jpg", "b.jpg"]


def test_image_desc_closest_parent_with_useful_text():
    html = (
        "<div>here are five useful words"
        '<span><img src="a.jpg" width="400" height="400" alt="x"></span>'
        "</div>"
    )
    v = _score_of(html)
    assert v[0]["desc"] == "here are five useful words"
    # min-word threshold knob (config.py:48 default 1)
    v = _score_of(html, image_description_min_word_threshold=6)
    assert v[0]["desc"] is None


# ---------------------------------------------------------------------------
# media harvest: videos / audios (:1204-1220)
# ---------------------------------------------------------------------------


def test_video_audio_harvest_with_source_expansion():
    html = (
        "<body><p>context words here</p>"
        '<video src="v.mp4"><source src="v.webm"><source src="v.ogg">'
        "</video>"
        '<audio><source src="a.mp3"></audio></body>'
    )
    root = parse_dom(html)
    parents = _parent_map(root)
    m = extract_media(root, parents, URL)
    assert [x["src"] for x in m["videos"]] == ["v.mp4", "v.webm", "v.ogg"]
    assert all(x["type"] == "video" for x in m["videos"])
    # the audio element itself has no src -> src None, plus one source row
    assert [x["src"] for x in m["audios"]] == [None, "a.mp3"]
    assert all(x["type"] == "audio" for x in m["audios"])


# ---------------------------------------------------------------------------
# link exclusion flags (F10; :1152-1165, config.py:74-85)
# ---------------------------------------------------------------------------


def test_exclude_social_media_links_removes_dom_and_harvest():
    html = (
        '<a href="https://facebook.com/p">fb</a>'
        '<a href="https://sub.twitter.com/q">tw</a>'
        '<a href="https://other.com/x">keep-ext</a>'
        '<a href="/local">keep-int</a>'
    )
    r = _scrape(html, exclude_social_media_links=True)
    hrefs = [l["href"] for l in r["links"]]
    assert hrefs == ["https://other.com/x", "https://example.com/local"]
    assert "facebook" not in r["cleaned_html"]
    assert "twitter" not in r["cleaned_html"]


def test_exclude_domains_and_external_links():
    html = (
        '<a href="https://bad.com/x">b</a>'
        '<a href="https://good.com/y">g</a>'
        '<a href="/in">i</a>'
    )
    r = _scrape(html, exclude_domains=frozenset({"bad.com"}))
    assert [l["href"] for l in r["links"]] == [
        "https://good.com/y", "https://example.com/in"]
    r = _scrape(html, exclude_external_links=True)
    assert [l["href"] for l in r["links"]] == ["https://example.com/in"]
    # internal links never hit exclude_domains (reference checks only
    # the external branch)
    r = _scrape(html, exclude_domains=frozenset({"example.com"}))
    assert "https://example.com/in" in [l["href"] for l in r["links"]]
    # mixed-case config entries match (documented divergence: the
    # reference's exact string compare silently never matches them;
    # the crawl-level frontier filter lowercases, so both layers here
    # agree on any casing)
    r = _scrape(html, exclude_domains=frozenset({"Bad.COM"}))
    assert [l["href"] for l in r["links"]] == [
        "https://good.com/y", "https://example.com/in"]


def test_exclude_external_images_and_image_domains():
    html = (
        '<img src="https://cdn.other.com/a.jpg" alt="ext">'
        '<img src="/local.jpg" alt="int">'
    )
    r = _scrape(html, exclude_external_images=True)
    assert "cdn.other.com" not in r["cleaned_html"]
    assert "local.jpg" in r["cleaned_html"]
    r = _scrape(html, exclude_domains=frozenset({"other.com"}))
    assert "cdn.other.com" not in r["cleaned_html"]
    r2 = _scrape(html, exclude_all_images=True)
    assert "<img" not in r2["cleaned_html"]
    assert r2["images"] == []


# ---------------------------------------------------------------------------
# excluded_selector / excluded_tags removal (:1627-1645)
# ---------------------------------------------------------------------------


def test_excluded_selector_removes_matches_with_tail():
    html = '<div class="ads">AD</div>trailing<p>keep</p>'
    r = _scrape(html, excluded_selector="div.ads")
    # lxml remove() drops the element's tail text run
    assert r["cleaned_html"] == "<p>keep</p>"
    # invalid selector is forgiven (reference logs and continues)
    r = _scrape(html, excluded_selector="div..[")
    assert "AD" in r["cleaned_html"]


def test_excluded_tags_removal_semantics():
    html = "<nav>menu</nav><p>body text</p>"
    r = _scrape(html, excluded_tags=frozenset({"nav"}))
    assert r["cleaned_html"] == "<p>body text</p>"
    assert "menu" not in r["text"]


def test_remove_forms():
    html = "<form><input name='q'><button>go</button></form><p>x</p>"
    r = _scrape(html, remove_forms=True)
    assert "<form" not in r["cleaned_html"] and "<p>x</p>" in r["cleaned_html"]


# ---------------------------------------------------------------------------
# word_count_threshold prune (:1378-1415, :1731)
# ---------------------------------------------------------------------------


def test_prune_removes_empty_leaves_and_cascades():
    html = "<div><p></p><span>  </span></div><p>kept words</p>"
    r = _scrape(html, word_count_threshold=1)
    # p and span removed as empty leaves; div then empty -> cascades
    assert r["cleaned_html"] == "<p>kept words</p>"


def test_prune_bypass_tags_survive():
    html = '<td></td><img src="x.jpg"><br><p></p>'
    r = _scrape(html, word_count_threshold=1)
    assert "<td>" in r["cleaned_html"]
    assert "<img" in r["cleaned_html"]
    assert "<br>" in r["cleaned_html"]
    assert "<p>" not in r["cleaned_html"]


def test_prune_honors_higher_threshold():
    # divergence (documented): reference lxml hard-codes 1; we honor
    # the knob like the BS4 strategy's word_count_threshold
    html = "<p>two words</p><p>three whole words</p>"
    r = _scrape(html, word_count_threshold=3)
    assert "two words" not in r["cleaned_html"]
    assert "three whole words" in r["cleaned_html"]


def test_prune_keeps_elements_with_element_children():
    # reference: only childless elements are candidates
    html = "<div><img src='x.jpg'></div>"
    r = _scrape(html, word_count_threshold=1)
    assert "<div>" in r["cleaned_html"]


# ---------------------------------------------------------------------------
# attribute strip (:1417-1452, config.py:50)
# ---------------------------------------------------------------------------


def test_strip_attributes_keeps_important_attrs():
    html = ('<a href="/x" class="btn" onclick="evil()" title="t">y</a>'
            '<img src="i.jpg" alt="a" width="5" height="6" loading="lazy" '
            'data-id="7">')
    r = _scrape(html, strip_attrs=True)
    ch = r["cleaned_html"]
    assert 'href="/x"' in ch and 'title="t"' in ch
    assert "class=" not in ch and "onclick=" not in ch
    assert 'width="5"' in ch and 'height="6"' in ch
    assert "loading=" not in ch and "data-id" not in ch
    r = _scrape(html, strip_attrs=True, keep_data_attributes=True)
    assert 'data-id="7"' in r["cleaned_html"]
    assert sorted(IMPORTANT_ATTRS) == [
        "alt", "height", "href", "src", "title", "width"]


# ---------------------------------------------------------------------------
# only_text (:1714-1722, config.py:51-73)
# ---------------------------------------------------------------------------


def test_only_text_flattens_inline_formatting():
    html = "<p><b>bold <i>nested</i></b> tail</p>"
    r = _scrape(html, only_text=True)
    # b (direct text) -> span with full text content; tail preserved
    assert r["cleaned_html"] == "<p><span>bold nested</span> tail</p>"


def test_only_text_skips_elements_without_direct_text():
    # lxml `element.text` is None when content starts with a child
    html = "<p><em><b>inner</b></em></p>"
    r = _scrape(html, only_text=True)
    # b has direct text -> replaced; em does not -> kept as element
    assert r["cleaned_html"] == "<p><em><span>inner</span></em></p>"


# ---------------------------------------------------------------------------
# base64 cleanup (:1099, :1724-1728) — always on in the extended flow
# ---------------------------------------------------------------------------


def test_base64_src_blanked():
    html = '<img src="data:image/png;base64,iVBORw0KGgo=" alt="x"><p>y</p>'
    r = _scrape(html, remove_forms=True)  # any non-default knob
    assert "base64" not in r["cleaned_html"]
    assert 'src=""' in r["cleaned_html"]


# ---------------------------------------------------------------------------
# flatten_nested_elements (:1258-1269)
# ---------------------------------------------------------------------------


def test_flatten_nested_same_tag():
    root = parse_dom("<div><div><div>x</div></div></div>")
    assert cleaned_html(flatten_nested_elements(root)) == "<div>x</div>"
    root2 = parse_dom("<section><section><b>k</b></section></section>")
    assert cleaned_html(flatten_nested_elements(root2)) == "<section><b>k</b></section>"
    # multi-child same-tag nesting is NOT flattened
    root3 = parse_dom("<div><div>a</div><div>b</div></div>")
    assert cleaned_html(flatten_nested_elements(root3)) == "<div><div>a</div><div>b</div></div>"


def test_flatten_nested_knob_wired_into_scrape():
    """ScrapeOptions(flatten_nested=True) applies the same-tag collapse
    inside the scrape pass (the BS4 strategy's always-on position,
    :1043); off by default (lxml _scrap never calls it)."""
    html = "<div><div><div>x</div></div></div><p>keep</p>"
    r = _scrape(html, flatten_nested=True)
    assert "<div>x</div>" in r["cleaned_html"]
    assert "<div><div>" not in r["cleaned_html"]
    # default path: nesting preserved
    r0 = _scrape(html, remove_forms=True)  # non-default, flatten off
    assert "<div><div><div>x</div></div></div>" in r0["cleaned_html"]


# ---------------------------------------------------------------------------
# css_selector projection (async_crawler_strategy.py:1022-1045)
# ---------------------------------------------------------------------------


def test_css_selector_projection_shape():
    html = "<p class='a'>one</p><p class='b'>two</p><div>three</div>"
    r = _scrape(html, css_selector="p.a, div")
    assert r["cleaned_html"] == (
        '<div class="crawl4ai-result">\n<p class="a">one</p>\n'
        "<div>three</div>\n</div>"
    )
    # everything outside the projection is invisible to the scrape
    assert "two" not in r["text"]


def test_css_selector_duplicates_across_parts_kept():
    # repeated querySelectorAll calls keep duplicates (reference joins
    # per-selector outerHTML lists)
    html = "<p class='a'>one</p>"
    r = _scrape(html, css_selector="p, .a")
    assert r["cleaned_html"].count("one") == 2


# ---------------------------------------------------------------------------
# target_elements (:1657-1676)
# ---------------------------------------------------------------------------


def test_target_elements_restrict_cleaned_html_not_links():
    html = (
        '<nav><a href="/n">nav</a></nav>'
        '<article><p>body</p><a href="/a">art</a></article>'
    )
    r = _scrape(html, target_elements=("article",))
    # links harvested from the FULL page (reference: _process_element
    # runs on body)
    assert {l["href"] for l in r["links"]} == {
        "https://example.com/n", "https://example.com/a"}
    # cleaned_html only the targeted subtree, wrapped in a div
    assert r["cleaned_html"].startswith("<div><article>")
    assert "nav" not in r["cleaned_html"]


def test_target_elements_selector_error_fails_scrape():
    # reference returns None (scrape failure) on a selector error here
    r = _scrape("<p>x</p>", target_elements=("div..[",))
    assert r["success"] is False


# ---------------------------------------------------------------------------
# find_closest_parent_with_useful_text (:1241-1256)
# ---------------------------------------------------------------------------


def test_useful_text_requires_direct_text():
    # the ancestor must have text directly after its opening tag
    root = parse_dom("<div><span><img src='x'></span>words here now</div>")
    parents = _parent_map(root)
    img = next(_walk_imgs(root))
    # div's first child is <span> (no direct text) -> not a candidate
    assert find_closest_parent_with_useful_text(img, parents, 1) is None


# ---------------------------------------------------------------------------
# Spark surface: scrape_stage(opts=...)
# ---------------------------------------------------------------------------


def test_scrape_stage_media_column(spark):
    html = (
        "<body><p>five words of context text</p>"
        '<img src="hero.jpg" width="400" height="300" alt="hero" '
        'srcset="hero-2x.jpg 2w">'
        '<video src="v.mp4"><source src="v.webm"></video></body>'
    )
    df = spark.createDataFrame([(URL, html)], "url string, html string")
    out = scrape_stage(df, opts=ScrapeOptions(media=True))
    row = out.collect()[0]
    imgs = row["media"]["images"]
    assert [i["src"] for i in imgs] == ["hero.jpg", "hero-2x.jpg"]
    assert all(i["score"] == 6 for i in imgs)
    assert imgs[1]["width"] == "2" and imgs[0]["width"] is None
    assert [v["src"] for v in row["media"]["videos"]] == ["v.mp4", "v.webm"]
    assert row["media"]["audios"] == []
    # default stage output has NO media column
    out2 = scrape_stage(df)
    assert "media" not in out2.columns


def test_scrape_stage_opts_knobs_end_to_end(spark):
    html = (
        '<nav>menu</nav><p>keep this text</p>'
        '<a href="https://reddit.com/r/x">social</a>'
    )
    df = spark.createDataFrame([(URL, html)], "url string, html string")
    out = scrape_stage(
        df,
        opts=ScrapeOptions(
            excluded_tags=frozenset({"nav"}),
            exclude_social_media_links=True,
            word_count_threshold=1,
            strip_attrs=True,
        ),
    )
    row = out.collect()[0]
    assert "menu" not in row["cleaned_html"]
    assert "reddit" not in row["cleaned_html"]
    assert row["links"] == []
    assert "keep this text" in row["raw_markdown"]


# ---------------------------------------------------------------------------
# r5 review regressions: lxml tail parity, depth tolerance, match copies
# ---------------------------------------------------------------------------


def test_removal_keeps_text_after_comment():
    """lxml tail parity: '<span/>keep1<!-- c -->keep2' — keep1 is the
    span's tail (dropped with it), keep2 is the COMMENT's tail and
    survives element removal (lxml parent.remove(el) discards only
    el.tail)."""
    r = scrape_one(
        '<div><span class="ad"></span>keep1<!-- c -->keep2</div>',
        URL,
        opts=ScrapeOptions(excluded_selector=".ad"),
    )
    assert r["text"] == "keep2"
    # contiguous tail (no comment) is still dropped with the element
    r2 = scrape_one(
        '<div><span class="ad"></span>tail<b>k</b></div>',
        URL,
        opts=ScrapeOptions(excluded_selector=".ad"),
    )
    assert r2["text"] == "k"


def test_deeply_nested_page_never_raises():
    """The never-raise contract holds on adversarial nesting depth:
    every DOM walker (text, serialize, markdown events, flatten) is
    iterative, so 3000-deep nesting degrades to a normal scrape
    instead of RecursionError killing the Arrow batch."""
    deep = "<div>" * 3000 + "x" + "</div>" * 3000
    r = scrape_one(deep, URL)
    assert r["success"] and r["text"] == "x"
    r2 = scrape_one(
        deep, URL, opts=ScrapeOptions(flatten_nested=True)
    )
    assert r2["success"] and r2["cleaned_html"] == "<div>x</div>"


def test_projection_matches_are_independent_copies():
    """css_selector / target_elements insert deep COPIES of matches
    (the reference reparses outerHTML / copy.deepcopy's them): a later
    removal pass on one occurrence must not corrupt another, and
    nested matches must not alias shared descendants."""
    html = '<div id="a"><div id="b">inner</div></div>'
    r = scrape_one(
        html,
        URL,
        opts=ScrapeOptions(css_selector="div", excluded_selector="#b"),
    )
    # both independent #b occurrences removed; #a's shell survives
    assert '<div id="a"></div>' in r["cleaned_html"]
    assert "inner" not in r["cleaned_html"]
    # target_elements copies: excluding inside the copy is consistent
    r2 = scrape_one(html, URL, opts=ScrapeOptions(target_elements=("#b",)))
    assert r2["cleaned_html"] == '<div><div id="b">inner</div></div>'
