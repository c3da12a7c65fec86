"""Byte-parity golden tests for the markdown stage.

Fixtures in tests/fixtures/markdown_golden.json were captured from the
reference's conversion engine (CustomHTML2Text with the
DefaultMarkdownGenerator option set — markdown_generation_strategy.py:
181-190) over hand fixtures + the synthetic page corpus. The converter
must match every expected output byte-for-byte.
"""

from __future__ import annotations

import json
import os

import pytest

from crawl4ai_spark.functions.markdown import html_to_markdown, links_to_citations

FIXTURES = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures", "markdown_golden.json"))
)


@pytest.mark.parametrize("i", range(len(FIXTURES)))
def test_markdown_byte_parity(i):
    fx = FIXTURES[i]
    got = html_to_markdown(fx["html"], fx["base"])
    assert got == fx["expected"], (
        f"fixture {i} mismatch\nhtml: {fx['html'][:120]!r}\n"
        f"want: {fx['expected'][:200]!r}\ngot : {got[:200]!r}"
    )


def test_citations_numbering_and_refs():
    md = (
        "[A](/a) then [B](https://x.com/b \"TB\") then [A again](/a) "
        "and ![Img](/i.png)"
    )
    cit, refs = links_to_citations(md, "https://host.com/base/")
    assert cit == "A⟨1⟩ then B⟨2⟩ then A again⟨1⟩ and ![Img⟨3⟩]"
    assert refs == (
        "\n\n## References\n\n"
        "⟨1⟩ https://host.com/base/a: A\n"
        "⟨2⟩ https://x.com/b: TB - B\n"
        "⟨3⟩ https://host.com/base/i.png: Img\n"
    )


def test_citations_title_equals_text():
    cit, refs = links_to_citations('[T](/x "T")', "https://h.com")
    assert cit == "T⟨1⟩"
    assert refs.endswith("⟨1⟩ https://h.com/x: T\n")


def test_citations_no_links():
    cit, refs = links_to_citations("plain text", "https://h.com")
    assert cit == "plain text"
    assert refs == "\n\n## References\n\n"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/crawl4ai/html2text/__init__.py"),
    reason="reference converter not available",
)
def test_differential_vs_reference_converter():
    """When the vendored reference converter loads, differential-check a
    fresh set of inputs (not just the frozen fixtures)."""
    import importlib.util
    import sys

    pkg_dir = "/root/reference/crawl4ai/html2text"
    # fresh, collision-proof module identity: an earlier test run (or
    # residue of a prior failed import) must never leave a half-built
    # "ref_html2text" package that poisons the relative imports inside
    # exec_module — and if the import STILL fails while the reference
    # exists, that is an error, not a silent skip (this differential is
    # the byte-parity evidence; round 3 lost it to a silent skip)
    mod_name = f"ref_html2text_{os.getpid()}"
    for stale in [k for k in sys.modules if k.startswith("ref_html2text")]:
        del sys.modules[stale]
    spec = importlib.util.spec_from_file_location(
        mod_name, pkg_dir + "/__init__.py",
        submodule_search_locations=[pkg_dir],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        raise AssertionError(
            f"reference converter exists but failed to import: "
            f"{type(e).__name__}: {e}"
        ) from e
    finally:
        for k in [k for k in sys.modules if k.startswith(mod_name)]:
            del sys.modules[k]

    def ref_conv(html, base):
        h = mod.CustomHTML2Text(baseurl=base)
        h.update_params(
            body_width=0, ignore_emphasis=False, ignore_links=False,
            ignore_images=False, protect_links=False, single_line_break=True,
            mark_code=True, escape_snob=False,
        )
        return h.handle(html).replace("    ```", "```")

    base = "https://diff.example.org/a/b.html"
    cases = [
        f"<h{n}>lvl {n}</h{n}><p>body {n} with <a href='/l{n}'>l{n}</a></p>"
        for n in range(1, 7)
    ] + [
        "<ul>" + "".join(f"<li>item {i}</li>" for i in range(10)) + "</ul>",
        "<p>" + " ".join(f"w{i}" for i in range(200)) + "</p>",
        "<table>" + "".join(
            f"<tr><td>r{i}a</td><td>r{i}b</td></tr>" for i in range(5)
        ) + "</table>",
        # malformed/unbalanced tags — the reference's quiet counter goes
        # NEGATIVE on a stray close tag and negative quiet suppresses
        # (html2text gates on `not self.quiet`); pinned after an r5
        # review found our emitter only suppressed quiet > 0
        "</script>text1<script>var x=1;</script>text2",
        "</style>s1<style>.x{}</style>s2",
        "</blockquote><p>hello</p><p>world</p>",
        "<blockquote><blockquote>a<br>b</blockquote></blockquote>",
    ]
    for c in cases:
        assert html_to_markdown(c, base) == ref_conv(c, base)


def test_huge_numeric_charref_never_crashes():
    """chr() raises OverflowError (not ValueError) past the C int
    range; `&#99999999999999999999;` must degrade, not kill the
    Arrow batch."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    out = html_to_markdown("<p>x &#99999999999999999999; y</p>", "http://x/")
    assert "x" in out and "y" in out
