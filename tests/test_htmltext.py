"""Visible-text extractor (M4/M5) — inner_text-equivalence contract.

Fixture families per FIXTURES.md §1; the invariant under test is
``text == clean_text(raw inner_text)`` byte-for-byte (scraper.py:210-214).
"""

from hypothesis import given, strategies as st

from web_mass_scraper_ocr_ray.functions.htmltext import extract_visible_text
from web_mass_scraper_ocr_ray.functions.textclean import clean_text


def text_of(html: bytes) -> str:
    return extract_visible_text(html).text


class TestPlain:
    def test_paragraphs(self):
        assert text_of(b"<body><p>one</p><p>two</p></body>") == "one two"

    def test_empty_doc(self):
        assert text_of(b"") == ""
        assert text_of(None) == ""

    def test_no_body_implicit(self):
        # browsers synthesize <body>; fragment text is rendered
        assert text_of(b"<html><p>hi</p></html>") == "hi"
        assert text_of(b"just text") == "just text"

    def test_empty_body(self):
        assert text_of(b"<html><body></body></html>") == ""


class TestWhitespace:
    def test_runs_collapse(self):
        assert text_of(b"<p>a \t\n  b</p>") == "a b"

    def test_nbsp_entity(self):
        assert text_of("<p>a&nbsp;&nbsp;b</p>".encode()) == "a b"

    def test_leading_trailing(self):
        assert text_of(b"  <p>  a  </p>  ") == "a"


class TestSkipTags:
    def test_script_style_head_template_noscript(self):
        html = (
            b"<html><head><title>T</title><style>p{}</style>"
            b"<script>var x='S';</script></head>"
            b"<body><template><p>tpl</p></template>"
            b"<noscript>ns</noscript>visible</body></html>"
        )
        assert text_of(html) == "visible"

    def test_comments_excluded(self):
        assert text_of(b"<p>a<!-- comment -->b</p>") == "ab"

    def test_hidden_attr(self):
        assert text_of(b"<div hidden>x</div><div>y</div>") == "y"

    def test_display_none_inline(self):
        assert text_of(b'a<span style="display: NONE">x</span>b') == "ab"

    def test_visibility_hidden(self):
        assert text_of(b'<div style="visibility:hidden">x</div>y') == "y"

    def test_nested_visible_inside_hidden_stays_hidden(self):
        # no inline `visibility:visible` re-reveal support — documented
        assert text_of(b'<div hidden><p>x</p></div>y') == "y"

    def test_svg_iframe(self):
        assert text_of(b"<svg><text>sv</text></svg>ok<iframe>if</iframe>") == "ok"


class TestStyleBlockClasses:
    """Same-document <style> .class{display:none} map (VERDICT r2 #3).

    A browser's inner_text honors the full CSS cascade (reference
    scraper.py:210-215); the no-browser approximation applies SIMPLE
    single-class selectors only, document-wide.
    """

    def test_display_none_class(self):
        html = b'<style>.gone{display:none}</style><p class="gone">x</p><p>y</p>'
        assert text_of(html) == "y"

    def test_visibility_hidden_class(self):
        html = b'<style>.h{visibility: hidden;}</style><span class="h">x</span>y'
        assert text_of(html) == "y"

    def test_style_block_after_element_still_applies(self):
        # CSS is document-wide, not positional
        html = b'<p class="gone">x</p><style>.gone{display:none}</style><p>y</p>'
        assert text_of(html) == "y"

    def test_class_token_list(self):
        html = b'<style>.gone{display:none}</style><p class="a gone b">x</p>y'
        assert text_of(html) == "y"

    def test_token_match_not_substring(self):
        html = b'<style>.gone{display:none}</style><p class="gonezo">kept</p>'
        assert text_of(html) == "kept"

    def test_comma_selector_list(self):
        html = b'<style>.a,.b{display:none}</style><p class=a>x</p><p class=b>y</p>z'
        assert text_of(html) == "z"

    def test_compound_selectors_hide(self):
        # r4: tag.class / .a.b / #id / descendant chains are honored
        assert text_of(
            b'<style>div.c{display:none}</style>'
            b'<div class="c">gone</div><span class="c">kept</span>'
        ) == "kept"
        assert text_of(
            b'<style>.a.b{display:none}</style>'
            b'<p class="a b">gone</p><p class="a">kept</p>'
        ) == "kept"
        assert text_of(
            b'<style>#x{display:none}</style>'
            b'<p id="x">gone</p><p id="y">kept</p>'
        ) == "kept"
        assert text_of(
            b'<style>aside{display:none}</style>'
            b'<aside>gone</aside><p>kept</p>'
        ) == "kept"
        assert text_of(
            b'<style>.nav .item{display:none}</style>'
            b'<div class="nav"><span class="item">gone</span></div>'
            b'<span class="item">kept</span>'
        ) == "kept"
        # deep descendant: any ancestor, not just the parent
        assert text_of(
            b'<style>div.nav p.x{display:none}</style>'
            b'<div class="nav"><section><p class="x">gone</p></section></div>'
            b'<p class="x">kept</p>'
        ) == "kept"

    def test_unsupported_selector_conservatively_ignored(self):
        # pseudo-classes / child combinators / attribute selectors never
        # hide (would need a real cascade) — under-hiding only
        assert text_of(
            b'<style>p:hover{display:none}</style><p>kept</p>'
        ) == "kept"
        assert text_of(
            b'<style>.a > .b{display:none}</style>'
            b'<div class="a"><p class="b">kept</p></div>'
        ) == "kept"
        assert text_of(
            b'<style>[hidden]{display:none}</style><p>kept</p>'
        ) == "kept"
        # one unsupported selector in a comma list doesn't kill the rest
        assert text_of(
            b'<style>p:first-child,.z{display:none}</style>'
            b'<p class="z">gone</p><p>kept</p>'
        ) == "kept"

    def test_external_stylesheet_resolver(self):
        from web_mass_scraper_ocr_ray.functions.htmltext import (
            extract_visible_text,
        )

        html = (
            b'<link rel="stylesheet" href="/site.css">'
            b'<div class="cookie-banner">gone</div><p>kept</p>'
        )
        css = {"/site.css": ".cookie-banner{display:none}"}
        # resolver supplied → external hide-rules honored
        assert extract_visible_text(html, css_resolver=css.get).text == "kept"
        # no resolver (default) → external sheet invisible, under-hides
        assert extract_visible_text(html).text == "gone kept"
        # unresolvable href contributes nothing
        assert extract_visible_text(
            html, css_resolver={}.get).text == "gone kept"

    def test_non_hiding_rule_ignored(self):
        html = b'<style>.red{color:red}</style><p class="red">kept</p>'
        assert text_of(html) == "kept"

    def test_css_comment_stripped(self):
        html = (
            b"<style>/* .fake{display:none} */ .real{display:none}</style>"
            b'<p class="fake">a</p><p class="real">b</p>'
        )
        assert text_of(html) == "a"

    def test_hidden_class_imgs_still_enumerated(self):
        # query_selector_all('img') sees hidden elements (scraper.py:219)
        from web_mass_scraper_ocr_ray.functions.htmltext import extract_visible_text

        html = (
            b'<style>.g{display:none}</style>'
            b'<div class="g"><img src="h.png"></div><img src="v.png">'
        )
        r = extract_visible_text(html)
        assert r.text == ""
        assert r.images == ["h.png", "v.png"]


class TestNested:
    def test_inline_no_space_inserted(self):
        assert text_of(b"a<b>b</b><i>c</i>d") == "abcd"

    def test_block_boundary_is_space_after_clean(self):
        assert text_of(b"<div>a</div><div>b</div>") == "a b"

    def test_br(self):
        assert text_of(b"a<br>b<br/>c") == "a b c"

    def test_hr(self):
        assert text_of(b"a<hr>b") == "a b"

    def test_deep_nesting(self):
        assert (
            text_of(b"<div><div><span>a</span><div>b</div></div>c</div>") == "a b c"
        )

    def test_lists_and_tables(self):
        assert text_of(b"<ul><li>a</li><li>b</li></ul>") == "a b"
        assert (
            text_of(b"<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
            == "a b c"
        )

    def test_unclosed_p_autocloses(self):
        assert text_of(b"<p>a<p>b") == "a b"

    def test_stray_end_tag_ignored(self):
        assert text_of(b"a</div>b") == "ab"

    def test_interleaved_inline_and_block(self):
        assert text_of(b"a<div>b</div>c") == "a b c"


class TestUnicode:
    def test_umlauts_emoji_cjk(self):
        assert text_of("<p>grüße 😀 中文</p>".encode()) == "grüße 😀 中文"

    def test_invalid_utf8_replaced(self):
        out = text_of(b"<p>a\xff\xfeb</p>")
        assert out.startswith("a") and out.endswith("b")

    def test_charrefs(self):
        assert text_of(b"<p>&lt;x&gt; &amp; &#65;</p>") == "<x> & A"


class TestSpans:
    def test_offsets_slice_text(self):
        r = extract_visible_text(b"<h1>head</h1><p>body text</p>")
        assert [r.text[s.start:s.end] for s in r.spans] == ["head", "body text"]

    def test_paths_reflect_dom(self):
        r = extract_visible_text(b"<body><div><p>x</p></div></body>")
        assert r.spans[0].path.endswith("div/p")

    def test_spans_cover_disjoint_ranges(self):
        r = extract_visible_text(b"<p>a</p><p>b</p><p>c</p>")
        for prev, cur in zip(r.spans, r.spans[1:]):
            assert prev.end < cur.start


class TestImages:
    def test_dom_order_and_src_skip(self):
        html = (
            b'<img src="1.png"><p><img src=""></p>'
            b'<img src="2.png"/><img>'
        )
        assert extract_visible_text(html).images == ["1.png", "2.png"]

    def test_imgs_in_hidden_still_enumerated(self):
        # query_selector_all('img') sees hidden elements (scraper.py:219)
        html = b'<div hidden><img src="h.png"></div><img src="v.png">'
        assert extract_visible_text(html).images == ["h.png", "v.png"]

    def test_imgs_in_template_not_enumerated(self):
        html = b'<template><img src="t.png"></template><img src="v.png">'
        assert extract_visible_text(html).images == ["v.png"]

    def test_img_contributes_no_text(self):
        assert text_of(b'a<img src="x.png" alt="ALTTEXT">b') == "ab"


# -- property: the byte-identity contract itself -------------------------

# block-level only: each element is its own segment (inline concatenation
# is pinned by TestNested.test_inline_no_space_inserted)
_tags = st.sampled_from(["p", "div", "li", "h2", "td", "section"])
_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="<>&"),
    max_size=30,
)


@st.composite
def _html_docs(draw):
    n = draw(st.integers(1, 8))
    parts = []
    raw_segments = []
    for _ in range(n):
        tag = draw(_tags)
        txt = draw(_texts)
        parts.append(f"<{tag}>{txt}</{tag}>")
        raw_segments.append(txt)
    return "".join(parts).encode(), raw_segments


@given(_html_docs())
def test_property_clean_of_segments_equals_text(doc):
    """text == clean_text of segments joined by newlines — the exact
    reduction that makes browser-free byte-identity possible."""
    html, segments = doc
    result = extract_visible_text(html)
    assert result.text == clean_text("\n".join(segments))


@given(_html_docs())
def test_property_spans_reconstruct_text(doc):
    html, _ = doc
    r = extract_visible_text(html)
    rebuilt = " ".join(r.text[s.start:s.end] for s in r.spans)
    assert rebuilt == r.text
