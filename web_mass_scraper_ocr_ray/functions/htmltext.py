"""Visible-text extraction from raw HTML bytes — the hot kernel (M4).

Replaces the reference's per-URL headless-browser render
(``/root/reference/src/scraper_app/scraper.py:208-215``:
``page.query_selector('body').inner_text()`` then ``clean_text``) with an
in-process DOM walk over stdlib ``html.parser`` — no browser, no
subprocess, pure CPU per document.

``inner_text``-equivalence contract (what makes byte-identity achievable
— SURVEY.md §7.4.1): after ``clean_text`` collapses every whitespace run
to one space, the only observable properties are (a) the sequence of
non-whitespace character runs and (b) whether *any* whitespace separates
two adjacent runs. Therefore:

  - text nodes are concatenated verbatim within a segment;
  - block-level element boundaries and ``<br>``/``<hr>`` contribute a
    newline (any whitespace would do — it collapses to one space);
  - non-rendered subtrees contribute nothing: ``script``, ``style``,
    ``template``, ``noscript`` (JS-on browsers treat its content as raw
    text), ``head`` (and ``title``), ``iframe``, ``svg``;
  - elements with the ``hidden`` attribute, an inline ``display:none``
    / ``visibility:hidden`` style, or a class hidden by a
    SAME-DOCUMENT ``<style>`` block (simple ``.class`` selectors only
    — see ``hidden_classes_from_html``) are excluded, as rendered
    ``inner_text`` excludes them (there is no external-CSS cascade
    without a browser; fixtures pin this, FIXTURES.md §1);
  - a document with no content (or undecodable bytes) yields ""
    (reference empty-body fallback, scraper.py:212-214). Implicit-body
    semantics: anything outside ``head`` is body content, matching
    browser auto-body synthesis.

Image enumeration (M5, scraper.py:219-227): every ``<img>`` with a
non-empty ``src`` is collected in DOM order — including inside hidden
elements (the reference's ``query_selector_all('img')`` sees hidden
elements) but not inside ``template``/``noscript``/``script``/``style``
(not part of the queried DOM in a JS-on browser).

Spans: each emitted segment's [start, end) char offsets in the final
cleaned text plus its DOM path — the north_star's per-block span
requirement (BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .textclean import clean_text

# Non-rendered subtrees: no visible text AND no img enumeration.
_RAW_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})
# Additionally no visible text (but imgs inside are still DOM-visible).
_TEXT_SKIP_TAGS = frozenset({"head", "title", "iframe", "svg"})

# HTML5 void elements — never pushed on the open-element stack.
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# Block-level boundaries (CSS initial display != inline) — each one
# flushes the current text segment. Matches rendered line-box breaks.
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "caption",
    "center", "dd", "details", "dialog", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "html", "legend",
    "li", "main", "menu", "nav", "ol", "option", "p", "pre", "section",
    "summary", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul",
})

# Tags that implicitly close an open <p> (HTML5 parsing rules subset —
# enough to keep the open-element stack sane on real-world markup).
_P_CLOSERS = _BLOCK_TAGS - {"html", "body"}

# ---- same-document <style> class visibility -------------------------------
# A browser's inner_text also honors `<style>.x{display:none}</style>`
# classes (reference scraper.py:210-215 renders with the full cascade).
# This is the minimal no-browser approximation: collect class names from
# SIMPLE single-class selectors (`.foo`) whose rule body contains
# display:none / visibility:hidden, document-wide (a pre-scan, so style
# blocks after the element still apply, like real CSS). Compound
# selectors (`div.foo`, `.a .b`, pseudo-classes) are conservatively
# IGNORED — an unmatched rule never hides content that a browser would
# show. External stylesheets remain out of scope (SURVEY §7.4 fidelity
# bound: no network, no cascade).
import re as _re

_STYLE_BLOCK_RE = _re.compile(r"<\s*style\b[^>]*>(.*?)</\s*style\s*>",
                              _re.I | _re.S)
_CSS_COMMENT_RE = _re.compile(r"/\*.*?\*/", _re.S)
_CSS_RULE_RE = _re.compile(r"([^{}]+)\{([^{}]*)\}", _re.S)
_CLASS_SELECTOR_RE = _re.compile(r"\.([A-Za-z_][\w-]*)\Z")


def hidden_classes_from_html(s: str) -> frozenset:
    """Class names hidden by same-document ``<style>`` blocks."""
    if "<style" not in s and "<STYLE" not in s and "<Style" not in s:
        return frozenset()
    classes: set = set()
    for m in _STYLE_BLOCK_RE.finditer(s):
        css = _CSS_COMMENT_RE.sub("", m.group(1))
        for rm in _CSS_RULE_RE.finditer(css):
            body = rm.group(2).replace(" ", "").replace("\t", "").lower()
            if ("display:none" not in body
                    and "visibility:hidden" not in body):
                continue
            for part in rm.group(1).split(","):
                cm = _CLASS_SELECTOR_RE.match(part.strip())
                if cm:
                    classes.add(cm.group(1))
    return frozenset(classes)


def _class_hit(value: Optional[str], hidden_classes: frozenset) -> bool:
    return bool(value) and not hidden_classes.isdisjoint(value.split())


@dataclass
class Span:
    start: int
    end: int
    path: str


@dataclass
class ExtractResult:
    text: str
    spans: List[Span] = field(default_factory=list)
    images: List[str] = field(default_factory=list)  # raw src attrs, DOM order
    # embedded document payloads (north_star PDF routing): (ref, type
    # attr) per <embed src=...> / <object data=...>, DOM order. Same
    # visibility rule as images: seen inside hidden subtrees, not
    # inside script/style/template/noscript.
    docs: List[tuple] = field(default_factory=list)


class _VisibleTextParser(HTMLParser):
    """One-pass SAX walk accumulating (raw_segment, dom_path) pairs."""

    def __init__(self, hidden_classes: frozenset = frozenset()) -> None:
        super().__init__(convert_charrefs=True)
        self._hidden_classes = hidden_classes
        self._stack: List[str] = []
        self._raw_skip = 0     # inside script/style/template/noscript
        self._text_skip = 0    # inside head/hidden/etc. (imgs still seen)
        self._buf: List[str] = []
        self._buf_path: Optional[str] = None
        self.segments: List[Tuple[str, str]] = []
        self.images: List[str] = []
        self.docs: List[Tuple[str, str]] = []  # (ref, type_attr)
        # parallel stack of (raw_skip_delta, text_skip_delta) per element
        self._skip_deltas: List[Tuple[int, int]] = []

    # -- helpers -------------------------------------------------------
    def _path(self) -> str:
        return "/".join(self._stack) if self._stack else "body"

    def _flush(self) -> None:
        if self._buf:
            self.segments.append(("".join(self._buf), self._buf_path or "body"))
            self._buf = []
            self._buf_path = None

    def _is_hidden(self, attrs) -> bool:
        for name, value in attrs:
            if name == "hidden":
                return True
            if name == "style" and value:
                style = value.replace(" ", "").lower()
                if "display:none" in style or "visibility:hidden" in style:
                    return True
            if (name == "class" and self._hidden_classes
                    and _class_hit(value, self._hidden_classes)):
                return True
        return False

    # -- HTMLParser hooks ---------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "p" and self._stack and self._stack[-1] == "p" and tag in _P_CLOSERS:
            self.handle_endtag("p")

        if tag == "img":
            if not self._raw_skip:
                src = next((v for n, v in attrs if n == "src"), None)
                if src:  # empty/missing src skipped — scraper.py:226-227
                    self.images.append(src)
            return  # void
        if tag == "embed":
            if not self._raw_skip:
                src = next((v for n, v in attrs if n == "src"), None)
                if src:
                    typ = next((v for n, v in attrs if n == "type"), None)
                    self.docs.append((src, typ or ""))
            return  # void
        if tag == "object" and not self._raw_skip:
            data = next((v for n, v in attrs if n == "data"), None)
            if data:
                typ = next((v for n, v in attrs if n == "type"), None)
                self.docs.append((data, typ or ""))
            # NOT a return: <object> is a normal container — its
            # fallback content stays subject to the usual text rules.
        if tag == "br":
            if not (self._raw_skip or self._text_skip):
                self._buf.append("\n")
            return
        if tag == "hr":
            if not (self._raw_skip or self._text_skip):
                self._flush()
            return
        if tag in _VOID_TAGS:
            return

        hidden = self._is_hidden(attrs)
        # A display:none element is removed from the render tree entirely
        # — it is NOT a block boundary ("a<div style=display:none>x</div>b"
        # renders "ab"), so only visible blocks flush.
        if tag in _BLOCK_TAGS and not (self._raw_skip or self._text_skip) and not hidden:
            self._flush()

        raw_d = 1 if tag in _RAW_SKIP_TAGS else 0
        text_d = 1 if (tag in _TEXT_SKIP_TAGS or hidden) else 0
        self._raw_skip += raw_d
        self._text_skip += text_d
        self._stack.append(tag)
        self._skip_deltas.append((raw_d, text_d))

    def handle_startendtag(self, tag, attrs):
        # <img/>, <br/> etc. — same as start for voids; for non-void
        # self-closed tags treat as empty element (start+end).
        if tag in _VOID_TAGS or tag == "img":
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if tag not in self._stack:
            return  # stray end tag — lenient like a browser
        # pop until we close `tag` (auto-closes unclosed children)
        while self._stack:
            top = self._stack.pop()
            raw_d, text_d = self._skip_deltas.pop()
            if top in _BLOCK_TAGS and not (self._raw_skip or self._text_skip):
                self._flush()
            self._raw_skip -= raw_d
            self._text_skip -= text_d
            if top == tag:
                break

    def handle_data(self, data):
        if self._raw_skip or self._text_skip or not data:
            return
        if self._buf_path is None:
            self._buf_path = self._path()
        self._buf.append(data)

    def close(self):
        super().close()
        self._flush()


def extract_visible_text(html: Optional[bytes]) -> ExtractResult:
    """html bytes → (cleaned text, spans, image srcs).

    Guarantees ``result.text == clean_text(raw_inner_text)`` where
    raw_inner_text is the segment texts joined by newlines — i.e. the
    reference's ``clean_text(body.inner_text())`` contract
    (scraper.py:210-214), verified property-style in tests.
    """
    if not html:
        return ExtractResult(text="")
    if isinstance(html, memoryview):
        html = html.tobytes()
    text_str = html.decode("utf-8", errors="replace")
    parser = _VisibleTextParser(hidden_classes_from_html(text_str))
    try:
        parser.feed(text_str)
        parser.close()
    except Exception:
        # html.parser is lenient; treat a genuine parse explosion as an
        # empty page rather than a task failure (error-as-data, §7.4.5).
        return ExtractResult(text="")

    pieces: List[str] = []
    spans: List[Span] = []
    pos = 0
    for raw, path in parser.segments:
        cleaned = clean_text(raw)
        if not cleaned:
            continue
        if pieces:
            pos += 1  # the single joining space
        spans.append(Span(start=pos, end=pos + len(cleaned), path=path))
        pieces.append(cleaned)
        pos += len(cleaned)
    return ExtractResult(
        text=" ".join(pieces), spans=spans, images=parser.images,
        docs=parser.docs,
    )
