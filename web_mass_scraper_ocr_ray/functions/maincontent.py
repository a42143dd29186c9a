"""Main-content extraction — boilerplate strip via a DOM-block feature
table (north_star: "strip boilerplate via text-density + link-density
heuristics and tag-class blocklists ... scoring over a DOM-node feature
table").

The reference defines extraction as whole-body ``inner_text``
(``/root/reference/src/scraper_app/scraper.py:208-215``) — that contract
lives in ``htmltext``/``htmlfast`` and stays byte-identical. THIS module
is the engine's additive main-content path: the same single-pass
tokenizer walk, but emitting one feature row per rendered text block
(Readability/Boilerpipe-style) and selecting content blocks by
deterministic rules, so the result is independently recomputable by the
DuckDB oracle over the synthetic boilerplate corpus
(``sources/pages.py::synth_boilerplate_pages_table``).

Block model: a *block* is a maximal visible text run between block-level
element boundaries (same flush points as the extract kernel — htmlfast
``_BLOCK_TAGS``/``<hr>``). Each block carries:

  - ``tag``: nearest enclosing block-level tag at the time text starts;
  - ``depth``: open-element stack depth at that time;
  - ``text``: ``clean_text``-collapsed visible text (empty blocks are
    not emitted);
  - ``link_text``: the collapsed subset of the text inside ``<a>``;
  - ``n_links``: ``<a>`` openings while the block accumulates;
  - ``heading``: any enclosing ``h1``–``h6``;
  - ``bl_tag`` / ``bl_class``: any enclosing blocklisted tag, or any
    enclosing element whose class/id contains a blocklisted token.

Scoring (first matching reason wins — the precedence is part of the
oracle contract):

  1. ``blocklist_tag``   — inside nav/header/footer/aside/form;
  2. ``blocklist_class`` — class/id token in ``BLOCKLIST_TOKENS``
     (tokens split on non-alphanumerics, so ``site-footer`` hits);
  3. ``link_density``    — len(link_text) > max_link_density*len(text)
     (navigation lists: almost all text is anchor text);
  4. ``too_short``       — len(text) < min_chars and not a heading
     (stray labels/buttons; headings are kept as structure);
  5. ``kept``.

``main_text`` is the space-join of kept blocks in DOM order — the same
join/collapse contract as the whole-page extractor, so the two paths
compose with the downstream text stages unchanged.

Hidden subtrees (``hidden`` attr, inline display:none/visibility:hidden)
and raw containers (script/style/template/noscript) contribute nothing,
exactly as in the extract kernel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from typing import List, Optional

from .htmlfast import (
    _RAW_CLOSERS,
    _TOKEN_RE,
    _is_hidden_attrs,
    _iter_attrs,
)
from .htmltext import (
    _BLOCK_TAGS,
    _RAW_SKIP_TAGS,
    _TEXT_SKIP_TAGS,
    _VOID_TAGS,
    Span,
)
from .textclean import clean_text

# Structural boilerplate containers (CSS-free approximation of the
# fixed-chrome regions every content extractor drops first).
BLOCKLIST_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# class/id vocabulary of page chrome — matched on whole tokens after
# splitting on non-alphanumerics ("site-footer" → {"site","footer"}).
BLOCKLIST_TOKENS = frozenset({
    "nav", "navbar", "navigation", "menu", "footer", "header", "sidebar",
    "comment", "comments", "breadcrumb", "breadcrumbs", "related",
    "share", "social", "widget", "ad", "ads", "advert", "advertisement",
    "banner", "promo", "cookie", "copyright", "pagination", "pager",
    "masthead", "byline", "disclaimer",
})

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")
_CLASSID_PRECHECK = re.compile(r"class|id", re.I)

DEFAULT_MIN_CHARS = 25
DEFAULT_MAX_LINK_DENSITY = 1.0 / 3.0

DROP_REASONS = (
    "kept", "blocklist_tag", "blocklist_class", "link_density", "too_short",
)


def _classid_blocklisted(attrs: str) -> bool:
    """True iff any whole token of the element's class or id attribute
    is in BLOCKLIST_TOKENS."""
    if not attrs or not _CLASSID_PRECHECK.search(attrs):
        return False
    for name, value in _iter_attrs(attrs):
        if name in ("class", "id") and value:
            for tok in _TOKEN_SPLIT.split(value.lower()):
                if tok and tok in BLOCKLIST_TOKENS:
                    return True
    return False


@dataclass
class Block:
    """One row of the DOM-block feature table."""

    text: str
    link_text: str
    tag: str
    depth: int
    n_links: int
    heading: bool
    bl_tag: bool
    bl_class: bool
    reason: str = "kept"  # filled by score_block

    @property
    def text_len(self) -> int:
        return len(self.text)

    @property
    def link_len(self) -> int:
        return len(self.link_text)


@dataclass
class MainContentResult:
    text: str
    spans: List[Span] = field(default_factory=list)
    blocks: List[Block] = field(default_factory=list)


def score_block(
    b: Block,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> str:
    if b.bl_tag:
        return "blocklist_tag"
    if b.bl_class:
        return "blocklist_class"
    if len(b.link_text) > max_link_density * len(b.text):
        return "link_density"
    if len(b.text) < min_chars and not b.heading:
        return "too_short"
    return "kept"


def segment_blocks(html: Optional[bytes]) -> List[Block]:
    """Single-pass scan of raw HTML bytes → DOM-block feature rows."""
    if not html:
        return []
    if isinstance(html, memoryview):
        html = html.tobytes()
    s = html.decode("utf-8", errors="replace")

    stack: List[str] = []
    # per-level deltas, popped together with the tag
    d_hidden: List[int] = []
    d_bltag: List[int] = []
    d_blclass: List[int] = []
    d_heading: List[int] = []
    d_anchor: List[int] = []

    text_skip = 0
    bltag = 0
    blclass = 0
    heading = 0
    anchor = 0

    buf: List[str] = []
    linkbuf: List[str] = []
    n_links = 0
    cur_meta: Optional[tuple] = None  # (tag, depth, heading, bl_tag, bl_class)
    blocks: List[Block] = []

    def nearest_block_tag() -> str:
        for t in reversed(stack):
            if t in _BLOCK_TAGS:
                return t
        return "body"

    def flush():
        nonlocal buf, linkbuf, n_links, cur_meta
        if buf:
            text = clean_text("".join(buf))
            if text:
                tag, depth, hd, bt, bc = cur_meta or ("body", 0, False, False, False)
                blocks.append(
                    Block(
                        text=text,
                        link_text=clean_text("".join(linkbuf)),
                        tag=tag,
                        depth=depth,
                        n_links=n_links,
                        heading=hd,
                        bl_tag=bt,
                        bl_class=bc,
                    )
                )
        buf = []
        linkbuf = []
        n_links = 0
        cur_meta = None

    def add_text(chunk: str):
        nonlocal cur_meta
        if not chunk or text_skip:
            return
        if "&" in chunk:
            chunk = unescape(chunk)
        if cur_meta is None:
            cur_meta = (
                nearest_block_tag(),
                len(stack),
                heading > 0,
                bltag > 0,
                blclass > 0,
            )
        buf.append(chunk)
        if anchor:
            linkbuf.append(chunk)

    pos = 0
    n = len(s)
    while pos < n:
        m = _TOKEN_RE.search(s, pos)
        if m is None:
            add_text(s[pos:])
            break
        if m.start() > pos:
            add_text(s[pos : m.start()])
        pos = m.end()
        closing, tag, attrs = m.group(1), m.group(2), m.group(3)
        if tag is None:
            continue
        tag = tag.lower()

        if not closing:
            if tag == "br":
                if not text_skip:
                    buf.append("\n")
                    if anchor:
                        linkbuf.append("\n")
                continue
            if tag == "hr":
                if not text_skip:
                    flush()
                continue
            if tag in _VOID_TAGS:
                continue
            if tag in _RAW_SKIP_TAGS:
                cm = _RAW_CLOSERS[tag].search(s, pos)
                pos = cm.end() if cm else n
                continue

            attrs = attrs or ""
            hidden = _is_hidden_attrs(attrs)
            self_closing = bool(attrs) and attrs.rstrip().endswith("/")

            if tag == "p" and stack and stack[-1] == "p":
                # HTML5 implicit </p>
                stack.pop()
                text_skip -= d_hidden.pop()
                bltag -= d_bltag.pop()
                blclass -= d_blclass.pop()
                heading -= d_heading.pop()
                anchor -= d_anchor.pop()
                if not text_skip:
                    flush()
            if tag in _BLOCK_TAGS and not text_skip and not hidden:
                flush()
            if tag == "a" and not text_skip and not hidden:
                n_links += 1
            if self_closing:
                continue
            text_d = 1 if (tag in _TEXT_SKIP_TAGS or hidden) else 0
            text_skip += text_d
            bt = 1 if tag in BLOCKLIST_TAGS else 0
            bltag += bt
            bc = 1 if _classid_blocklisted(attrs) else 0
            blclass += bc
            hd = 1 if tag in _HEADING_TAGS else 0
            heading += hd
            an = 1 if tag == "a" else 0
            anchor += an
            stack.append(tag)
            d_hidden.append(text_d)
            d_bltag.append(bt)
            d_blclass.append(bc)
            d_heading.append(hd)
            d_anchor.append(an)
        else:
            if tag in _VOID_TAGS or tag not in stack:
                continue
            while stack:
                top = stack.pop()
                td = d_hidden.pop()
                if top in _BLOCK_TAGS and not text_skip:
                    flush()
                text_skip -= td
                bltag -= d_bltag.pop()
                blclass -= d_blclass.pop()
                heading -= d_heading.pop()
                anchor -= d_anchor.pop()
                if top == tag:
                    break

    flush()
    return blocks


def extract_main_content(
    html: Optional[bytes],
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> MainContentResult:
    """Segment → score → select. Kept blocks join with single spaces
    (same contract as the whole-page extractor), spans index into the
    joined text."""
    blocks = segment_blocks(html)
    pieces: List[str] = []
    spans: List[Span] = []
    out_pos = 0
    for b in blocks:
        b.reason = score_block(b, min_chars, max_link_density)
        if b.reason != "kept":
            continue
        if pieces:
            out_pos += 1
        spans.append(Span(start=out_pos, end=out_pos + len(b.text), path=b.tag))
        pieces.append(b.text)
        out_pos += len(b.text)
    return MainContentResult(text=" ".join(pieces), spans=spans, blocks=blocks)
