"""Hyperlink (``<a href>``) extraction — the outlink side of the web
graph.

The reference walks the DOM only for images and embedded documents
(`/root/reference/src/scraper_app/scraper.py:222-275` collects
``<img>`` tags); a 100 TB training-data pipeline ALSO needs the link
graph (per-host in/out-degree, PageRank-style quality priors, crawl
frontier expansion). This module is the crawler-style raw href scan:
it reads every ``<a href=...>`` in document order, visibility-agnostic
(crawlers follow hidden links too), so it deliberately does NOT extend
the byte-identity ``ExtractResult`` contract of the visible-text
extractors.

All scanning is compiled-regex over the decoded page; the per-batch
entry explodes pages → one row per link with the absolute target URL
(resolved with the same M2 resolver the image path uses) and the
target host, ready for the host-graph rollup.
"""

from __future__ import annotations

import re
from html import unescape
from typing import List, Optional
from urllib.parse import urlparse

import pyarrow as pa

from .urltools import construct_absolute_url

# <a ... href="x" | 'x' | x> — first href attribute per anchor tag, in
# document order. Comments/scripts are rare carriers of literal anchor
# markup; a raw scan over them matches crawler behavior and stays
# deterministic, which is the contract here.
_HREF_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_hrefs(html: Optional[bytes]) -> List[str]:
    """All ``<a href>`` values of one page, document order, unescaped."""
    if not html:
        return []
    if isinstance(html, memoryview):
        html = html.tobytes()
    s = html.decode("utf-8", errors="replace")
    out: List[str] = []
    for m in _HREF_RE.finditer(s):
        v = m.group(1)
        if v is None:
            v = m.group(2) if m.group(2) is not None else m.group(3)
        if v:
            out.append(unescape(v))
    return out


def host_of(url: Optional[str]) -> str:
    """Lowercased netloc ('' when unparseable) — the graph node key."""
    if not url:
        return ""
    try:
        return urlparse(url).netloc.lower()
    except Exception:
        return ""


def links_batch(t: pa.Table, url_col: str = "url",
                html_col: str = "html") -> pa.Table:
    """Pages batch → exploded outlink rows.

    → (src_url, src_host, link_idx, href, dst_url, dst_host,
    cross_host) — one row per anchor, ``link_idx`` = document position
    (makes rows unique and order-checkable). Unresolvable hrefs keep
    ``dst_url``/``dst_host`` as '' so poison pages stay rows, never
    task errors.
    """
    src_urls = t.column(url_col).to_pylist()
    htmls = t.column(html_col).to_pylist()
    o_src: List[str] = []
    o_idx: List[int] = []
    o_href: List[str] = []
    o_dst: List[str] = []
    for u, h in zip(src_urls, htmls):
        for i, href in enumerate(extract_hrefs(h)):
            o_src.append(u)
            o_idx.append(i)
            o_href.append(href)
            o_dst.append(construct_absolute_url(href, u) or "")
    o_shost = [host_of(u) for u in o_src]
    o_dhost = [host_of(u) for u in o_dst]
    return pa.table({
        "src_url": pa.array(o_src, pa.string()),
        "src_host": pa.array(o_shost, pa.string()),
        "link_idx": pa.array(o_idx, pa.int64()),
        "href": pa.array(o_href, pa.string()),
        "dst_url": pa.array(o_dst, pa.string()),
        "dst_host": pa.array(o_dhost, pa.string()),
        "cross_host": pa.array(
            [a != b for a, b in zip(o_shost, o_dhost)], pa.bool_()
        ),
    })


# closing-tag scan for anchor INNER TEXT (nested inline tags stripped)
_A_CLOSE_RE = re.compile(r"</a\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_anchors(html: Optional[bytes]) -> List[tuple]:
    """(href, anchor_text) per ``<a href>`` in document order.

    Anchor text = everything between the opening tag and the nearest
    ``</a>``, inner tags stripped, entities unescaped, whitespace
    collapsed — the link-label signal (anchor-text aggregation per
    target is a classic web-corpus feature: it describes the TARGET
    page in the words of the linking page)."""
    if not html:
        return []
    if isinstance(html, memoryview):
        html = html.tobytes()
    s = html.decode("utf-8", errors="replace")
    out: List[tuple] = []
    for m in _HREF_RE.finditer(s):
        v = m.group(1)
        if v is None:
            v = m.group(2) if m.group(2) is not None else m.group(3)
        if not v:
            continue
        gt = s.find(">", m.end())
        if gt < 0:
            text = ""
        else:
            cm = _A_CLOSE_RE.search(s, gt + 1)
            raw = s[gt + 1: cm.start()] if cm else ""
            text = _WS_RE.sub(" ", unescape(_TAG_RE.sub("", raw))).strip()
        out.append((unescape(v), text))
    return out


def anchors_batch(t: pa.Table, url_col: str = "url",
                  html_col: str = "html") -> pa.Table:
    """Pages batch → exploded (src_url, link_idx, anchor_text,
    dst_url, dst_host) rows — links_batch plus the link label."""
    src_urls = t.column(url_col).to_pylist()
    htmls = t.column(html_col).to_pylist()
    o_src: List[str] = []
    o_idx: List[int] = []
    o_text: List[str] = []
    o_dst: List[str] = []
    for u, h in zip(src_urls, htmls):
        for i, (href, text) in enumerate(extract_anchors(h)):
            o_src.append(u)
            o_idx.append(i)
            o_text.append(text)
            o_dst.append(construct_absolute_url(href, u) or "")
    return pa.table({
        "src_url": pa.array(o_src, pa.string()),
        "link_idx": pa.array(o_idx, pa.int64()),
        "anchor_text": pa.array(o_text, pa.string()),
        "dst_url": pa.array(o_dst, pa.string()),
        "dst_host": pa.array([host_of(u) for u in o_dst], pa.string()),
    })
