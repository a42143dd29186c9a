"""Main-content stage — boilerplate strip over pages, pyarrow in/out.

The north_star's DOM-heuristic path ("text-density + link-density
heuristics and tag-class blocklists ... scoring over a DOM-node feature
table", BASELINE.json): a stateless ``map_batches`` stage, zero
shuffles, html dropped at the parse — the same scale shape as the
extract stage. Two batch kernels:

  - ``main_content_batch``: one output row per page — url, the selected
    ``main_text``, kept-block spans, and per-reason drop counters (the
    counters make the heuristic auditable and oracle-checkable);
  - ``dom_features_batch``: the exploded DOM-block feature table — one
    row per rendered block with its features and its scored reason.
    This is the operator a corpus-quality pipeline aggregates over
    (e.g. boilerplate ratio per host) without re-parsing.

Both are pure per-batch transforms: at 100 TB each block of pages is
parsed once wherever it already lives; nothing is materialized or
broadcast.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..functions.maincontent import (
    DEFAULT_MAX_LINK_DENSITY,
    DEFAULT_MIN_CHARS,
    extract_main_content,
)
from .extract import SPAN_TYPE


def main_content_batch(
    batch: pa.Table,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    with_spans: bool = True,
) -> pa.Table:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()

    main_texts: List[str] = []
    spans_col: List[list] = []
    n_blocks: List[int] = []
    n_kept: List[int] = []
    n_bl: List[int] = []
    n_ld: List[int] = []
    n_short: List[int] = []
    for html in htmls:
        res = extract_main_content(
            html, min_chars=min_chars, max_link_density=max_link_density
        )
        main_texts.append(res.text)
        if with_spans:
            spans_col.append(
                [{"start": s.start, "end": s.end, "path": s.path}
                 for s in res.spans]
            )
        reasons = [b.reason for b in res.blocks]
        n_blocks.append(len(reasons))
        n_kept.append(sum(r == "kept" for r in reasons))
        n_bl.append(
            sum(r in ("blocklist_tag", "blocklist_class") for r in reasons)
        )
        n_ld.append(sum(r == "link_density" for r in reasons))
        n_short.append(sum(r == "too_short" for r in reasons))

    cols = {
        "url": pa.array(urls, pa.string()),
        "main_text": pa.array(main_texts, pa.string()),
        "main_len": pa.array([len(t) for t in main_texts], pa.int64()),
        "n_blocks": pa.array(n_blocks, pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "n_drop_blocklist": pa.array(n_bl, pa.int64()),
        "n_drop_linkdense": pa.array(n_ld, pa.int64()),
        "n_drop_short": pa.array(n_short, pa.int64()),
    }
    if with_spans:
        cols["spans"] = pa.array(spans_col, pa.list_(SPAN_TYPE))
    return pa.table(cols)


def dom_features_batch(
    batch: pa.Table,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> pa.Table:
    """Explode pages → one row per DOM block (the feature table)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()

    out_url: List[str] = []
    out_ix: List[int] = []
    out_tag: List[str] = []
    out_depth: List[int] = []
    out_tlen: List[int] = []
    out_llen: List[int] = []
    out_nlinks: List[int] = []
    out_heading: List[bool] = []
    out_reason: List[str] = []
    for url, html in zip(urls, htmls):
        res = extract_main_content(
            html, min_chars=min_chars, max_link_density=max_link_density
        )
        for ix, b in enumerate(res.blocks):
            out_url.append(url)
            out_ix.append(ix)
            out_tag.append(b.tag)
            out_depth.append(b.depth)
            out_tlen.append(b.text_len)
            out_llen.append(b.link_len)
            out_nlinks.append(b.n_links)
            out_heading.append(b.heading)
            out_reason.append(b.reason)

    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "block_ix": pa.array(out_ix, pa.int64()),
            "tag": pa.array(out_tag, pa.string()),
            "depth": pa.array(out_depth, pa.int64()),
            "text_len": pa.array(out_tlen, pa.int64()),
            "link_len": pa.array(out_llen, pa.int64()),
            "n_links": pa.array(out_nlinks, pa.int64()),
            "heading": pa.array(out_heading, pa.bool_()),
            "reason": pa.array(out_reason, pa.string()),
        }
    )


def extract_main_content_ds(
    ds,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    with_spans: bool = True,
    batch_size: Optional[int] = 256,
):
    """pages Dataset → main-content Dataset (stateless task stage)."""
    import functools

    return ds.map_batches(
        functools.partial(
            main_content_batch,
            min_chars=min_chars,
            max_link_density=max_link_density,
            with_spans=with_spans,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def dom_features_ds(
    ds,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    batch_size: Optional[int] = 256,
):
    """pages Dataset → exploded DOM-block feature Dataset."""
    import functools

    return ds.map_batches(
        functools.partial(
            dom_features_batch,
            min_chars=min_chars,
            max_link_density=max_link_density,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
