"""Extract stage — HTML bytes → text/spans/image-refs, pyarrow in/out.

The Ray-Data expression of the reference's per-URL kernel
(``scrape_page`` text phase, scraper.py:122-327): one vectorized
``map_batches(extract_batch, batch_format="pyarrow")`` replaces the
per-URL browser launch. Per-row errors become columns, never task
failures (error-as-data — main.py:442-459, SURVEY.md §7.4.5).

Covers operators M1 (validate), M2 (absolute-URL resolve), M3
(clean_text), M4 (visible-text walk), M5 (image enumeration), M9/M10
(text metadata / envelope) from SURVEY.md §2.2.

Scale notes: the per-document DOM parse is irreducibly Python, so the
batch loop is over rows *of this one column* while every derived column
is assembled once per batch into Arrow arrays (no per-row Python dict
churn downstream). ``html`` is dropped right here — multi-MB binary
payloads never travel past the parse (SURVEY.md §7.4.4).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.htmltext import extract_visible_text
from ..functions.textclean import create_text_metadata
from ..functions.urltools import (
    construct_absolute_url,
    normalize_hostname,
    validate_url,
)

# Image-ref payload kinds routed by the OCR stage (S6/S7 analogs).
KIND_DATA = "data"       # data:<mime>;base64,... — in-band payload
KIND_REMOTE = "remote"   # http(s) ref — offline: download-failed path
KIND_INVALID = "invalid" # unconstructable absolute URL (scraper.py:230-234)

IMAGE_REF_TYPE = pa.struct(
    [("image_url", pa.string()), ("src", pa.string()), ("payload_kind", pa.string())]
)
SPAN_TYPE = pa.struct(
    [("start", pa.int64()), ("end", pa.int64()), ("path", pa.string())]
)


def classify_image_ref(src: str, page_url: str) -> dict:
    """src attr → routed image ref. scraper.py:229-234 + utils.py:19-30."""
    absolute = construct_absolute_url(src, page_url)
    if not absolute:
        return {"image_url": src, "src": src, "payload_kind": KIND_INVALID}
    if absolute.startswith("data:"):
        return {"image_url": absolute, "src": src, "payload_kind": KIND_DATA}
    return {"image_url": absolute, "src": src, "payload_kind": KIND_REMOTE}


def extract_row(url: str, html) -> dict:
    """Pure per-row kernel — also the Ray-free golden oracle (FIXTURES.md §3)."""
    is_valid, reason = validate_url(url)
    if not is_valid:
        # InvalidURLError routing — main.py:405-407, exceptions.py:12-15
        return {
            "hostname": normalize_hostname(url if isinstance(url, str) else ""),
            "text": "",
            "spans": [],
            "images": [],
            "text_length": 0,
            "word_count": 0,
            "paragraph_count": 0,
            "status": "failed",
            "error_type": "InvalidURL",
            "error_message": reason,
        }
    result = extract_visible_text(html)
    meta = create_text_metadata(result.text)
    return {
        "hostname": normalize_hostname(url),
        "text": result.text,
        "spans": [
            {"start": s.start, "end": s.end, "path": s.path} for s in result.spans
        ],
        "images": [classify_image_ref(src, url) for src in result.images],
        "text_length": meta["text_length"],
        "word_count": meta["word_count"],
        "paragraph_count": meta["paragraph_count"],
        "status": "completed",
        "error_type": "",
        "error_message": "",
    }


def extract_batch_sliced(batch: pa.Table,
                         byte_budget: int = 8 * 1024 * 1024) -> pa.Table:
    """Skew/memory-bounded extract (§4.4): process the batch in slices
    whose summed html bytes stay under ``byte_budget``, so a batch that
    happens to contain several multi-MB pages never materializes all
    their parse output at once. One output table per input batch.

    Straggler bounding comes from block sizing (a task = a block ≤
    DataContext.target_max_block_size of html bytes); this wrapper
    bounds the *heap*, which row-count batching alone cannot (512 rows
    × 100 MB pages = 50 GB)."""
    lens = pc.binary_length(batch.column("html")).to_pylist()
    out_parts = []
    start = 0
    acc = 0
    n = batch.num_rows
    for i in range(n):
        acc += (lens[i] or 0)
        if acc >= byte_budget and i + 1 > start:
            out_parts.append(extract_batch(batch.slice(start, i + 1 - start)))
            start, acc = i + 1, 0
    if start < n:
        out_parts.append(extract_batch(batch.slice(start, n - start)))
    if len(out_parts) == 1:
        return out_parts[0]
    return pa.concat_tables(out_parts)


def extract_batch(batch: pa.Table) -> pa.Table:
    """pyarrow Table (url, warc_ts, html, ...) → extracted table.

    Drops ``html``; carries through every other input column untouched.
    """
    # Carried-through CC-style columns (input_hint: text, lang) collide
    # with our output names — prefix them. Production pipelines prune
    # them at the read (cfg.input_columns); this is the defensive path.
    renames = {c: f"cc_{c}" for c in ("text", "lang") if c in batch.column_names}
    if renames:
        batch = batch.rename_columns(
            [renames.get(c, c) for c in batch.column_names]
        )

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()

    n = len(urls)
    hostnames: List[str] = [""] * n
    texts: List[str] = [""] * n
    spans: List[list] = [[]] * n
    images: List[list] = [[]] * n
    text_lengths = [0] * n
    word_counts = [0] * n
    paragraph_counts = [0] * n
    statuses = [""] * n
    error_types = [""] * n
    error_messages = [""] * n

    for i in range(n):
        row = extract_row(urls[i], htmls[i])
        hostnames[i] = row["hostname"]
        texts[i] = row["text"]
        spans[i] = row["spans"]
        images[i] = row["images"]
        text_lengths[i] = row["text_length"]
        word_counts[i] = row["word_count"]
        paragraph_counts[i] = row["paragraph_count"]
        statuses[i] = row["status"]
        error_types[i] = row["error_type"]
        error_messages[i] = row["error_message"]

    html_len = pc.binary_length(batch.column("html")).cast(pa.int64())
    images_arr = pa.array(images, pa.list_(IMAGE_REF_TYPE))
    out = batch.drop_columns(["html"])
    for name, arr in (
        ("hostname", pa.array(hostnames, pa.string())),
        ("text", pa.array(texts, pa.string())),
        ("spans", pa.array(spans, pa.list_(SPAN_TYPE))),
        ("images", images_arr),
        ("text_length", pa.array(text_lengths, pa.int64())),
        ("word_count", pa.array(word_counts, pa.int64())),
        ("paragraph_count", pa.array(paragraph_counts, pa.int64())),
        ("n_images", pc.list_value_length(images_arr).cast(pa.int64())),
        ("html_len", html_len),
        ("status", pa.array(statuses, pa.string())),
        ("error_type", pa.array(error_types, pa.string())),
        ("error_message", pa.array(error_messages, pa.string())),
    ):
        out = out.append_column(name, arr)
    return out
