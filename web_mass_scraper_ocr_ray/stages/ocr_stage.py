"""OCR stage — stateful actor-pool `map_batches` class (T2).

The reference OCRs images one at a time inside the per-URL loop,
paying engine startup per URL (scraper.py:222-275, ocr.py:36-113); its
unused ThreadPool (utils.py:128-151) marks the intended parallel point.
Here that exact point becomes an actor pool: the engine is pinned once
per actor in ``__init__`` and batches of pages flow through
``__call__``; per-page image order is the DOM order recorded by the
extract stage, preserving the reference's sequential-loop ordering
(layout-block ordering per north_star).

Routing (per image ref, scraper.py:229-258 + utils.py:166-230):
  - ``data``    → decode base64 in-band payload → engine.ocr
  - ``remote``  → offline: download-failed path → ``failed_images``
                  (reference: download_image → None → scraper.py:241-245)
  - ``invalid`` → unconstructable URL → ``failed_images`` (scraper.py:230-234)
  - undecodable data-URL → ``failed_images`` (handle_data_url → None)

Output adds per-row:
  - ``images``: list<struct image_url,text,char_count,word_count,
                ocr_status,ocr_failed>  (ocr_item — scraper.py:250-258)
  - ``failed_images``: list<string>
  - ``ocr``: per-page rollup struct (utils.py:277-319, A1)
  - flat histogram/rate columns (main.py:152-209, A2) — these sum
    associatively into the session rollup (A4) with no extra pass.
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from ..functions.metadata import (
    create_ocr_metadata,
    ocr_status_histogram,
    ocr_success_rate_on_processable,
)
from ..ocr.engine import make_engine, parse_data_url

OCR_ITEM_TYPE = pa.struct(
    [
        ("image_url", pa.string()),
        ("text", pa.string()),
        ("char_count", pa.int64()),
        ("word_count", pa.int64()),
        ("ocr_status", pa.string()),
        ("ocr_failed", pa.bool_()),
    ]
)

OCR_ROLLUP_TYPE = pa.struct(
    [
        ("total_ocr_text", pa.string()),
        ("total_ocr_text_length", pa.int64()),
        ("total_ocr_word_count", pa.int64()),
        ("image_count", pa.int64()),
        ("successful_ocr_count", pa.int64()),
        ("success_rate", pa.float64()),
    ]
)

OCR_FLAT_COLUMNS = (
    ("ocr_attempts", pa.int64()),
    ("ocr_successes", pa.int64()),
    ("ocr_no_text_found_count", pa.int64()),
    ("ocr_error_unsupported_format_count", pa.int64()),
    ("ocr_error_processing_count", pa.int64()),
    ("ocr_error_file_not_found_count", pa.int64()),
    ("ocr_error_tesseract_count", pa.int64()),
    ("ocr_total_errors", pa.int64()),
)


def ocr_page_images(engine, image_refs: List[Dict[str, Any]],
                    downloader=None):
    """Per-page image loop (DOM order). Returns (ocr_items, failed).

    ``downloader`` (sources/images.ImageDownloader or None): when set,
    remote refs are fetched live (rate-limited, retried, size-capped)
    and OCR'd; when None (default — no network in this container) they
    take the reference's download-failure branch (scraper.py:241-245).
    """
    ocr_items: List[Dict[str, Any]] = []
    failed: List[str] = []
    for ref in image_refs or []:
        kind = ref["payload_kind"]
        image_url = ref["image_url"]
        if kind == "invalid":
            failed.append(ref["src"] or "unknown_src_on_failed_construct")
            continue
        if kind == "remote":
            if downloader is None:
                failed.append(image_url)
                continue
            fetched = downloader.download(image_url)
            if fetched is None:
                failed.append(image_url)  # scraper.py:241-245
                continue
            mime, payload = fetched
        else:
            parsed = parse_data_url(image_url)
            if parsed is None:
                failed.append(image_url)
                continue
            mime, payload = parsed
        out = engine.ocr(payload, mime)
        ocr_items.append(
            {
                "image_url": image_url,
                "text": out.text,
                "char_count": out.char_count,
                "word_count": out.word_count,
                "ocr_status": out.ocr_status,
                # ocr_failed := status != 'success' — scraper.py:257
                "ocr_failed": out.ocr_status != "success",
            }
        )
    return ocr_items, failed


class OCRStage:
    """Callable class for ``map_batches(OCRStage, concurrency=N, ...)``."""

    def __init__(self, engine: str = "stub", enhancement: bool = True,
                 fast_processing: bool = False,
                 fetch_remote_images: bool = False,
                 image_transport=None, image_fetch_kwargs: dict = None):
        # once per actor — the state this pool exists for (engine +
        # the rate-limited downloader when the online path is enabled)
        self.engine = make_engine(
            engine, enhancement=enhancement, fast_processing=fast_processing
        )
        self.downloader = None
        if fetch_remote_images:
            from ..sources.images import ImageDownloader

            self.downloader = ImageDownloader(
                transport=image_transport, **(image_fetch_kwargs or {})
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_col = batch.column("images").to_pylist()
        n = len(refs_col)
        items_out: List[list] = [[]] * n
        failed_out: List[list] = [[]] * n
        rollups: List[dict] = [{}] * n
        flats = {name: [0] * n for name, _ in OCR_FLAT_COLUMNS}
        rates = [0.0] * n

        for i in range(n):
            items, failed = ocr_page_images(
                self.engine, refs_col[i], downloader=self.downloader
            )
            items_out[i] = items
            failed_out[i] = failed
            rollup = create_ocr_metadata(items)
            rollups[i] = {
                "total_ocr_text": rollup["total_ocr_text"],
                "total_ocr_text_length": rollup["total_ocr_text_length"],
                "total_ocr_word_count": rollup["total_ocr_word_count"],
                "image_count": rollup["image_count"],
                "successful_ocr_count": rollup["successful_ocr_count"],
                "success_rate": rollup["success_rate"],
            }
            hist = ocr_status_histogram(items)
            attempts = len(items)  # main.py:165-166
            total_errors = (
                hist["error_unsupported_format"]
                + hist["error_processing"]
                + hist["error_file_not_found"]
                + hist["error_tesseract"]
            )
            flats["ocr_attempts"][i] = attempts
            flats["ocr_successes"][i] = hist["success"]
            flats["ocr_no_text_found_count"][i] = hist["no_text_found"]
            flats["ocr_error_unsupported_format_count"][i] = hist[
                "error_unsupported_format"
            ]
            flats["ocr_error_processing_count"][i] = hist["error_processing"]
            flats["ocr_error_file_not_found_count"][i] = hist["error_file_not_found"]
            flats["ocr_error_tesseract_count"][i] = hist["error_tesseract"]
            flats["ocr_total_errors"][i] = total_errors
            rates[i] = round(ocr_success_rate_on_processable(hist, attempts), 2)

        out = batch.drop_columns(["images"])
        out = out.append_column("images", pa.array(items_out, pa.list_(OCR_ITEM_TYPE)))
        out = out.append_column(
            "failed_images", pa.array(failed_out, pa.list_(pa.string()))
        )
        out = out.append_column("ocr", pa.array(rollups, OCR_ROLLUP_TYPE))
        for name, typ in OCR_FLAT_COLUMNS:
            out = out.append_column(name, pa.array(flats[name], typ))
        out = out.append_column(
            "ocr_success_rate_on_processable", pa.array(rates, pa.float64())
        )
        return out


# Process-global engine cache for the FUSED task path. Ray worker
# processes are long-lived, so a module-level singleton gives the same
# once-per-worker amortization as an actor pool — while letting Ray
# fuse extract→OCR into ONE task (an actor stage cannot fuse with a
# task stage, forcing the full extracted dataset through the object
# store between them; measured +5.7s on a 200k-doc run vs +0.1s fused).
# Use the actor pool (OCRStage + concurrency=) when engine *init* is
# expensive (real Tesseract, models); use this when it is not.
_PROCESS_ENGINES: dict = {}


def ocr_batch_fused(batch: pa.Table, engine: str = "stub",
                    enhancement: bool = True,
                    fast_processing: bool = False) -> pa.Table:
    key = (engine, enhancement, fast_processing)
    stage = _PROCESS_ENGINES.get(key)
    if stage is None:
        stage = OCRStage(engine, enhancement, fast_processing)
        _PROCESS_ENGINES[key] = stage
    return stage(batch)


def empty_ocr_columns(batch: pa.Table) -> pa.Table:
    """Mode gate 'text' (scraper.py:208,217): stable output schema with
    empty OCR columns so downstream consumers see one schema per run."""
    n = batch.num_rows
    out = batch.drop_columns(["images"])
    out = out.append_column(
        "images", pa.array([[]] * n, pa.list_(OCR_ITEM_TYPE))
    )
    out = out.append_column(
        "failed_images", pa.array([[]] * n, pa.list_(pa.string()))
    )
    empty_rollup = {
        "total_ocr_text": "",
        "total_ocr_text_length": 0,
        "total_ocr_word_count": 0,
        "image_count": 0,
        "successful_ocr_count": 0,
        "success_rate": 0.0,
    }
    out = out.append_column("ocr", pa.array([empty_rollup] * n, OCR_ROLLUP_TYPE))
    for name, typ in OCR_FLAT_COLUMNS:
        out = out.append_column(name, pa.array([0] * n, typ))
    out = out.append_column(
        "ocr_success_rate_on_processable", pa.array([0.0] * n, pa.float64())
    )
    return out
