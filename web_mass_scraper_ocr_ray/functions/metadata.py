"""Per-page rollups and summary math — within-row aggregations (A1-A3).

Reference semantics:
  - ``create_ocr_metadata``      — utils.py:277-319 (per-page OCR rollup)
  - per-page image/OCR stats     — main.py:152-209 (6-way status histogram,
                                   success-rate zero-division guards)
  - session/global counters      — main.py:27-123 (associative partials,
                                   merged by ``ds.aggregate`` in A4)

All functions here are pure; the grouping key of A1/A2 is the row itself
so no shuffle is ever involved (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Dict, List

OCR_STATUSES = (
    "success",
    "no_text_found",
    "error_unsupported_format",
    "error_processing",
    "error_file_not_found",
    "error_tesseract",
)  # ocr.py:29-31

_ERROR_STATUSES = (
    "error_unsupported_format",
    "error_processing",
    "error_file_not_found",
    "error_tesseract",
)


def create_ocr_metadata(ocr_results: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Per-page OCR rollup over the row's image list. utils.py:277-319.

    success = not ocr_failed AND non-empty text; char/word counts are
    summed over ALL images (including failed ones) — reference quirk.
    """
    texts: List[str] = []
    total_chars = 0
    total_words = 0
    successes = 0
    for item in ocr_results:
        text = item.get("text", "")
        ok = (not item.get("ocr_failed", True)) and bool(text)
        if ok:
            successes += 1
            texts.append(text)
        total_chars += item.get("char_count", 0)
        total_words += item.get("word_count", 0)
    n = len(ocr_results)
    return {
        "total_ocr_text": "\n\n".join(texts).strip(),
        "total_ocr_text_length": total_chars,
        "total_ocr_word_count": total_words,
        "image_count": n,
        "successful_ocr_count": successes,
        "success_rate": (successes / n) * 100 if n else 0.0,
    }


def ocr_status_histogram(ocr_results: List[Dict[str, Any]]) -> Dict[str, int]:
    """6-way per-page status counts. main.py:174-186."""
    hist = {s: 0 for s in OCR_STATUSES}
    for item in ocr_results:
        status = item.get("ocr_status", "error_processing")
        if status in hist:
            hist[status] += 1
    return hist


def ocr_success_rate_on_processable(hist: Dict[str, int], attempts: int) -> float:
    """Success rate with the reference's exact zero-division guard order.

    main.py:84-91 / main.py:195-199: rate over (successes +
    no_text_found); 0.0 when everything errored; 0.0 when no attempts.
    """
    total_errors = sum(hist.get(s, 0) for s in _ERROR_STATUSES)
    meaningful = hist.get("success", 0) + hist.get("no_text_found", 0)
    if meaningful > 0:
        return (hist.get("success", 0) / meaningful) * 100
    if attempts > 0 and total_errors == attempts:
        return 0.0
    return 0.0


# ---- session rollup (A4) -------------------------------------------------
# One partial-counter dict per batch; merged associatively. Mirrors
# ScrapingSession (main.py:27-123) without shared mutable state.

SESSION_COUNTER_FIELDS = (
    "total_urls",
    "successful_urls",
    "failed_urls",
    "total_ocr_attempts",
    "total_ocr_successes",
    "total_ocr_no_text_found",
    "total_ocr_errors_unsupported",
    "total_ocr_errors_processing",
    "total_ocr_errors_file_not_found",
    "total_ocr_errors_tesseract",
    "total_text_length",
    "total_word_count",
)


def finalize_session_summary(c: Dict[str, int]) -> Dict[str, Any]:
    """Merge-final of session counters → summary struct. main.py:72-123."""
    total_errors = (
        c["total_ocr_errors_unsupported"]
        + c["total_ocr_errors_processing"]
        + c["total_ocr_errors_file_not_found"]
        + c["total_ocr_errors_tesseract"]
    )
    meaningful = c["total_ocr_successes"] + c["total_ocr_no_text_found"]
    if meaningful > 0:
        rate = (c["total_ocr_successes"] / meaningful) * 100
    else:
        rate = 0.0  # incl. the all-errors branch, main.py:89-91
    return {
        "urls_total": c["total_urls"],
        "urls_successful": c["successful_urls"],
        "urls_failed": c["failed_urls"],
        "total_images_ocr_attempted": c["total_ocr_attempts"],
        "total_ocr_successful_extraction": c["total_ocr_successes"],
        "total_ocr_no_text_found": c["total_ocr_no_text_found"],
        "total_ocr_errors_unsupported_format": c["total_ocr_errors_unsupported"],
        "total_ocr_errors_processing": c["total_ocr_errors_processing"],
        "total_ocr_errors_file_not_found": c["total_ocr_errors_file_not_found"],
        "total_ocr_errors_tesseract": c["total_ocr_errors_tesseract"],
        "total_ocr_errors_sum": total_errors,
        "average_success_rate_on_processable": round(rate, 2),
        "total_text_length": c["total_text_length"],
        "total_word_count": c["total_word_count"],
    }
