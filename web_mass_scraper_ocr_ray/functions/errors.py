"""Error taxonomy — as DATA, not exceptions (§7.4.5).

The reference's exception hierarchy (``/root/reference/src/scraper_app/
exceptions.py:4-48``) becomes a closed set of ``error_type`` column
values: one poison page must mark its ROW failed, never kill a block.
The class hierarchy is kept (flattened to constants + a helper) so
pipeline code and tests share one vocabulary.

Reference mapping (error_type string per exceptions.py):
  InvalidURL ← InvalidURLError   Connection ← ConnectionError
  Parsing    ← ParsingError      OCR        ← OCRError
  Server/ServiceUnavailable/RateLimit ← HTTP-status subtree
  Unknown    ← bare ScrapingError
"""

from __future__ import annotations

ERROR_INVALID_URL = "InvalidURL"
ERROR_CONNECTION = "Connection"
ERROR_PARSING = "Parsing"
ERROR_OCR = "OCR"
ERROR_SERVER = "Server"
ERROR_SERVICE_UNAVAILABLE = "ServiceUnavailable"
ERROR_RATE_LIMIT = "RateLimit"
ERROR_UNKNOWN = "Unknown"

ALL_ERROR_TYPES = (
    ERROR_INVALID_URL,
    ERROR_CONNECTION,
    ERROR_PARSING,
    ERROR_OCR,
    ERROR_SERVER,
    ERROR_SERVICE_UNAVAILABLE,
    ERROR_RATE_LIMIT,
    ERROR_UNKNOWN,
)

STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"
STATUS_PENDING = "pending"  # db_utils.py:151 — transient in the reference;
                            # here only a manifest-level concept (§4.5)

# HTTP status → error_type (scraper.py:193-196)
def error_type_for_http_status(status_code: int) -> str:
    if status_code == 503:
        return ERROR_SERVICE_UNAVAILABLE
    if status_code == 429:
        return ERROR_RATE_LIMIT
    if 500 <= status_code < 600:
        return ERROR_SERVER
    return ERROR_CONNECTION


def truncate_error_message(msg: str, limit: int = 1023) -> str:
    """main.py:468 — messages are truncated before persisting."""
    return msg[:limit]
