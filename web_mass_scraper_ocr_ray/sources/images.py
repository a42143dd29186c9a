"""Remote-image download (S6 online path) — opt-in, per-actor state.

Reference: ``/root/reference/src/scraper_app/utils.py:193-230``
(``download_image``): per-host rate limit → up to IMAGE_RETRY_COUNT
attempts with IMAGE_RETRY_DELAY between them; HTTP errors, timeouts and
connection errors all retry; the body streams in 8 KiB chunks; any
final failure returns None (the caller routes the ref to
``failed_images``). Data URLs never reach this path (they decode
in-band — ocr/engine.parse_data_url).

Here the downloader is a small per-ACTOR object (OCRStage pins one in
``__init__``): the rate-limiter registry and transport live as actor
state, so ``concurrency × rate`` is the global politeness ceiling —
same contract as FetchStage (sources/urls.py). The transport is
injectable; the default urllib transport needs live network (absent in
this container), so tests drive the full retry/rate-limit/cap logic
with fakes while the wire format stays real.

Additions over the reference (batch-engine necessities):
  - ``max_bytes`` cap: a streaming download into worker memory must be
    bounded (the reference streamed to disk).
  - the result is (mime, payload bytes) for the OCR engine, not a file
    path — this engine's images never touch local disk.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

from ..functions.rate_limiter import RateLimiterRegistry
from ..functions.urltools import normalize_hostname

# transport contract: url, timeout → (http_status, mime, chunk iterable);
# raises OSError/TimeoutError on transport failure.
Transport = Callable[[str, float], Tuple[int, str, Iterable[bytes]]]

CHUNK_SIZE = 8192  # utils.py:212 iter_content(chunk_size=8192)


def urllib_transport(url: str, timeout: float):
    """Default stdlib transport (requires live network)."""
    import urllib.request

    resp = urllib.request.urlopen(url, timeout=timeout)  # noqa: S310

    def _chunks():
        with resp:
            while True:
                b = resp.read(CHUNK_SIZE)
                if not b:
                    return
                yield b

    mime = resp.headers.get_content_type() if resp.headers else ""
    return getattr(resp, "status", 200), mime, _chunks()


class ImageDownloader:
    """url → (mime, payload) | None, with per-host rate limiting and
    bounded retries (utils.py:201-230 control flow)."""

    def __init__(self, transport: Optional[Transport] = None,
                 rate: float = 2.0, burst: int = 5,
                 retry_count: int = 3, retry_delay: float = 0.0,
                 timeout: float = 10.0, max_bytes: int = 10 * 2**20,
                 sleep=None):
        import time

        self.transport = transport or urllib_transport
        self.limiters = RateLimiterRegistry(rate, burst)
        self.retry_count = retry_count
        self.retry_delay = retry_delay
        self.timeout = timeout
        self.max_bytes = max_bytes
        self._sleep = sleep if sleep is not None else (
            time.sleep if retry_delay else (lambda s: None)
        )

    def download(self, url: str) -> Optional[Tuple[str, bytes]]:
        limiter = self.limiters.get(normalize_hostname(url))
        for attempt in range(self.retry_count):
            limiter.wait()
            try:
                status, mime, chunks = self.transport(url, self.timeout)
                if not (200 <= status < 300):
                    # HTTPError path: retry then give up (utils.py:216-220)
                    raise OSError(f"HTTP {status} for {url}")
                buf = bytearray()
                for chunk in chunks:
                    buf.extend(chunk)
                    if len(buf) > self.max_bytes:
                        # oversized: a retry would re-fetch the same
                        # bytes — fail immediately
                        return None
                return mime or "", bytes(buf)
            except (OSError, TimeoutError, ValueError):
                if attempt + 1 < self.retry_count:
                    self._sleep(self.retry_delay)
        return None
