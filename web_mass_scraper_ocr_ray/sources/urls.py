"""URL-list sources (S1/S2) and the gated live-fetch stage (S5/S6 seam).

The reference's source priority chain (main.py:506-549): single env URL
→ URL file → DB. Here:
  - S1 single/explicit URLs → ``pages_from_urls`` (ray.data.from_items)
  - S2 URL file → ``read_url_file`` (read_text, strip blanks —
    main.py:316-325)
  - S3 DB source → the Parquet pages table (primary path, pages.py)

A url-only dataset has no ``html``; ``FetchStage`` is the seam that
would fill it by fetching live (scraper.py:174-205 + utils.py:193-230).
This container has NO network, so the default fetcher raises
NotImplementedError — tests inject a deterministic fake fetcher, which
exercises the real plumbing: per-actor rate-limiter registry (T3),
retry-with-backoff (§2.10), HTTP-status → error-type routing
(scraper.py:193-196), error-as-data rows.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import pyarrow as pa

from ..functions.errors import (
    STATUS_COMPLETED,
    STATUS_FAILED,
    error_type_for_http_status,
    truncate_error_message,
)
from ..functions.rate_limiter import RateLimiterRegistry
from ..functions.retry import retry_with_backoff
from ..functions.urltools import normalize_hostname

# fetcher contract: url → (http_status, body_bytes); raises on transport
# errors. Injected; None → NotImplementedError (no network here).
Fetcher = Callable[[str], Tuple[int, bytes]]


def urllib_fetcher(timeout: float = 30.0, max_bytes: int = 32 * 2**20,
                   user_agent: str = "web-mass-scraper-ocr-ray/1.0"
                   ) -> Fetcher:
    """Stdlib live fetcher for ``FetchStage`` (requires network).

    Replaces the reference's Playwright page load (scraper.py:186-205,
    default SCRAPER_PAGE_TIMEOUT_MS 30 s) with a plain HTTP GET — this
    engine parses static HTML, so no JS rendering. Error routing keeps
    the FetchStage contract:
      - non-2xx → returned as (status, body); FetchStage maps the code
        through ``error_type_for_http_status`` (RateLimit/Server/…),
        mirroring scraper.py:193-196
      - timeouts → TimeoutError, DNS/conn failures → ConnectionError,
        both retryable by the stage's retry_with_backoff
    ``max_bytes`` bounds the response body in worker memory — a batch
    engine must cap per-row payloads (the reference streamed one page
    at a time)."""
    import socket
    import urllib.error
    import urllib.request

    def _fetch(url: str) -> Tuple[int, bytes]:
        req = urllib.request.Request(
            url, headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                body = resp.read(max_bytes)
                return getattr(resp, "status", 200), body
        except urllib.error.HTTPError as exc:
            # HTTP-level failure IS a response: status routes the error
            try:
                body = exc.read() or b""
            except Exception:
                body = b""
            return exc.code, body
        except socket.timeout as exc:
            raise TimeoutError(f"timeout fetching {url}") from exc
        except urllib.error.URLError as exc:
            reason = getattr(exc, "reason", exc)
            if isinstance(reason, socket.timeout):
                raise TimeoutError(f"timeout fetching {url}") from exc
            raise ConnectionError(str(reason)) from exc

    return _fetch


def pages_from_urls(urls: Iterable[str], client_ids: Optional[Iterable] = None):
    """S1: explicit URL list → url-only Dataset (html filled by fetch).

    ``client_ids`` mirrors the reference's (client_id, url) pairing
    (main.py:503, J3) — just a column, no join needed."""
    import ray.data as rd

    urls = list(urls)
    cols = {"url": pa.array(urls, pa.string())}
    if client_ids is not None:
        cols["client_id"] = pa.array([str(c) for c in client_ids], pa.string())
    return rd.from_arrow(pa.table(cols))


def read_url_file(path: str):
    """S2: text file of URLs, blank lines stripped (main.py:316-325)."""
    import ray.data as rd

    ds = rd.read_text(path)

    def _clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        stripped = pc.utf8_trim_whitespace(t.column("text"))
        keep = pc.invert(pc.equal(stripped, ""))
        return pa.table({"url": stripped.filter(keep)})

    return ds.map_batches(_clean, batch_format="pyarrow")


class FetchStage:
    """Actor-pool stage: url rows → pages rows (url, warc_ts, html,
    status, error_type, error_message).

    State per actor: the rate-limiter registry + retried fetcher. Use
    with ``map_batches(FetchStage, fn_constructor_kwargs=...,
    concurrency=N)`` — concurrency × rate is the global politeness
    ceiling (replaces the reference's global limiter registry,
    rate_limiter.py:156-177)."""

    def __init__(self, fetcher: Optional[Fetcher] = None,
                 rate: float = 2.0, burst: int = 5,
                 max_retries: int = 1, retry_delay: float = 0.0):
        if fetcher is None:
            raise NotImplementedError(
                "live fetching requires network access not present in "
                "this container; inject a fetcher callable"
            )
        import time

        self.limiters = RateLimiterRegistry(rate, burst)
        self._fetch = retry_with_backoff(
            max_retries=max_retries,
            initial_delay=retry_delay,
            retry_on_exceptions=(ConnectionError, TimeoutError),
            # retry_delay == 0 keeps tests instant; any positive delay
            # must actually back off between attempts
            sleep=time.sleep if retry_delay else (lambda s: None),
        )(fetcher)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import datetime

        urls = batch.column("url").to_pylist()
        n = len(urls)
        htmls: list = [None] * n
        statuses = [""] * n
        etypes = [""] * n
        emsgs = [""] * n
        now = datetime.datetime(1970, 1, 1)  # deterministic placeholder;
        # a live deployment stamps fetch time — goldens never cover this
        for i, url in enumerate(urls):
            host = normalize_hostname(url)
            self.limiters.get(host).wait()
            try:
                code, body = self._fetch(url)
                if 200 <= code < 300:
                    htmls[i] = body
                    statuses[i] = STATUS_COMPLETED
                else:
                    statuses[i] = STATUS_FAILED
                    etypes[i] = error_type_for_http_status(code)
                    emsgs[i] = truncate_error_message(f"HTTP {code} for {url}")
            except Exception as exc:  # transport failure after retries
                statuses[i] = STATUS_FAILED
                etypes[i] = "Connection"
                emsgs[i] = truncate_error_message(str(exc))
        out = pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([now] * n, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "fetch_status": pa.array(statuses, pa.string()),
            "fetch_error_type": pa.array(etypes, pa.string()),
            "fetch_error_message": pa.array(emsgs, pa.string()),
        })
        if "client_id" in batch.column_names:
            out = out.append_column("client_id", batch.column("client_id"))
        return out
