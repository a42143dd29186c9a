"""Duplicate-suppression logging filter (reference operator T6).

Parity with the reference's ``DuplicateFilter``
(/root/reference/src/scraper_app/logging_utils.py:136-154): a
``logging.Filter`` that drops a record whose rendered message equals the
previous record's message AND arrives within ``window`` seconds of it.
Any non-duplicate (or a duplicate outside the window) passes and resets
both the remembered message and the timestamp.

Differences from the reference, on purpose:

- the clock is injectable (``clock=time.monotonic`` by default) so the
  window rule is unit-testable without sleeping;
- one filter instance should be attached per HANDLER (as the reference
  does for its console + file handlers); the state is a single
  (message, time) pair, so this is a per-process logging concern — it
  is NOT distributed state and never touches the data plane. On a Ray
  cluster each worker process filters its own log stream, which matches
  the reference's per-process semantics exactly.
"""

from __future__ import annotations

import logging
import time
from typing import Callable


class DuplicateMessageFilter(logging.Filter):
    """Drop consecutive duplicate log messages within ``window`` seconds.

    Reference semantics (logging_utils.py:143-154):
    - compare the RENDERED message (``record.getMessage()``), so two
      records with the same format string but different args differ;
    - only the immediately-previous message is remembered (a message
      interleaved with a different one always passes);
    - a passing record always refreshes both the message and the time,
      so a steady stream of the same message emits one record per
      ``window`` seconds (the reference's timeout=1.0 behavior).
    """

    def __init__(self, window: float = 1.0,
                 clock: Callable[[], float] = time.monotonic) -> None:
        super().__init__()
        self.window = float(window)
        self._clock = clock
        self._last_msg: str | None = None
        self._last_time: float = float("-inf")
        self.suppressed = 0  # observability: how many records were dropped

    def filter(self, record: logging.LogRecord) -> bool:
        now = self._clock()
        msg = record.getMessage()
        if self._last_msg == msg and (now - self._last_time) < self.window:
            self.suppressed += 1
            return False
        self._last_msg = msg
        self._last_time = now
        return True


def add_duplicate_filter(logger: logging.Logger | None = None,
                         window: float = 1.0) -> DuplicateMessageFilter:
    """Attach a fresh ``DuplicateMessageFilter`` to every handler of
    ``logger`` (root by default), mirroring the reference's setup which
    adds one shared filter to its console and file handlers
    (logging_utils.py:157-160). Returns the filter for inspection."""
    logger = logger or logging.getLogger()
    filt = DuplicateMessageFilter(window=window)
    if logger.handlers:
        for h in logger.handlers:
            h.addFilter(filt)
    else:
        # no handlers yet: attach at the logger so it still applies
        logger.addFilter(filt)
    return filt
