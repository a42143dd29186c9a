"""Per-resource token-bucket rate limiter (T3 parity).

The reference throttles live fetches per hostname with a module-global
token-bucket registry (``/root/reference/src/scraper_app/rate_limiter.py:
26-177``). The batch engine has no live fetch — Ray Data backpressure
plus actor-pool sizing bound concurrency — so this exists only for the
gated fetch stage seam (sources.fetch) and API parity. Unlike the
reference's module global, the registry is an explicit object: shared
mutable module state does not survive Ray worker boundaries, so a
limiter is per-actor state (construct in ``__init__``), which is also
the semantically right scope — per-host politeness per worker, with
pool size × rate as the global ceiling.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict


class TokenBucket:
    """max_requests_per_second with burst capacity (rate_limiter.py:26-154)."""

    def __init__(self, rate: float = 2.0, burst: int = 5,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        self.rate = float(rate)
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.clock = clock
        self.sleep = sleep
        self._last = clock()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = self.clock()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
        self._last = now

    def try_acquire(self) -> bool:
        with self._lock:
            self._refill()
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return True
            return False

    def wait(self) -> float:
        """Block until a token is available; returns seconds waited."""
        waited = 0.0
        while True:
            with self._lock:
                self._refill()
                if self.tokens >= 1.0:
                    self.tokens -= 1.0
                    return waited
                need = (1.0 - self.tokens) / self.rate
            self.sleep(need)
            waited += need


class RateLimiterRegistry:
    """Keyed limiter factory (rate_limiter.py:156-177) — explicit object,
    not a module global; one per fetch actor."""

    def __init__(self, default_rate: float = 2.0, default_burst: int = 5,
                 overrides: Dict[str, float] | None = None):
        self.default_rate = default_rate
        self.default_burst = default_burst
        self.overrides = dict(overrides or {})
        self._limiters: Dict[str, TokenBucket] = {}
        self._lock = threading.Lock()

    def get(self, resource: str) -> TokenBucket:
        with self._lock:
            lim = self._limiters.get(resource)
            if lim is None:
                rate = self.overrides.get(resource, self.default_rate)
                lim = TokenBucket(rate=rate, burst=self.default_burst)
                self._limiters[resource] = lim
            return lim
