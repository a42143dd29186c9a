"""Retry with exponential backoff — reusable wrapper (§2.10).

Fresh implementation of the reference's retry surface
(``/root/reference/src/scraper_app/retry.py:15-118``): pluggable
exception list, exponential backoff with cap and ±jitter. In the Ray
engine, INFRA failures are handled by Ray task retries
(``max_retries``/``retry_exceptions``) and per-row failures are data
(status columns); this decorator covers the remaining seam — transient
I/O inside a UDF (e.g. the gated live-fetch stage) where retrying the
single call beats failing the row.

Determinism note: jitter uses a caller-supplied ``random.Random`` seed
(default derived from the function name) so tests are reproducible —
the reference uses global ``random`` (retry.py:81).
"""

from __future__ import annotations

import functools
import random
import time
from typing import Callable, Sequence, Type


def retry_with_backoff(
    max_retries: int = 1,
    initial_delay: float = 1.0,
    max_delay: float = 60.0,
    backoff_factor: float = 2.0,
    jitter: float = 0.25,
    retry_on_exceptions: Sequence[Type[BaseException]] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
):
    """Decorator: retry ``max_retries`` times on listed exceptions.

    Delay schedule mirrors the reference defaults (config.py:52-56):
    initial 1.0 s, ×2.0 per attempt, capped at 60 s, jitter ±25%.
    """
    exc_types = tuple(retry_on_exceptions)

    def deco(fn):
        local_rng = rng or random.Random(hash(fn.__qualname__) & 0xFFFF)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            delay = initial_delay
            for attempt in range(max_retries + 1):
                try:
                    return fn(*args, **kwargs)
                except exc_types:
                    if attempt >= max_retries:
                        raise
                    jittered = delay * (1 + local_rng.uniform(-jitter, jitter))
                    sleep(min(jittered, max_delay))
                    delay = min(delay * backoff_factor, max_delay)

        return wrapper

    return deco
