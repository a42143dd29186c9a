"""Environment compatibility shims.

``ensure_threadsafe_fsspec_http``: Ray Data's path resolution calls
``from fsspec.implementations.http import HTTPFileSystem`` on every
read/write (path_util._is_http_filesystem) inside a
``except ModuleNotFoundError`` guard. In this container ``aiohttp`` is
absent, so that import FAILS every time — and a failed import is
re-executed on each call, which is not thread-safe: two concurrent
resolutions race on the partially-initialized module in ``sys.modules``
and one raises plain ``ImportError`` (not ModuleNotFoundError), which
Ray's guard misses and the pipeline dies.

The fix registers a one-time sentinel module exposing an
``HTTPFileSystem`` class nothing can be an instance of. Semantics are
exactly what Ray's guard would conclude (no HTTP filesystem exists
here), and the import becomes a cached, thread-safe dict hit.
"""

from __future__ import annotations

import sys
import types


def ensure_threadsafe_fsspec_http() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module imports fine — nothing to do
    except ImportError:
        pass
    if "fsspec.implementations.http" in sys.modules:
        return

    class _NoHTTPFileSystem:
        """Sentinel: isinstance(x, _NoHTTPFileSystem) is always False."""

        def __init__(self, *a, **k):  # pragma: no cover
            raise ModuleNotFoundError("aiohttp is not installed")

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = _NoHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
