"""Shared vectorized hashing kernels (numpy, no per-value Python).

``fnv64_bulk``: FNV-1a over utf-8 bytes + murmur3 fmix64 finalizer,
computed for a LIST of strings with O(max_len) full-width numpy ops
(byte columns of a padded matrix, masked by token length) — bit-
identical to the scalar ``fnv64``. Raw FNV-1a has poor high-bit
avalanche on short similar keys; the finalizer restores per-bit
uniformity (needed by SimHash votes and HLL register selection alike).

``bit_length_u64``: exact vectorized ``int.bit_length`` for uint64
arrays via 6 shift/compare rounds (float log2 loses exactness past
2^53, which corrupts HLL ranks).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211

# strings longer than this take the scalar path — the padded matrix is
# n × max_len bytes and one megabyte outlier must not inflate it
BULK_MAX_LEN = 256


def fnv64(data: bytes) -> int:
    """Scalar reference for the bulk kernel (and its long-string path)."""
    h = FNV_OFFSET
    for ch in data:
        h = ((h ^ ch) * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    return h


def fnv64_bulk(strings: list) -> np.ndarray:
    """Vectorized fnv64 over a list of str — see module docstring."""
    n = len(strings)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    data = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
    big = lens > BULK_MAX_LEN
    if big.any():
        for i in np.nonzero(big)[0]:
            out[i] = fnv64(data[i])
    idx = np.nonzero(~big)[0]
    if len(idx) == 0:
        return out
    sl = lens[idx]
    max_len = int(sl.max()) if len(sl) else 0
    if max_len == 0:
        h = np.full(len(idx), FNV_OFFSET, dtype=np.uint64)
    else:
        flat = np.frombuffer(
            b"".join(data[i] for i in idx), dtype=np.uint8
        ).astype(np.uint64)
        starts = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(sl[:-1], out=starts[1:])
        # padded (n, max_len) byte matrix; columns past a string's end
        # re-read in-bounds bytes but are masked out of the update
        cols = np.minimum(np.arange(max_len), np.maximum(sl - 1, 0)[:, None])
        buf = flat[np.minimum(starts[:, None] + cols, len(flat) - 1)]
        h = np.full(len(idx), FNV_OFFSET, dtype=np.uint64)
        prime = np.uint64(FNV_PRIME)
        with np.errstate(over="ignore"):
            for j in range(max_len):
                live = sl > j
                hl = h[live]
                h[live] = (hl ^ buf[live, j]) * prime
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    out[idx] = h
    return out


def bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized int.bit_length for a uint64 array."""
    x = np.asarray(v, dtype=np.uint64).copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >= (np.uint64(1) << s)
        n[mask] += shift
        x[mask] >>= s
    n += (x == 1)
    return n
