"""Vectorized broadcast-map lookup — the r4-verdict "stamp loop" fix.

A small dimension table keyed by int64 (supplier names, customer
segments, host ranks …) is shipped ONCE per job via ``ray.put`` and
applied per batch with a single ``np.searchsorted`` over the sorted
key array + one Arrow ``take`` per value column — no per-row
``dict.get`` in any hot stamp stage (SURVEY §10.4: ~1 µs/row of
interpreter cost removed at 100 TB).  The broadcast-small-side DESIGN
is unchanged (reference parity: the company-name lookup,
``/root/reference/src/scraper_app/main.py`` client/url pairing); only
the per-batch kernel is vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class VecLut:
    """Sorted-int64-key lookup table with Arrow value columns.

    ``take(keys, col)`` maps a batch's key array to that column's
    values via one ``searchsorted``.  Missing keys raise by default;
    pass ``defaults={col: value}`` to fill them instead (the
    ``dict.get(k, default)`` shape, vectorized).

    The instance is ``ray.put``-able as one object: numpy key array +
    Arrow value arrays, all zero-copy out of the object store.
    """

    def __init__(self, keys, columns: dict, defaults: dict | None = None):
        k = np.asarray(keys, np.int64)
        if k.size == 0:
            raise ValueError("VecLut: empty key set")
        order = np.argsort(k, kind="stable")
        self._keys = k[order]
        if (np.diff(self._keys) == 0).any():
            raise ValueError("VecLut: duplicate keys")
        idx = pa.array(order)
        self._cols = {}
        for name, vals in columns.items():
            arr = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
                else pa.array(vals)
            if len(arr) != k.size:
                raise ValueError(f"VecLut: column {name!r} length "
                                 f"{len(arr)} != {k.size} keys")
            self._cols[name] = pc.take(arr, idx)
        self._defaults = defaults

    def __len__(self) -> int:
        return len(self._keys)

    def _index(self, batch_keys) -> tuple[np.ndarray, np.ndarray]:
        k = np.asarray(batch_keys, np.int64)
        idx = np.searchsorted(self._keys, k)
        idx = np.minimum(idx, len(self._keys) - 1)
        hit = self._keys[idx] == k
        return idx, hit

    def take(self, batch_keys, col: str) -> pa.Array:
        """Values of ``col`` for each batch key (one searchsorted +
        one Arrow take; missing keys → default or KeyError)."""
        idx, hit = self._index(batch_keys)
        vals = pc.take(self._cols[col], pa.array(idx))
        if hit.all():
            return vals
        if self._defaults is None or col not in self._defaults:
            missing = np.asarray(batch_keys, np.int64)[~hit]
            raise KeyError(
                f"VecLut: {int((~hit).sum())} keys missing "
                f"(e.g. {missing[:3].tolist()}) and no default for "
                f"{col!r}")
        return pc.if_else(pa.array(hit), vals,
                          pa.scalar(self._defaults[col], vals.type))

    def contains(self, batch_keys) -> np.ndarray:
        """Boolean membership mask (vectorized)."""
        return self._index(batch_keys)[1]
