"""Deterministic sampling operators.

Hash-based Bernoulli sampling with per-stratum rates: a row is kept iff
``mix(id) % 10000 < rate_bp(stratum)``, where ``mix`` is a fixed
multiplicative hash. Deterministic (same input → same sample, across
runs, engines and cluster sizes), embarrassingly parallel (pure
map_batches, no shuffle, no RNG state), and exactly reproducible in
SQL — the properties a 100 TB training-data pipeline needs from its
sampling stage (resumable, auditable, no coordinated seed).

The Knuth multiplicative constant 2654435761 (golden-ratio / 2^32)
keeps sequential ids uniform across buckets. The uint64 product is
exact (no wrap) for ids up to ~7e9; for wider id spaces switch the
mix to a full 64-bit hash (functions/hashing.fnv64_bulk) on both
sides.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(2654435761)
_M32 = np.uint64(2**32)


def sample_buckets(ids: np.ndarray) -> np.ndarray:
    """id → bucket in [0, 10000): ((id * 2654435761) mod 2^32) mod 1e4."""
    h = (ids.astype(np.uint64) * _MIX) % _M32
    return (h % np.uint64(10000)).astype(np.int64)


def stratified_sample(ds, id_col: str, strata_col: str,
                      rates_bp: Dict[str, int], default_bp: int = 0):
    """Keep each row with its stratum's deterministic rate (basis
    points). ``rates_bp`` is a small dict broadcast inside the task
    closure (no shuffle; the strata table never moves)."""

    def _keep(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        buckets = sample_buckets(ids)
        strata = t.column(strata_col).to_numpy(zero_copy_only=False)
        # rate lookup per UNIQUE stratum (strata cardinality is small)
        codes, uniq = pd.factorize(strata)
        per_uniq = np.array(
            [rates_bp.get(u, default_bp) for u in uniq], dtype=np.int64)
        limits = per_uniq[codes]
        return t.filter(pa.array(buckets < limits))

    return ds.map_batches(_keep, batch_format="pyarrow")
