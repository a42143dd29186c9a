"""Merkle-style corpus diff: which key ranges changed between two
snapshots.

The anti-entropy primitive behind every incremental 100 TB sync
(Dynamo-style replica repair, rsync's block checksums, Iceberg
manifest diffing): instead of joining two 10¹²-row snapshots row by
row, each side folds into O(n_ranges) order-independent range
checksums — count + XOR of a per-row content hash — and only ranges
whose checksums disagree need the expensive row-level pass. XOR makes
the fold commutative/associative (any batch order, any partitioning)
and collision-safe enough at 56 bits per range for a triage step
whose FOLLOW-UP is exact.

Distributed shape: one stateless hash map per side + the map-side
combiner per side (O(n_ranges × batches) partial rows shuffle), one
tiny groupby to align sides. Nothing row-level ever crosses sides.

The row hash is the first 14 hex digits of md5(key ':' payload) —
deliberately SQL-reproducible: DuckDB's
``CAST('0x' || substr(md5(...), 1, 14) AS BIGINT)`` equals Python's
``int(md5(...).hexdigest()[:14], 16)`` (verified in tests).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _row_hashes(keys, payloads) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.int64)
    for i, (k, p) in enumerate(zip(keys, payloads)):
        h = hashlib.md5(f"{k}:{p}".encode("utf-8")).hexdigest()
        out[i] = int(h[:14], 16)
    return out


def range_checksums(ds, key_col: str, payload_col: str,
                    n_ranges: int = 256):
    """→ ``(bucket, n, xr)``: row count and XOR-folded content hash
    per key range (``bucket = key % n_ranges`` — the contract a SQL
    verifier can mirror; integer keys only)."""

    def _partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        pay = t.column(payload_col).to_pylist()
        h = _row_hashes(keys, pay)
        b = (keys % n_ranges).astype(np.int64)
        df = pd.DataFrame({"bucket": b, "h": h})
        g = df.groupby("bucket", sort=False).agg(
            n=("h", "size"), xr=("h", lambda s: np.bitwise_xor.reduce(
                s.to_numpy())))
        g = g.reset_index()
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "xr": pa.array(g["xr"].to_numpy().astype(np.int64)),
        })

    partials = ds.select_columns([key_col, payload_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": [int(g["bucket"].iloc[0])],
            "n": [int(g["n"].sum())],
            "xr": [int(np.bitwise_xor.reduce(g["xr"].to_numpy()))],
        })

    return partials.groupby("bucket").map_groups(
        _merge, batch_format="pandas")


def corpus_diff_ranges(old_ds, new_ds, key_col: str, payload_col: str,
                       n_ranges: int = 256):
    """→ the DIFFERING ranges only: ``(bucket, n_old, n_new)`` for
    every bucket whose (count, xor) checksum disagrees — including
    ranges present on one side only (n = 0 on the other)."""
    old_cs = range_checksums(old_ds, key_col, payload_col, n_ranges)
    new_cs = range_checksums(new_ds, key_col, payload_col, n_ranges)

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8)))
        return _f

    both = old_cs.map_batches(_tag(0), batch_format="pyarrow").union(
        new_cs.map_batches(_tag(1), batch_format="pyarrow"))

    def _cmp(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        n = g[g["side"] == 1]
        n_old = int(o["n"].iloc[0]) if len(o) else 0
        n_new = int(n["n"].iloc[0]) if len(n) else 0
        xr_old = int(o["xr"].iloc[0]) if len(o) else 0
        xr_new = int(n["xr"].iloc[0]) if len(n) else 0
        if n_old == n_new and xr_old == xr_new:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n_old": pd.Series([], dtype="int64"),
                                 "n_new": pd.Series([], dtype="int64")})
        return pd.DataFrame({"bucket": [int(g["bucket"].iloc[0])],
                             "n_old": [n_old], "n_new": [n_new]})

    return both.groupby("bucket").map_groups(_cmp, batch_format="pandas")


def corpus_diff_rows(old_ds, new_ds, key_col: str, payload_col: str,
                     n_ranges: int = 256):
    """The row-level follow-up to :func:`corpus_diff_ranges`:
    ``(key, change)`` with change ∈ added/deleted/edited.

    Scale shape: the range triage runs first and its ≤n_ranges result
    is captured by closure (tiny); BOTH snapshots then filter to the
    changed buckets with a stateless vectorized ``np.isin`` — the
    row-level co-partition exchange moves only data living in dirty
    ranges, so incremental cost tracks the CHANGE volume, not the
    corpus. Rows compare by the same 56-bit content hash the
    checksums fold (collision odds are the documented triage bound;
    the oracle compares payloads exactly and agrees at these sizes)."""
    dirty = {int(r["bucket"]) for r in corpus_diff_ranges(
        old_ds, new_ds, key_col, payload_col, n_ranges).take_all()}
    dirty_arr = np.fromiter(sorted(dirty), dtype=np.int64) if dirty \
        else np.empty(0, dtype=np.int64)

    def _slice(side: int):
        def _f(t: pa.Table) -> pa.Table:
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            mask = np.isin(keys % n_ranges, dirty_arr)
            t = t.filter(pa.array(mask))
            keys = keys[mask]
            h = _row_hashes(keys, t.column(payload_col).to_pylist())
            return pa.table({
                "key": pa.array(keys, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "side": pa.array(
                    np.full(len(keys), side, np.int8)),
            })
        return _f

    both = old_ds.select_columns([key_col, payload_col]).map_batches(
        _slice(0), batch_format="pyarrow"
    ).union(new_ds.select_columns([key_col, payload_col]).map_batches(
        _slice(1), batch_format="pyarrow"))

    def _classify(g: pd.DataFrame) -> pa.Table:
        o = g[g["side"] == 0]
        n = g[g["side"] == 1]
        if len(o) and len(n):
            if int(o["h"].iloc[0]) == int(n["h"].iloc[0]):
                return pa.table({"key": pa.array([], pa.int64()),
                                 "change": pa.array([], pa.string())})
            change = "edited"
        elif len(o):
            change = "deleted"
        else:
            change = "added"
        return pa.table({
            "key": pa.array([int(g["key"].iloc[0])], pa.int64()),
            "change": pa.array([change], pa.string()),
        })

    return both.groupby("key").map_groups(_classify,
                                          batch_format="pandas")
