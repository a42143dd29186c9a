"""Event-sequence modeling: first-order transition matrix.

The "what follows what" prior every clickstream / crawl-scheduling
model starts from: per-entity event streams ordered by time, counted
as consecutive (from, to) pairs, normalized into per-source-state
probabilities. A Markov chain estimated with three distributed steps:

  1. per-entity ordered pairing — ``groupby(user).map_groups``; the
     kernel sorts one user's events and emits LOCALLY COMBINED pair
     counts, so a power-user with 10⁶ events contributes at most
     |types|² rows to the exchange, not 10⁶;
  2. global pair counts via the map-side combiner
     (`shuffle.two_phase_aggregate`) — O(|types|²) rows shuffle;
  3. per-from normalization as a second tiny groupby over the matrix
     itself (|types| groups) — probabilities in basis points by
     integer floor division, bit-stable under any summation order.

Ordering contract: (ts, tiebreak_col) must totally order each user's
events (holds for this corpus — event_id breaks ts ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import two_phase_aggregate


def event_transitions(ev_ds, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts", tiebreak_col: str = "event_id"):
    """→ ``(ev_from, ev_to, n, p_bp)``: count and within-from share
    (basis points) of each consecutive event-type transition."""

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="stable")
        a = g[type_col].to_numpy()
        if len(a) < 2:
            return pd.DataFrame({
                "ev_from": pd.Series([], dtype=object),
                "ev_to": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        out = pd.DataFrame({"ev_from": a[:-1], "ev_to": a[1:]})
        return (out.groupby(["ev_from", "ev_to"], sort=False)
                .size().astype("int64").reset_index(name="n"))

    per_user = ev_ds.groupby(user_col).map_groups(
        _pairs, batch_format="pandas")
    counts = two_phase_aggregate(
        per_user, ("ev_from", "ev_to"), {"n": ("n", "sum")})

    def _norm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["p_bp"] = (g["n"].astype("int64") * 10000) // int(g["n"].sum())
        return g

    return counts.groupby("ev_from").map_groups(
        _norm, batch_format="pandas")


def late_events(ev_ds, watermark_us: int, order_col: str = "event_id",
                ts_col: str = "ts", n_ranges: int = 64,
                keep_cols: tuple = ("user_id",)):
    """Watermark-based late-data detection — the streaming primitive
    batch engines fake with a GLOBAL running max: an event is LATE
    when its timestamp falls more than ``watermark_us`` behind the
    max timestamp of everything that ARRIVED before it (arrival order
    = ``order_col``).

    The global prefix-max is a range-partitioned scan, no sort of the
    full table: (1) min/max of ``order_col`` (one cheap aggregate)
    define n_ranges LINEAR buckets — bucket balance affects only
    load, never correctness; (2) a stateless map assigns each row its
    bucket; (3) per-bucket max(ts) — a tiny n_ranges-row table the
    driver folds into per-bucket CARRY values (prefix-max of all
    strictly earlier buckets); (4) in-bucket sort + running max,
    seeded by the carry. Rows shuffle ONCE (the bucket groupby);
    everything else is n_ranges-sized.

    → late rows only: (order_col, *keep_cols, ts_col, watermark_ts);
    ``keep_cols`` are the passthrough columns projected onto the late
    rows (default matches the events table's user_id)."""
    from ray.data.aggregate import Max, Min

    mm = ev_ds.aggregate(Min(order_col), Max(order_col))
    lo = int(mm[f"min({order_col})"])
    hi = int(mm[f"max({order_col})"])
    span = max(hi - lo + 1, 1)

    def _bucket(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        b = np.clip((o - lo) * n_ranges // span, 0, n_ranges - 1)
        return t.append_column("_b", pa.array(b.astype(np.int32)))

    bucketed = ev_ds.map_batches(_bucket,
                                 batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max

    per_bucket = bucketed.groupby("_b").aggregate(
        Max(ts_col, alias_name="mx")).to_pandas().sort_values("_b")
    carry = {}
    running = None
    for _, row in per_bucket.iterrows():
        carry[int(row["_b"])] = running  # max of STRICTLY earlier buckets
        running = row["mx"] if running is None else max(running, row["mx"])

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col)
        b = int(g["_b"].iloc[0])
        prev = g[ts_col].cummax().shift(1)
        c = carry.get(b)
        if c is not None:
            prev = prev.fillna(c).combine(
                pd.Series([c] * len(prev), index=prev.index), max)
        wm = prev - pd.Timedelta(microseconds=watermark_us)
        late = prev.notna() & (g[ts_col] < wm)
        out = g[late][[order_col, *keep_cols, ts_col]].copy()
        out["watermark_ts"] = prev[late]
        return out

    return bucketed.groupby("_b").map_groups(_scan,
                                             batch_format="pandas")


def global_running_sum(ds, order_col: str, val_col: str,
                       n_ranges: int = 64, out_col: str = "running"):
    """Global running total of ``val_col`` in ``order_col`` order —
    the classic distributed SCAN primitive (SUM() OVER (ORDER BY …)),
    generalizing :func:`late_events`' prefix-max machinery to SUM.

    No global sort: (1) min/max of ``order_col`` define n_ranges
    LINEAR buckets; (2) stateless bucket assignment; (3) per-bucket
    sums — an n_ranges-row table the driver folds into per-bucket
    CARRY offsets (sum of all strictly earlier buckets); (4) in-bucket
    sort + cumsum seeded by the carry. Rows shuffle ONCE. Requires
    ``order_col`` values to be unique for a well-defined prefix (the
    oracle's window frame) — use a unique key or break ties upstream.

    → (order_col, val_col, ``out_col``), one row per input row."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(order_col), Max(order_col))
    lo = int(mm[f"min({order_col})"])
    hi = int(mm[f"max({order_col})"])
    span = max(hi - lo + 1, 1)

    def _bucket(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        b = np.clip((o - lo) * n_ranges // span, 0, n_ranges - 1)
        return t.append_column("_b", pa.array(b.astype(np.int32)))

    bucketed = ds.select_columns([order_col, val_col]).map_batches(
        _bucket, batch_format="pyarrow").materialize()

    per_bucket = bucketed.groupby("_b").aggregate(
        Sum(val_col, alias_name="s")).to_pandas().sort_values("_b")
    carry = {}
    running = 0
    for _, row in per_bucket.iterrows():
        carry[int(row["_b"])] = running  # sum of STRICTLY earlier buckets
        running += int(row["s"])

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col)
        b = int(g["_b"].iloc[0])
        out = g[[order_col, val_col]].copy()
        out[out_col] = g[val_col].cumsum() + carry.get(b, 0)
        return out

    return bucketed.groupby("_b").map_groups(_scan,
                                             batch_format="pandas")
