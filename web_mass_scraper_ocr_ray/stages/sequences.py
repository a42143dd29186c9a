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

import pandas as pd

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
