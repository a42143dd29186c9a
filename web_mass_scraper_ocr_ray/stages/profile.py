"""Dataset profiling and the 2-D skyline (Pareto frontier) operator.

Profiling is the first thing a data engineer runs against an unknown
100 TB drop; the skyline is the classic multi-criteria "best documents"
cut (maximize one quality axis, minimize another) that a top-k by any
single score can't express.

Both follow the graft's histogram-broadcast discipline: the corpus
streams, only bounded summaries shuffle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, columns: Sequence[str]) -> pa.Table:
    """→ one row per column: (column, n_rows, n_nulls, n_distinct).

    n_rows/n_nulls come from ONE streaming pass emitting a single
    partial row per batch (k ints); n_distinct is exact — one narrow
    groupby per column over its (map-side pre-combined) distinct
    values, nulls excluded (SQL ``count(DISTINCT col)`` semantics).
    The driver only ever sees k scalars per measure."""
    cols = list(columns)

    def _null_partial(t: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([t.num_rows], pa.int64())}
        for c in cols:
            out[f"nulls_{c}"] = pa.array(
                [t.column(c).null_count], pa.int64())
        return pa.table(out)

    from ray.data.aggregate import Sum

    aggs = [Sum("n_rows", alias_name="n_rows")]
    aggs += [Sum(f"nulls_{c}", alias_name=f"nulls_{c}") for c in cols]
    totals = ds.map_batches(
        _null_partial, batch_format="pyarrow").aggregate(*aggs)

    n_distinct = {}
    for c in cols:
        d = ds.select_columns([c]).map_batches(
            lambda t, c=c: pa.table({c: t.column(c).drop_null()}),
            batch_format="pyarrow",
        ).groupby(c).count().count()
        n_distinct[c] = int(d)

    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n_rows": pa.array([int(totals["n_rows"])] * len(cols),
                           pa.int64()),
        "n_nulls": pa.array([int(totals[f"nulls_{c}"]) for c in cols],
                            pa.int64()),
        "n_distinct": pa.array([n_distinct[c] for c in cols],
                               pa.int64()),
    })


def skyline_2d(ds, max_col: str, min_col: str, id_col: str = "doc_id"):
    """2-D skyline: rows not dominated by any other (dominator has
    ``max_col`` ≥ AND ``min_col`` ≤, at least one strict). Ties at the
    same (max, min) point all stay — SQL NOT-EXISTS semantics.

    Distributed shape (the tier-extraction pattern): rows NEVER
    shuffle. One groupby(max_col).min(min_col) builds the value
    histogram — bounded by the max_col value range — the driver folds
    it into a suffix-min ("best min_col among strictly larger
    max_col") lookup, and a stateless broadcast map keeps exactly the
    non-dominated rows:
        dominated ⇔ suffix_min(max) ≤ min  OR  floor_at(max) < min.
    """
    from ray.data.aggregate import Min

    hist = ds.groupby(max_col).aggregate(
        Min(min_col, alias_name="_mn")).to_pandas().sort_values(
        max_col, ascending=False)
    ts = hist[max_col].to_numpy()                  # descending
    mins = hist["_mn"].to_numpy().astype(np.int64)
    # prefix-min over the DESCENDING order, shifted = min over
    # strictly-larger max_col
    above = np.concatenate((
        [np.iinfo(np.int64).max],
        np.minimum.accumulate(mins)[:-1],
    )) if len(ts) else np.empty(0, np.int64)
    ts_asc = ts[::-1].copy()
    above_asc = above[::-1].copy()
    floor_asc = mins[::-1].copy()

    def _keep(t: pa.Table) -> pa.Table:
        tv = np.asarray(pc.cast(t.column(max_col), pa.int64())
                        .combine_chunks())
        pv = np.asarray(pc.cast(t.column(min_col), pa.int64())
                        .combine_chunks())
        idx = np.searchsorted(ts_asc, tv)
        dominated = (above_asc[idx] <= pv) | (floor_asc[idx] < pv)
        return t.filter(pa.array(~dominated))

    return ds.map_batches(_keep, batch_format="pyarrow")
