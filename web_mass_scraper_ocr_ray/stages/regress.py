"""Grouped closed-form least squares from integer sufficient stats.

The distributed shape every "per-segment trend" task reduces to:
ordinary least squares over (x, y) needs only the five sufficient
statistics (n, Σx, Σy, Σxy, Σx²), each an associative SUM — so the
whole regression is one map-side-combined aggregate (the same
two-phase plumbing as every rollup here, `stages/shuffle.py`), and the
closed form runs on the tiny one-row-per-group result. No iterative
solver, no driver-side data, no second pass.

Exactness contract: x and y must be INTEGERS (callers pre-scale —
days since an origin, centi-units) so the sufficient sums are exact
and the slope/intercept, emitted in basis points via truncating
integer division, are bit-stable regardless of summation order. The
finalize kernel uses Python ints (arbitrary precision): with int64
inputs, n·Σxy products can exceed 2⁶³ long before any real corpus
limit is reached. Callers keep |x| and |y| modest (center/rescale) so
the PARTIAL sums stay inside int64 on the Arrow side.

Truncating (not floor) division mirrors DuckDB's `//` on negatives —
measured: ``SELECT -7 // 2`` → -3.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import two_phase_aggregate


def _trunc_div(num: int, den: int) -> int:
    """Truncate-toward-zero integer division (DuckDB `//`); den > 0."""
    q = abs(num) // den
    return -q if num < 0 else q


def grouped_linear_trend(ds, keys, x_col: str, y_col: str):
    """→ one row per group: ``(*keys, n, slope_bp, intercept_bp)``.

    ``slope_bp``  = trunc(10000 · (n·Σxy − Σx·Σy) / D),
    ``intercept_bp`` = trunc(10000 · (Σy·Σx² − Σx·Σxy) / D),
    D = n·Σx² − (Σx)². Groups with D = 0 (fewer than two distinct x —
    a vertical line has no slope) are dropped, not nulled: a NULL
    metric column would poison downstream arithmetic silently.
    """
    if isinstance(keys, str):
        keys = (keys,)
    keys = tuple(keys)

    def _prods(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.int64())
        y = pc.cast(t.column(y_col), pa.int64())
        cols = {k: t.column(k) for k in keys}
        cols["_x"] = x
        cols["_y"] = y
        cols["_xy"] = pc.multiply_checked(x, y)
        cols["_xx"] = pc.multiply_checked(x, x)
        return pa.table(cols)

    stats = two_phase_aggregate(
        ds.map_batches(_prods, batch_format="pyarrow"),
        keys,
        {
            "n": (None, "count"),
            "sx": ("_x", "sum"),
            "sy": ("_y", "sum"),
            "sxy": ("_xy", "sum"),
            "sxx": ("_xx", "sum"),
        },
    )

    def _solve(t: pa.Table) -> pa.Table:
        n = t.column("n").to_pylist()
        sx = t.column("sx").to_pylist()
        sy = t.column("sy").to_pylist()
        sxy = t.column("sxy").to_pylist()
        sxx = t.column("sxx").to_pylist()
        keep, slope, intercept = [], [], []
        for i in range(t.num_rows):
            d = n[i] * sxx[i] - sx[i] * sx[i]  # Python ints: exact
            if d == 0:
                keep.append(False)
                slope.append(0)
                intercept.append(0)
                continue
            keep.append(True)
            slope.append(_trunc_div(10000 * (n[i] * sxy[i] - sx[i] * sy[i]), d))
            intercept.append(
                _trunc_div(10000 * (sy[i] * sxx[i] - sx[i] * sxy[i]), d))
        out = pa.table({
            **{k: t.column(k) for k in keys},
            "n": t.column("n"),
            "slope_bp": pa.array(slope, pa.int64()),
            "intercept_bp": pa.array(intercept, pa.int64()),
        })
        return out.filter(pa.array(keep))

    return stats.map_batches(_solve, batch_format="pyarrow")
