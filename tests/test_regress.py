"""Grouped integer least squares (stages/regress.py)."""

from fractions import Fraction

import pytest

import ray.data as rd

from web_mass_scraper_ocr_ray.stages.regress import (
    _trunc_div,
    grouped_linear_trend,
)


def _truth(rows, keys=("g",)):
    groups = {}
    for r in rows:
        groups.setdefault(tuple(r[k] for k in keys), []).append(
            (r["x"], r["y"]))
    out = {}
    for g, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        d = n * sxx - sx * sx
        if d == 0:
            continue
        slope = Fraction(10000 * (n * sxy - sx * sy), d)
        inter = Fraction(10000 * (sy * sxx - sx * sxy), d)
        trunc = lambda f: int(f)  # Fraction.__int__ truncates toward 0
        out[g] = (n, trunc(slope), trunc(inter))
    return out


def _run(rows, keys=("g",)):
    ds = rd.from_items(rows)
    got = grouped_linear_trend(ds, keys, "x", "y").take_all()
    return {
        tuple(r[k] for k in keys): (r["n"], r["slope_bp"], r["intercept_bp"])
        for r in got
    }


class TestTruncDiv:
    def test_matches_duckdb_semantics(self):
        # measured: DuckDB SELECT -7 // 2 -> -3 (truncation, not floor)
        assert _trunc_div(-7, 2) == -3
        assert _trunc_div(7, 2) == 3
        assert _trunc_div(-1, 3) == 0


@pytest.mark.usefixtures("ray_session")
class TestGroupedLinearTrend:
    def test_exact_positive_and_negative_slopes(self):
        rows = (
            # g=1: y = 2x + 5 exactly -> slope 20000 bp, intercept 50000
            [{"g": 1, "x": x, "y": 2 * x + 5} for x in range(10)]
            # g=2: y = -3x + 100
            + [{"g": 2, "x": x, "y": -3 * x + 100} for x in range(7)]
            # g=3: noisy, non-integral slope exercises truncation
            + [{"g": 3, "x": x, "y": (x * 7) // 3 + (x % 2)}
               for x in range(9)]
        )
        assert _run(rows) == _truth(rows)
        got = _run(rows)
        assert got[(1,)][1:] == (20000, 50000)
        assert got[(2,)][1:] == (-30000, 1000000)

    def test_degenerate_single_x_dropped(self):
        rows = [{"g": 1, "x": 5, "y": v} for v in (1, 2, 3)] + [
            {"g": 2, "x": x, "y": x} for x in range(3)
        ]
        got = _run(rows)
        assert (1,) not in got
        assert got[(2,)] == (3, 10000, 0)

    def test_multi_key_groups(self):
        rows = [
            {"a": u, "b": t, "x": x, "y": u * x + 10 * x % 3}
            for u in (1, 2)
            for t in ("p", "q")
            for x in range(6)
        ]
        assert _run(rows, keys=("a", "b")) == _truth(rows, keys=("a", "b"))
