"""Profiling and skyline (stages/profile.py)."""

import pytest

import pyarrow as pa
import ray.data as rd

from web_mass_scraper_ocr_ray.stages.profile import (
    profile_columns,
    skyline_2d,
)


@pytest.mark.usefixtures("ray_session")
class TestProfile:
    def test_counts_nulls_distinct(self):
        ds = rd.from_arrow(pa.table({
            "a": pa.array([1, 1, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "x", "y"], pa.string()),
        }))
        t = profile_columns(ds, ["a", "b"])
        rows = {r["column"]: r for r in t.to_pylist()}
        assert rows["a"] == {"column": "a", "n_rows": 5, "n_nulls": 1,
                             "n_distinct": 3}
        assert rows["b"] == {"column": "b", "n_rows": 5, "n_nulls": 2,
                             "n_distinct": 2}


@pytest.mark.usefixtures("ray_session")
class TestProfileKeyEncoding:
    def test_embedded_nul_values_stay_distinct(self):
        # 1 and 1+2^16 share every byte up to the first NUL — the
        # numpy-'S8' → pa.array path truncated there (C-string
        # semantics) and merged them; FixedSizeBinary must not
        ds = rd.from_arrow(pa.table({
            "a": pa.array([1, 1 + 2**16, 1 + 2**32, 256, 2, 2 + 2**16],
                          pa.int64()),
        }))
        t = profile_columns(ds, ["a"])
        assert t.to_pylist()[0]["n_distinct"] == 6

    def test_float_bit_patterns_distinct(self):
        ds = rd.from_arrow(pa.table({
            "f": pa.array([0.0, 1.0, 1.5, -1.5, 2.0**-30], pa.float64()),
        }))
        t = profile_columns(ds, ["f"])
        assert t.to_pylist()[0]["n_distinct"] == 5


@pytest.mark.usefixtures("ray_session")
class TestSkyline:
    def _run(self, pts):
        ds = rd.from_items([
            {"doc_id": i, "t": t, "p": p}
            for i, (t, p) in enumerate(pts)])
        return sorted(r["doc_id"]
                      for r in skyline_2d(ds, "t", "p").take_all())

    def test_brute_force_agreement(self):
        import numpy as np

        rng = np.random.default_rng(11)
        pts = [(int(t), int(p)) for t, p in
               zip(rng.integers(0, 20, 60), rng.integers(0, 20, 60))]
        expect = sorted(
            i for i, (t, p) in enumerate(pts)
            if not any((t2 >= t and p2 <= p and (t2 > t or p2 < p))
                       for t2, p2 in pts))
        assert self._run(pts) == expect

    def test_ties_both_kept(self):
        # identical points never dominate each other
        assert self._run([(5, 5), (5, 5), (1, 9)]) == [0, 1]

    def test_single_point(self):
        assert self._run([(3, 3)]) == [0]
