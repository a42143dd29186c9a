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


@pytest.mark.usefixtures("ray_session")
class TestKsDistance:
    def test_identical_distributions_zero(self):
        from web_mass_scraper_ocr_ray.stages.profile import ks_distance

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "a", "b", "b"], pa.string()),
            "v": pa.array([1, 2, 1, 2], pa.int64()),
        }))
        row = ks_distance(ds, "v", "g", "a", "b").to_pylist()[0]
        assert row == {"n_a": 2, "n_b": 2, "d_num": 0}

    def test_known_small_case(self):
        from web_mass_scraper_ocr_ray.stages.profile import ks_distance

        # a = {1,2,3}, b = {3,4}; D = max|F_a - F_b| = 2/3 at x in [2,3)
        # d_num over n_a*n_b = 6: cum_a*2 - cum_b*3 → max |...| = 4
        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "a", "a", "b", "b", "z"], pa.string()),
            "v": pa.array([1, 2, 3, 3, 4, 99], pa.int64()),
        }))
        row = ks_distance(ds, "v", "g", "a", "b").to_pylist()[0]
        assert row["n_a"] == 3 and row["n_b"] == 2
        assert row["d_num"] == 4          # D = 4/6 = 2/3
        assert row["d_num"] / (row["n_a"] * row["n_b"]) == 2 / 3

    def test_other_groups_excluded(self):
        from web_mass_scraper_ocr_ray.stages.profile import ks_distance

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "b", "c", "c"], pa.string()),
            "v": pa.array([5, 5, 0, 100], pa.int64()),
        }))
        row = ks_distance(ds, "v", "g", "a", "b").to_pylist()[0]
        assert row == {"n_a": 1, "n_b": 1, "d_num": 0}


@pytest.mark.usefixtures("ray_session")
class TestConstraintAudit:
    def test_counts_violations_and_duplicates(self):
        import pyarrow.compute as pc

        from web_mass_scraper_ocr_ray.stages.profile import (
            constraint_audit,
        )

        ds = rd.from_arrow(pa.table({
            "id": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
            "x": pa.array([0, None, 5, -1, 2, None], pa.int64()),
        })).repartition(3)

        def _null_x(t):
            return t.column("x").null_count

        def _neg_x(t):
            lt = pc.less(t.column("x"), 0)
            s = pc.sum(pc.cast(pc.fill_null(lt, False), pa.int64()))
            return int(s.as_py() or 0)

        out = constraint_audit(
            ds, {"null_x": _null_x, "neg_x": _neg_x}, unique_col="id")
        rows = {r["check"]: r["n_violations"] for r in out.to_pylist()}
        assert rows == {"null_x": 2, "neg_x": 1, "duplicate_id": 3}

    def test_no_unique_col(self):
        from web_mass_scraper_ocr_ray.stages.profile import (
            constraint_audit,
        )

        ds = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
        out = constraint_audit(ds, {"never": lambda t: 0})
        assert out.to_pylist() == [{"check": "never", "n_violations": 0}]
