"""Event transitions (stages/sequences.py) and ROLLUP aggregate
(stages/shuffle.rollup_aggregate)."""

import pyarrow as pa
import pytest

import ray.data as rd

from web_mass_scraper_ocr_ray.stages.sequences import event_transitions
from web_mass_scraper_ocr_ray.stages.shuffle import rollup_aggregate


@pytest.mark.usefixtures("ray_session")
class TestEventTransitions:
    def test_counts_and_shares(self):
        # user 1: a->b->a->b ; user 2: b->b->c ; user 3: a (no pair)
        rows = [
            {"user_id": 1, "event_id": i, "ts": i, "event_type": t}
            for i, t in enumerate("abab")
        ] + [
            {"user_id": 2, "event_id": i, "ts": i, "event_type": t}
            for i, t in enumerate("bbc")
        ] + [
            {"user_id": 3, "event_id": 0, "ts": 0, "event_type": "a"},
        ]
        got = {
            (r["ev_from"], r["ev_to"]): (r["n"], r["p_bp"])
            for r in event_transitions(rd.from_items(rows)).take_all()
        }
        # from a: a->b x2 (10000 bp); from b: b->a x1, b->b x1, b->c x1
        assert got == {
            ("a", "b"): (2, 10000),
            ("b", "a"): (1, 3333),
            ("b", "b"): (1, 3333),
            ("b", "c"): (1, 3333),
        }

    def test_order_by_ts_not_arrival(self):
        rows = [
            {"user_id": 1, "event_id": 1, "ts": 30, "event_type": "c"},
            {"user_id": 1, "event_id": 2, "ts": 10, "event_type": "a"},
            {"user_id": 1, "event_id": 3, "ts": 20, "event_type": "b"},
        ]
        got = {(r["ev_from"], r["ev_to"])
               for r in event_transitions(rd.from_items(rows)).take_all()}
        assert got == {("a", "b"), ("b", "c")}

    def test_tiebreak_on_event_id(self):
        rows = [
            {"user_id": 1, "event_id": 2, "ts": 10, "event_type": "b"},
            {"user_id": 1, "event_id": 1, "ts": 10, "event_type": "a"},
        ]
        got = {(r["ev_from"], r["ev_to"])
               for r in event_transitions(rd.from_items(rows)).take_all()}
        assert got == {("a", "b")}


@pytest.mark.usefixtures("ray_session")
class TestRollupAggregate:
    def test_all_levels_one_shuffle(self):
        rows = [
            {"s": "x", "l": "en", "v": 1},
            {"s": "x", "l": "en", "v": 2},
            {"s": "x", "l": "de", "v": 4},
            {"s": "y", "l": "en", "v": 8},
        ]
        got = {
            (r["s"], r["l"]): (r["n"], r["sv"])
            for r in rollup_aggregate(
                rd.from_items(rows), ("s", "l"),
                {"n": (None, "count"), "sv": ("v", "sum")},
            ).take_all()
        }
        assert got == {
            ("x", "en"): (2, 3),
            ("x", "de"): (1, 4),
            ("y", "en"): (1, 8),
            ("x", "(all)"): (3, 7),
            ("y", "(all)"): (1, 8),
            ("(all)", "(all)"): (4, 15),
        }

    def test_single_key_rollup(self):
        rows = [{"s": "x", "v": 1}, {"s": "y", "v": 2}]
        got = {
            r["s"]: r["sv"]
            for r in rollup_aggregate(
                rd.from_items(rows), ("s",), {"sv": ("v", "sum")}
            ).take_all()
        }
        assert got == {"x": 1, "y": 2, "(all)": 3}


@pytest.mark.usefixtures("ray_session")
class TestCubeAggregate:
    def test_all_grouping_sets(self):
        from web_mass_scraper_ocr_ray.stages.shuffle import (
            cube_aggregate,
        )

        rows = [
            {"s": "x", "l": "en", "v": 1},
            {"s": "x", "l": "de", "v": 4},
            {"s": "y", "l": "en", "v": 8},
        ]
        got = {
            (r["s"], r["l"]): (r["n"], r["sv"])
            for r in cube_aggregate(
                rd.from_items(rows), ("s", "l"),
                {"n": (None, "count"), "sv": ("v", "sum")},
            ).take_all()
        }
        assert got == {
            ("x", "en"): (1, 1),
            ("x", "de"): (1, 4),
            ("y", "en"): (1, 8),
            ("x", "(all)"): (2, 5),
            ("y", "(all)"): (1, 8),
            # CUBE adds the (all), lang sets that ROLLUP lacks
            ("(all)", "en"): (2, 9),
            ("(all)", "de"): (1, 4),
            ("(all)", "(all)"): (3, 13),
        }


@pytest.mark.usefixtures("ray_session")
class TestLateEvents:
    def _ds(self, rows):
        import pandas as pd

        return rd.from_items([
            {"event_id": i, "user_id": 1,
             "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(hours=h)}
            for i, h in rows])

    def test_in_order_stream_no_late(self):
        from web_mass_scraper_ocr_ray.stages.sequences import late_events

        ds = self._ds([(i, i) for i in range(50)])
        assert late_events(ds, 3_600_000_000, n_ranges=4
                           ).take_all() == []

    def test_late_event_found_with_cross_bucket_carry(self):
        import pandas as pd

        from web_mass_scraper_ocr_ray.stages.sequences import late_events

        # arrival ids 0..49; the max ts (hour 100) arrives FIRST (id
        # 0); a 2-hour-behind event arrives at id 40 — with n_ranges=8
        # the watermark must CARRY across buckets to catch it
        rows = [(0, 100)] + [(i, 100 + i) for i in range(1, 40)] \
            + [(40, 30)] + [(i, 140 + i) for i in range(41, 50)]
        got = late_events(self._ds(rows), 3_600_000_000,
                          n_ranges=8).take_all()
        late_ids = sorted(r["event_id"] for r in got)
        assert 40 in late_ids
        # watermark for id 40 = hour 139 (max of ids 0..39)
        wm = {r["event_id"]: r["watermark_ts"] for r in got}[40]
        assert wm == pd.Timestamp("2026-01-01") + pd.Timedelta(hours=139)


@pytest.mark.usefixtures("ray_session")
class TestGlobalRunningSum:
    def test_cross_bucket_carry(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sequences import (
            global_running_sum,
        )

        # keys span a wide range so rows land in different linear
        # buckets; the carry must thread the per-bucket sums through
        n = 40
        keys = [i * 1000 for i in range(n)]
        vals = [(i * 7) % 13 + 1 for i in range(n)]
        ds = rd.from_arrow(pa.table({
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        })).repartition(5)
        out = global_running_sum(ds, order_col="k", val_col="v",
                                 n_ranges=8, out_col="run") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        expect = 0
        for i in range(n):
            expect += vals[i]
            assert int(out.loc[i, "run"]) == expect
        assert len(out) == n

    def test_single_bucket_degenerate(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sequences import (
            global_running_sum,
        )

        ds = rd.from_arrow(pa.table({
            "k": pa.array([5, 6, 7], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int64()),
        }))
        out = global_running_sum(ds, order_col="k", val_col="v",
                                 n_ranges=64, out_col="run") \
            .to_pandas().sort_values("k")
        assert out["run"].tolist() == [10, 30, 60]
