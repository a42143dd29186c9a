"""cap_per_group (stages/sampling.py) — the per-domain cap.

Exactness contract: output == first k rows per group under the order,
regardless of how rows are split across batches (the per-batch partial
must never cut a row that belongs to the global top-k).
"""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.stages.sampling import (
    _group_topk,
    cap_per_group,
)


class TestGroupTopkKernel:
    def test_basic(self):
        t = pa.table({
            "g": ["a", "b", "a", "a", "b"],
            "o": [3, 1, 1, 2, 2],
        })
        out = _group_topk(t, "g", 2, [("o", "ascending")])
        rows = sorted(zip(out.column("g").to_pylist(),
                          out.column("o").to_pylist()))
        assert rows == [("a", 1), ("a", 2), ("b", 1), ("b", 2)]

    def test_k_exceeds_group(self):
        t = pa.table({"g": ["a"], "o": [9]})
        out = _group_topk(t, "g", 5, [("o", "ascending")])
        assert out.num_rows == 1

    def test_empty(self):
        t = pa.table({"g": pa.array([], pa.string()),
                      "o": pa.array([], pa.int64())})
        assert _group_topk(t, "g", 3, [("o", "ascending")]).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestCapPerGroup:
    def test_hot_group_spanning_blocks(self):
        """A 600-row 'viral' domain split over many blocks must still
        yield exactly its k globally-first rows."""
        import ray.data as rd

        rng = np.random.RandomState(7)
        order = rng.permutation(600)
        tables = [
            pa.table({
                "host": pa.array(["hot"] * 60 + [f"cold{i}" for i in range(5)]),
                "ord": pa.array(list(order[b * 60:(b + 1) * 60])
                                + list(range(5)), pa.int64()),
            })
            for b in range(10)
        ]
        ds = rd.from_arrow(tables)
        out = cap_per_group(ds, "host", k=4, order_col="ord").to_pandas()
        hot = sorted(out[out.host == "hot"]["ord"].tolist())
        assert hot == [0, 1, 2, 3]  # the 4 globally smallest, not per-block
        # every cold group kept at most 4 of its 10 duplicated ords
        for g, sub in out[out.host != "hot"].groupby("host"):
            i = int(g[4:])  # cold<i> carries ord=i in all 10 blocks
            assert len(sub) == 4 and sorted(sub["ord"]) == [i] * 4

    def test_tiebreak_column(self):
        import ray.data as rd

        t = pa.table({
            "g": ["x"] * 4,
            "o": [1, 1, 1, 1],
            "tie": [4, 2, 3, 1],
        })
        out = cap_per_group(rd.from_arrow(t), "g", k=2,
                            order_col="o", tiebreak_col="tie").to_pandas()
        assert sorted(out["tie"].tolist()) == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestUpsampleByGroup:
    def test_factors_and_copy_idx(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            upsample_by_group,
        )

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "g": ["a", "b", "c"],
        })
        out = upsample_by_group(
            rd.from_arrow(t), "g", {"a": 1, "b": 3, "c": 0},
        ).to_pandas().sort_values(["id", "copy_idx"])
        assert out["id"].tolist() == [1, 2, 2, 2]
        assert out[out.id == 2]["copy_idx"].tolist() == [0, 1, 2]

    def test_default_factor(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            upsample_by_group,
        )

        t = pa.table({"id": [7], "g": ["unknown"]})
        out = upsample_by_group(rd.from_arrow(t), "g", {}, default=2)
        assert out.count() == 2


@pytest.mark.usefixtures("ray_session")
class TestShardByHash:
    def test_partition_and_order(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            sample_buckets,
            shard_by_hash,
        )

        ids = np.arange(100, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
        out = shard_by_hash(ds, "doc_id", 4).to_pandas()
        assert len(out) == 100
        assert set(out["shard"].unique()) <= set(range(4))
        h = (out["doc_id"].to_numpy().astype(np.uint64)
             * np.uint64(2654435761)) % np.uint64(2**32)
        # within every shard, pos_in_shard follows (hash, id) order 0..n-1
        for s, sub in out.groupby("shard"):
            sub = sub.sort_values("pos_in_shard")
            assert sub["pos_in_shard"].tolist() == list(range(len(sub)))
            hh = (sub["doc_id"].to_numpy().astype(np.uint64)
                  * np.uint64(2654435761)) % np.uint64(2**32)
            assert (np.diff(hh.astype(np.int64)) >= 0).all()

    def test_deterministic_across_runs(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import shard_by_hash

        ds = rd.from_arrow(pa.table(
            {"doc_id": pa.array(list(range(50)), pa.int64())}))
        a = shard_by_hash(ds, "doc_id", 4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = shard_by_hash(ds, "doc_id", 4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestAssignSplits:
    def test_shares_and_stability(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            assign_splits,
            sample_buckets,
        )

        ids = np.arange(2000, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
        out = assign_splits(ds, "doc_id").to_pandas()
        counts = out["split"].value_counts()
        # deterministic expected counts from the hash itself
        buckets = sample_buckets(ids)
        assert counts.get("train", 0) == int((buckets < 9000).sum())
        assert counts.get("val", 0) == int(
            ((buckets >= 9000) & (buckets < 9500)).sum())
        # growing the corpus never changes an existing row's split
        bigger = assign_splits(
            rd.from_arrow(pa.table(
                {"doc_id": pa.array(np.arange(4000, dtype=np.int64))})),
            "doc_id").to_pandas()
        merged = out.merge(bigger, on="doc_id", suffixes=("_a", "_b"))
        assert (merged["split_a"] == merged["split_b"]).all()

    def test_bad_shares_raise(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import assign_splits

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            assign_splits(ds, "doc_id", splits=[("a", 1), ("b", 2)])


@pytest.mark.usefixtures("ray_session")
class TestPackTokenBudget:
    def test_contiguous_layout(self):
        """Within every shard: docs in id order tile the stream with
        no gaps — offset(i+1) == (offset(i) + cost(i)) mod-folded into
        bins; total cost is conserved."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            pack_token_budget,
        )

        rng = np.random.RandomState(3)
        ids = np.arange(300, dtype=np.int64)
        cost = rng.randint(1, 900, size=300).astype(np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": ids, "n": cost}))
        out = pack_token_budget(ds, "doc_id", "n", budget=1000,
                                n_shards=3).to_pandas()
        assert len(out) == 300
        for _, sub in out.groupby("shard"):
            sub = sub.sort_values("doc_id")
            stream = sub["bin_id"].to_numpy() * 1000 \
                + sub["bin_offset"].to_numpy()
            expect = np.concatenate(
                [[0], np.cumsum(sub["n"].to_numpy())[:-1]])
            assert (stream == expect).all()
        # offsets always inside the budget
        assert (out["bin_offset"] < 1000).all()

    def test_single_giant_doc(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            pack_token_budget,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([10, 11], pa.int64()),
            "n": pa.array([5000, 3], pa.int64()),
        }))
        out = pack_token_budget(ds, "doc_id", "n", budget=100,
                                n_shards=1).to_pandas() \
            .sort_values("doc_id")
        # giant doc starts at bin 0; next doc starts where it ended
        assert out["bin_id"].tolist() == [0, 50]
        assert out["bin_offset"].tolist() == [0, 0]


@pytest.mark.usefixtures("ray_session")
class TestLatestPerGroup:
    def test_argmax_and_tiebreak(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            latest_per_group,
        )

        t = pa.table({
            "k": ["u", "u", "u", "v"],
            "ts": pa.array([5, 9, 9, 1], pa.int64()),
            "id": pa.array([1, 2, 3, 4], pa.int64()),
        })
        out = latest_per_group(rd.from_arrow(t), "k", "ts", "id") \
            .to_pandas().sort_values("k")
        assert out["id"].tolist() == [3, 4]  # ties → greatest id

    def test_hot_key_spanning_blocks(self):
        """The winner must be global even when the hot key's rows are
        scattered across many blocks (the partial keeps only one
        candidate per block)."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            latest_per_group,
        )

        tables = [
            pa.table({
                "k": ["hot"] * 10,
                "ts": pa.array(list(range(b * 10, b * 10 + 10)),
                               pa.int64()),
                "id": pa.array(list(range(10)), pa.int64()),
            })
            for b in range(8)
        ]
        out = latest_per_group(rd.from_arrow(tables), "k", "ts", "id") \
            .to_pandas()
        assert len(out) == 1
        assert out["ts"].iloc[0] == 79


class TestRankPerGroup:
    def test_rank_and_skew_bucket(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.sampling import rank_per_group

        # hot group 'a' (50 rows) + tiny 'b'; ranks dense per group
        rows = pa.table({
            "g": ["a"] * 50 + ["b"] * 3,
            "k": [f"{i:03d}" for i in range(50)] + ["x", "y", "z"],
        })
        out = rank_per_group(
            rd.from_arrow(rows).repartition(4), group_col="g",
            order_col="k").to_pandas()
        a = out[out.g == "a"].sort_values("k")
        assert list(a.group_rank) == list(range(50))
        b = out[out.g == "b"].sort_values("k")
        assert list(b.group_rank) == [0, 1, 2]

    def test_empty_ok(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.sampling import rank_per_group

        out = rank_per_group(
            rd.from_arrow(pa.table({"g": pa.array([], pa.string()),
                                    "k": pa.array([], pa.string())})),
            group_col="g", order_col="k").to_pandas()
        assert len(out) == 0


class TestLagPerGroup:
    def test_lag_and_run_starts(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.sampling import lag_per_group

        t = pa.table({
            "g": ["u1", "u1", "u1", "u2", "u2", "u3"],
            "o": [2, 1, 3, 1, 2, 1],
            "v": ["b", "a", "c", "p", "q", "z"],
        })
        out = lag_per_group(
            rd.from_arrow(t).repartition(3), group_col="g",
            order_col="o", value_col="v").to_pandas()
        out = out.sort_values(["g", "o"], ignore_index=True)
        assert list(out.prev_v) == [None, "a", "b", None, "p", None]

    def test_hot_group_spanning_blocks(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.sampling import lag_per_group

        n = 40
        t = pa.table({
            "g": ["hot"] * n + ["cold"],
            "o": list(range(n)) + [0],
            "v": [f"v{i:02d}" for i in range(n)] + ["c0"],
        })
        out = lag_per_group(
            rd.from_arrow(t).repartition(5), group_col="g",
            order_col="o", value_col="v").to_pandas()
        hot = out[out.g == "hot"].sort_values("o")
        assert list(hot.prev_v) == [None] + [f"v{i:02d}" for i in range(n - 1)]
        cold = out[out.g == "cold"]
        assert list(cold.prev_v) == [None]

    def test_timestamp_order_column(self, ray_session):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.sampling import lag_per_group

        base = dt.datetime(2024, 1, 1)
        t = pa.table({
            "g": ["u", "u"],
            "o": pa.array([base + dt.timedelta(hours=1), base],
                          pa.timestamp("us")),
            "v": ["second", "first"],
        })
        out = lag_per_group(
            rd.from_arrow(t), group_col="g", order_col="o",
            value_col="v").to_pandas().sort_values("o", ignore_index=True)
        assert list(out.prev_v) == [None, "first"]


class TestApportionBudget:
    def _run(self, counts, budget):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            apportion_budget,
        )

        ds = rd.from_items([{"host": k, "n": v}
                            for k, v in sorted(counts.items())])
        rows = apportion_budget(ds, "host", "n", budget).take_all()
        return {r["host"]: r["quota"] for r in rows}

    @staticmethod
    def _ref(counts, budget):
        total = sum(counts.values())
        fl = {k: budget * v // total for k, v in counts.items()}
        rem = {k: budget * v % total for k, v in counts.items()}
        extra = budget - sum(fl.values())
        order = sorted(counts, key=lambda k: (-rem[k], k))
        for k in order[:extra]:
            fl[k] += 1
        return fl

    def test_sums_exactly_and_matches_reference(self, ray_session):
        counts = {"a": 7, "b": 13, "c": 1, "d": 29, "e": 3}
        for budget in (10, 53, 100, 1):
            got = self._run(counts, budget)
            assert sum(got.values()) == budget, budget
            assert got == self._ref(counts, budget), budget

    def test_tie_break_by_key_asc(self, ray_session):
        # equal counts -> equal remainders; the first keys by name win
        counts = {"w": 1, "x": 1, "y": 1, "z": 1}
        got = self._run(counts, 6)  # floor 1 each, 2 extra -> w, x
        assert got == {"w": 2, "x": 2, "y": 1, "z": 1}

    def test_exact_division_no_awards(self, ray_session):
        got = self._run({"a": 2, "b": 2}, 10)
        assert got == {"a": 5, "b": 5}

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            apportion_budget,
        )

        ds = rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "n": pa.array([], pa.int64())}))
        assert apportion_budget(ds, "host", "n", 100).count() == 0


class TestSampleBottomkPerGroup:
    def test_exact_k_per_group_and_small_groups(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            sample_bottomk_per_group,
        )

        t = pa.table({
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "g": pa.array((["a"] * 30) + (["b"] * 8) + (["c"] * 2),
                          pa.string()),
        })
        out = sample_bottomk_per_group(
            rd.from_arrow(t).repartition(7), "doc_id", "g", k=5
        ).to_pandas()
        sizes = out.groupby("g").size().to_dict()
        assert sizes == {"a": 5, "b": 5, "c": 2}   # small group keeps all

    def test_matches_global_hash_order(self, ray_session):
        import numpy as np
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.sampling import (
            _M32,
            _MIX,
            sample_bottomk_per_group,
        )

        ids = np.arange(100, dtype=np.int64)
        groups = ["g%d" % (i % 3) for i in range(100)]
        t = pa.table({"doc_id": pa.array(ids),
                      "g": pa.array(groups, pa.string())})
        out = sample_bottomk_per_group(
            rd.from_arrow(t).repartition(9), "doc_id", "g", k=4
        ).to_pandas()
        hv = ((ids.astype(np.uint64) * _MIX) % _M32).astype(np.int64)
        for g in ("g0", "g1", "g2"):
            want = sorted(
                hv[i] for i in range(100) if groups[i] == g)[:4]
            got = sorted(out[out["g"] == g]["hv"].tolist())
            assert got == want


class TestZorderLayout:
    def test_zorder_key_interleaves_bits(self):
        import numpy as np
        from web_mass_scraper_ocr_ray.stages.shuffle import zorder_key

        a = np.array([0b101, 0, 1023])
        b = np.array([0b011, 0, 1023])
        z = zorder_key(a, b, bits=10)
        # bit i of a -> 2i, bit i of b -> 2i+1
        assert z[0] == (1 << 0) | (1 << 1) | (1 << 3) | (1 << 4)
        assert z[1] == 0
        assert z[2] == (1 << 20) - 1

    def test_zorder_key_rejects_out_of_range(self):
        import numpy as np
        import pytest
        from web_mass_scraper_ocr_ray.stages.shuffle import zorder_key

        with pytest.raises(ValueError, match="negative"):
            zorder_key(np.array([-1]), np.array([0]), bits=4)
        with pytest.raises(ValueError, match="exceed"):
            zorder_key(np.array([16]), np.array([0]), bits=4)

    def test_layout_locality_and_shard_pruning(self, ray_session):
        """The point of Z-order: a range predicate on EITHER axis maps
        to a bounded set of shards (both axes prune), unlike a
        single-axis sort where only the leading axis prunes."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.shuffle import zorder_layout

        n = 1 << 10
        rng = np.arange(n)
        a = rng % 32          # 5 bits used
        b = (rng // 32) % 32  # 5 bits used
        ds = rd.from_arrow(pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}))
        out = zorder_layout(ds, "a", "b", bits=5, n_shards=16).to_pandas()
        assert len(out) == n
        assert out["zshard"].nunique() == 16
        assert (out["zshard"].to_numpy()
                == (out["zkey"].to_numpy() >> 6)).all()
        # each axis's low range touches only a strict subset of shards
        for col in ("a", "b"):
            hit = out.loc[out[col] < 8, "zshard"].nunique()
            assert hit <= 8, f"{col}-range hits {hit} shards of 16"

    def test_rejects_non_power_of_two_shards(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        import pytest
        from web_mass_scraper_ocr_ray.stages.shuffle import zorder_layout

        ds = rd.from_arrow(pa.table({"a": [1], "b": [1]}))
        with pytest.raises(ValueError, match="power of two"):
            zorder_layout(ds, "a", "b", bits=4, n_shards=6)
