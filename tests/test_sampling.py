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
