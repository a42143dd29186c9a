"""Unit tests for stages/broadcast.VecLut — the vectorized
broadcast-map lookup that replaced the per-row dict.get stamp loops
(r4 verdict action #4)."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.stages.broadcast import VecLut


class TestVecLut:
    def test_matches_dict_lookup(self):
        keys = [7, 3, 11, 5]
        names = ["g", "c", "k", "e"]
        lut = VecLut(keys, {"name": names})
        ref = dict(zip(keys, names))
        batch = np.array([5, 5, 7, 11, 3, 7])
        assert lut.take(batch, "name").to_pylist() == \
            [ref[k] for k in batch]

    def test_missing_key_raises_without_default(self):
        lut = VecLut([1, 2], {"v": [10, 20]})
        with pytest.raises(KeyError):
            lut.take(np.array([1, 99]), "v")
        # keys past both ends of the sorted range
        with pytest.raises(KeyError):
            lut.take(np.array([0]), "v")
        with pytest.raises(KeyError):
            lut.take(np.array([3]), "v")

    def test_default_fills_missing(self):
        lut = VecLut([1, 2], {"v": ["a", "b"]}, defaults={"v": "UNK"})
        out = lut.take(np.array([2, 99, 1, -5]), "v")
        assert out.to_pylist() == ["b", "UNK", "a", "UNK"]

    def test_contains_and_len(self):
        lut = VecLut([4, 8], {"v": [1, 2]})
        assert len(lut) == 2
        assert lut.contains(np.array([4, 5, 8])).tolist() == \
            [True, False, True]

    def test_multi_column_and_arrow_values(self):
        lut = VecLut(np.array([2, 1]),
                     {"a": pa.array([20, 10]),
                      "b": pa.array(["x", "y"])})
        assert lut.take(np.array([1, 2]), "a").to_pylist() == [10, 20]
        assert lut.take(np.array([1, 2]), "b").to_pylist() == ["y", "x"]

    def test_duplicate_or_empty_keys_rejected(self):
        with pytest.raises(ValueError):
            VecLut([1, 1], {"v": [1, 2]})
        with pytest.raises(ValueError):
            VecLut([], {"v": []})
        with pytest.raises(ValueError):
            VecLut([1, 2], {"v": [1]})

    def test_chunked_key_input(self):
        lut = VecLut([1, 2, 3], {"v": [10, 20, 30]})
        chunked = pa.chunked_array([pa.array([3, 1]), pa.array([2])])
        assert lut.take(chunked, "v").to_pylist() == [30, 10, 20]
