"""chunk_token_windows / oov_rate (stages/textstats.py) and
category_diversity (stages/shuffle.py) — edge-case contracts the
sf-corpus oracle gate can't exercise (empty docs, boundary ties,
single-token windows)."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.stages.textstats import (
    chunk_token_windows,
    oov_rate,
)


@pytest.mark.usefixtures("ray_session")
class TestChunkTokenWindows:
    def _run(self, texts, ids=None, **kw):
        import ray.data as rd

        ids = ids or list(range(len(texts)))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        return chunk_token_windows(ds, **kw).to_pandas() \
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    def test_overlap_and_short_tail(self):
        # 10 tokens, window 4, stride 3 → starts 0,3,6,9
        text = " ".join(f"t{i}" for i in range(10))
        out = self._run([text], window=4, stride=3)
        assert out["chunk_idx"].tolist() == [0, 1, 2, 3]
        assert out["n_chunk_toks"].tolist() == [4, 4, 4, 1]
        assert out["chunk_text"].tolist() == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]

    def test_exact_multiple_no_empty_tail(self):
        # 6 tokens, window=stride=3 → exactly two full chunks, no
        # zero-token third chunk (start 6 is not < 6)
        out = self._run(["a b c d e f"], window=3, stride=3)
        assert out["n_chunk_toks"].tolist() == [3, 3]

    def test_empty_and_whitespace_docs_emit_nothing(self):
        out = self._run(["", "   ", "x"], window=4, stride=4)
        assert out["doc_id"].tolist() == [2]
        assert out["chunk_text"].tolist() == ["x"]

    def test_mixed_lengths_vectorized_per_index(self):
        texts = ["one", "a b c d e", " ".join(["w"] * 13)]
        out = self._run(texts, window=5, stride=5)
        per_doc = out.groupby("doc_id").size().to_dict()
        assert per_doc == {0: 1, 1: 1, 2: 3}
        # totals conserved: every token lands in exactly one chunk
        # when stride == window
        assert int(out["n_chunk_toks"].sum()) == 1 + 5 + 13

    def test_bad_params_raise(self):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["x"], pa.string()),
        }))
        with pytest.raises(ValueError):
            chunk_token_windows(ds, window=0, stride=1)
        with pytest.raises(ValueError):
            chunk_token_windows(ds, window=3, stride=0)


@pytest.mark.usefixtures("ray_session")
class TestOovRate:
    def test_top_m_boundary_tiebreak(self):
        """Vocab = top-2 by (count desc, word asc): 'b'(3), then the
        count-2 tie between 'a' and 'c' goes to 'a' — 'c' is OOV."""
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["b b a c", "b a c z"], pa.string()),
        }))
        out = oov_rate(ds, top_m=2).to_pandas().sort_values("doc_id")
        assert out["n_toks"].tolist() == [4, 4]
        assert out["n_oov"].tolist() == [1, 2]  # c | c z
        assert out["oov_bp"].tolist() == [2500, 5000]

    def test_zero_token_doc_dropped(self):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world", "   "], pa.string()),
        }))
        out = oov_rate(ds, top_m=10).to_pandas()
        assert out["doc_id"].tolist() == [0]
        assert out["n_oov"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
class TestCategoryDiversity:
    def test_dominant_and_tiebreak(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.shuffle import (
            category_diversity,
        )

        t = pa.table({
            "src": ["s1"] * 4 + ["s2"] * 2,
            "lang": ["en", "en", "de", "fr", "zz", "aa"],
        })
        out = category_diversity(rd.from_arrow(t), "src", "lang") \
            .to_pandas().sort_values("src")
        assert out["n_rows"].tolist() == [4, 2]
        assert out["n_cats"].tolist() == [3, 2]
        # s2 ties 1-1 → lexicographically first category wins
        assert out["top_cat"].tolist() == ["en", "aa"]
        assert out["top_cat_bp"].tolist() == [5000, 5000]

    def test_partials_merge_across_blocks(self):
        """The same (key, cat) pair arriving from many blocks must
        merge to one global count."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.shuffle import (
            category_diversity,
        )

        tables = [
            pa.table({"src": ["h"] * 3, "lang": ["en", "en", "de"]})
            for _ in range(6)
        ]
        out = category_diversity(rd.from_arrow(tables), "src", "lang") \
            .to_pandas()
        assert len(out) == 1
        assert int(out["n_rows"].iloc[0]) == 18
        assert int(out["top_cat_bp"].iloc[0]) == 6666


class TestInvertedIndex:
    def test_df_exact_and_postings_capped(self, ray_session):
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import inverted_index

        # 'the' appears in all 30 docs (df=30 > cap), 'uniq<i>' in one
        docs = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": [f"the uniq{i} tail" for i in range(30)],
        })
        out = inverted_index(
            rd.from_arrow(docs).repartition(5), max_postings=10
        ).to_pandas().set_index("word")
        assert out.loc["the", "df"] == 30
        # postings capped at 10 smallest doc_ids, ascending
        assert out.loc["the", "postings"] == ",".join(map(str, range(10)))
        assert out.loc["uniq7", "df"] == 1
        assert out.loc["uniq7", "postings"] == "7"
        assert out.loc["tail", "df"] == 30
        # duplicate tokens within one doc count once toward df
        out2 = inverted_index(
            rd.from_arrow(pa.table({
                "doc_id": pa.array([1], pa.int64()),
                "text": ["x x x y"],
            })), max_postings=10).to_pandas().set_index("word")
        assert out2.loc["x", "df"] == 1
