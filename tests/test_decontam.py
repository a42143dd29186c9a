"""Boilerplate-line removal + benchmark decontamination unit tests.

Hand-built corpora with known boilerplate / contamination so the exact
integer outputs (line counts, n-gram position counts) are asserted
directly; the sf-corpus equivalence is covered by the driver oracles
(``doc_boilerplate``, ``doc_decontaminate``).
"""

import pyarrow as pa
import pytest


def _from_rows(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


class TestBoilerplateRemoval:
    def _corpus(self):
        # "promo" appears in 3 docs of source A → boilerplate at
        # min_docs=3; "promo" in source B appears once → kept (the
        # grouping is per source); "rare" appears twice in A → kept.
        return _from_rows([
            {"doc_id": 0, "source": "A", "text": "promo\nalpha\nrare"},
            {"doc_id": 1, "source": "A", "text": "promo\nbeta"},
            {"doc_id": 2, "source": "A", "text": "gamma\npromo\nrare"},
            {"doc_id": 3, "source": "B", "text": "promo\ndelta"},
        ])

    def test_group_scoped_threshold(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import (
            remove_boilerplate_lines,
        )

        out = {
            r["doc_id"]: r
            for r in remove_boilerplate_lines(
                self._corpus(), min_docs=3).take_all()
        }
        assert out[0]["text_clean"] == "alpha\nrare"
        assert (out[0]["n_lines"], out[0]["n_boiler"]) == (3, 1)
        assert out[1]["text_clean"] == "beta"
        # order preserved: boiler line was in the middle of doc 2
        assert out[2]["text_clean"] == "gamma\nrare"
        # source B's single "promo" survives — frequency is per group
        assert out[3]["text_clean"] == "promo\ndelta"
        assert out[3]["n_boiler"] == 0

    def test_line_doc_freq_counts_distinct_docs(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import line_doc_freq

        # a line repeated WITHIN one doc counts that doc once
        ds = _from_rows([
            {"doc_id": 0, "source": "A", "text": "x\nx\ny"},
            {"doc_id": 1, "source": "A", "text": "x"},
        ])
        freq = {r["gl"]: r["n_docs"] for r in line_doc_freq(ds).take_all()}
        assert freq["A\x00x"] == 2
        assert freq["A\x00y"] == 1

    def test_all_lines_boiler_gives_empty_text(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import (
            remove_boilerplate_lines,
        )

        ds = _from_rows([
            {"doc_id": i, "source": "A", "text": "same"} for i in range(3)
        ])
        rows = remove_boilerplate_lines(ds, min_docs=3).take_all()
        assert all(r["text_clean"] == "" and r["n_boiler"] == 1
                   for r in rows)

    def test_no_boiler_is_identity(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import (
            remove_boilerplate_lines,
        )

        ds = _from_rows([
            {"doc_id": 0, "source": "A", "text": "a\nb"},
            {"doc_id": 1, "source": "A", "text": "c"},
        ])
        out = {r["doc_id"]: r["text_clean"]
               for r in remove_boilerplate_lines(ds, min_docs=2).take_all()}
        assert out == {0: "a\nb", 1: "c"}


class TestDecontaminate:
    def test_position_counts_and_flag(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import decontaminate

        bench = _from_rows([{"doc_id": 100, "text": "a b c d"}])
        train = _from_rows([
            # contains "a b c" twice (positions 0 and 3) and "b c d" once
            {"doc_id": 0, "text": "a b c a b c d"},
            {"doc_id": 1, "text": "x y z w v u"},
            {"doc_id": 2, "text": "too short"},  # < n tokens → 0 grams
        ])
        out = {r["doc_id"]: r
               for r in decontaminate(train, bench, n=3).take_all()}
        assert out[0]["n_grams"] == 5
        assert out[0]["n_contaminated"] == 3  # a-b-c, a-b-c, b-c-d
        assert out[0]["contaminated"] == 1
        assert out[1] == {"doc_id": 1, "n_grams": 4,
                          "n_contaminated": 0, "contaminated": 0}
        assert out[2]["n_grams"] == 0
        assert out[2]["contaminated"] == 0

    def test_whitespace_runs_collapse(self, ray_session):
        """Tokenization splits on \\s+ with empties dropped, so extra
        spacing in either corpus does not change gram identity."""
        from web_mass_scraper_ocr_ray.stages.decontam import decontaminate

        bench = _from_rows([{"doc_id": 9, "text": "  p   q r  "}])
        train = _from_rows([{"doc_id": 0, "text": "p q\t\tr"}])
        (row,) = decontaminate(train, bench, n=3).take_all()
        assert row["n_contaminated"] == 1

    def test_empty_benchmark(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.decontam import decontaminate

        bench = _from_rows([{"doc_id": 1, "text": "x"}])  # no 3-grams
        train = _from_rows([{"doc_id": 0, "text": "a b c d"}])
        (row,) = decontaminate(train, bench, n=3).take_all()
        assert row["n_grams"] == 2 and row["n_contaminated"] == 0


class TestBoilerplateSizeGuard:
    def test_adversarial_every_line_frequent_raises(self, ray_session):
        """Adversarial corpus where EVERY line is boilerplate: the
        'small by definition' broadcast assumption breaks and the guard
        must refuse loudly instead of pulling the set to the driver."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.decontam import (
            remove_boilerplate_lines,
        )

        shared = "\n".join(f"shared line {i}" for i in range(50))
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "source": pa.array(["s"] * 10),
            "text": pa.array([shared] * 10),
        }))
        with pytest.raises(ValueError, match="not small"):
            remove_boilerplate_lines(docs, min_docs=2,
                                     max_boiler_lines=10)
        with pytest.raises(ValueError, match="not small"):
            remove_boilerplate_lines(docs, min_docs=2,
                                     max_boiler_bytes=64)
        # generous budget → same corpus passes and strips everything
        out = remove_boilerplate_lines(docs, min_docs=2).take_all()
        assert all(r["text_clean"] == "" for r in out)
        assert all(r["n_boiler"] == 50 for r in out)


class TestDedupLinesKeepFirst:
    def _out(self, rows):
        from web_mass_scraper_ocr_ray.stages.decontam import (
            dedup_lines_keep_first,
        )

        out = dedup_lines_keep_first(_from_rows(rows)).take_all()
        return {r["doc_id"]: r for r in out}

    def test_keep_first_across_docs(self, ray_session):
        got = self._out([
            {"doc_id": 0, "text": "shared\nunique0"},
            {"doc_id": 1, "text": "unique1\nshared"},
            {"doc_id": 2, "text": "shared"},
        ])
        assert got[0]["text_dedup"] == "shared\nunique0"
        assert got[1]["text_dedup"] == "unique1"
        assert got[2]["text_dedup"] == ""
        assert (got[0]["n_dropped"], got[1]["n_dropped"],
                got[2]["n_dropped"]) == (0, 1, 1)

    def test_within_doc_later_copy_drops(self, ray_session):
        got = self._out([{"doc_id": 5, "text": "a\nb\na"}])
        assert got[5]["text_dedup"] == "a\nb"
        assert got[5]["n_lines"] == 3 and got[5]["n_dropped"] == 1

    def test_empty_lines_always_kept(self, ray_session):
        got = self._out([
            {"doc_id": 0, "text": "x\n\ny"},
            {"doc_id": 1, "text": "\n\nx"},
        ])
        assert got[0]["text_dedup"] == "x\n\ny"
        # doc 1 loses 'x' (doc 0 owns it) but keeps both empties
        assert got[1]["text_dedup"] == "\n"
        assert got[1]["n_lines"] == 3 and got[1]["n_dropped"] == 1

    def test_position_breaks_tie_within_doc(self, ray_session):
        # first occurrence by (doc_id, pos): doc 0 pos 0 wins over pos 2
        got = self._out([{"doc_id": 0, "text": "t\nmid\nt\nend"}])
        assert got[0]["text_dedup"] == "t\nmid\nend"

    def test_every_doc_in_output(self, ray_session):
        rows = [{"doc_id": i, "text": f"only{i}"} for i in range(20)]
        got = self._out(rows)
        assert len(got) == 20
        assert all(got[i]["text_dedup"] == f"only{i}" for i in range(20))
