"""Exact duplicated-span detection (token-window dedup) unit tests —
hand corpora with known shared passages; the sf-corpus equivalence is
covered by the driver oracle (``dedup_spans``)."""

import pyarrow as pa


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


class TestWindowDupStats:
    def test_shared_passage_one_span(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            window_dup_stats,
        )

        # docs 0/1 share the passage "a b c d e" (w=3 → 3 shared
        # windows, consecutive → ONE span each); doc 2 is disjoint
        out = {r["doc_id"]: r for r in window_dup_stats(_ds([
            {"doc_id": 0, "text": "a b c d e x y z"},
            {"doc_id": 1, "text": "p q a b c d e"},
            {"doc_id": 2, "text": "m n o m n o m n o"},
        ]), w=3).take_all()}
        assert out[0] == {"doc_id": 0, "n_windows": 6,
                          "n_dup_windows": 3, "n_dup_spans": 1}
        assert out[1] == {"doc_id": 1, "n_windows": 5,
                          "n_dup_windows": 3, "n_dup_spans": 1}
        # repeats WITHIN one doc are not cross-doc duplicates
        assert out[2]["n_dup_windows"] == 0

    def test_two_disjoint_spans(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            window_dup_stats,
        )

        out = {r["doc_id"]: r for r in window_dup_stats(_ds([
            {"doc_id": 0, "text": "a b c GAP1 GAP2 d e f"},
            {"doc_id": 1, "text": "a b c X1 X2 d e f"},
        ]), w=3).take_all()}
        assert out[0]["n_dup_windows"] == 2  # "a b c" and "d e f"
        assert out[0]["n_dup_spans"] == 2

    def test_short_docs_and_no_dups(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            window_dup_stats,
        )

        out = {r["doc_id"]: r for r in window_dup_stats(_ds([
            {"doc_id": 0, "text": "one two"},       # < w tokens
            {"doc_id": 1, "text": "u v w x y"},
        ]), w=3).take_all()}
        assert out[0] == {"doc_id": 0, "n_windows": 0,
                          "n_dup_windows": 0, "n_dup_spans": 0}
        assert out[1] == {"doc_id": 1, "n_windows": 3,
                          "n_dup_windows": 0, "n_dup_spans": 0}

    def test_three_way_duplicate(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            window_dup_stats,
        )

        rows = [{"doc_id": i, "text": "s1 s2 s3 tail%d" % i}
                for i in range(3)]
        out = window_dup_stats(_ds(rows), w=3).take_all()
        assert all(r["n_dup_windows"] == 1 and r["n_dup_spans"] == 1
                   for r in out)


class TestDuplicatedWindowHashes:
    def test_distinct_doc_counting(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            duplicated_window_hashes,
            window_positions,
        )

        # "r s t" occurs twice in doc 0 only → NOT duplicated;
        # "x y z" occurs in docs 0 and 1 → duplicated
        pos = window_positions(_ds([
            {"doc_id": 0, "text": "r s t r s t x y z"},
            {"doc_id": 1, "text": "x y z"},
        ]), w=3)
        dups = duplicated_window_hashes(pos).take_all()
        assert len(dups) == 1


class TestStripDupSpans:
    def test_shared_passage_removed_both_sides(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            strip_dup_spans,
        )

        # shared "a b c d" (w=3 → windows abc,bcd dup → tokens a..d
        # covered in both docs); unique tails survive
        out = {r["doc_id"]: r for r in strip_dup_spans(_ds([
            {"doc_id": 0, "text": "a b c d x y z"},
            {"doc_id": 1, "text": "p q a b c d"},
        ]), w=3).take_all()}
        assert out[0]["text_clean"] == "x y z"
        assert (out[0]["n_tokens"], out[0]["n_tokens_removed"]) == (7, 4)
        assert out[1]["text_clean"] == "p q"
        assert out[1]["n_tokens_removed"] == 4

    def test_no_dups_identity_modulo_whitespace(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            strip_dup_spans,
        )

        out = {r["doc_id"]: r for r in strip_dup_spans(_ds([
            {"doc_id": 0, "text": "  u  v   w x  "},
            {"doc_id": 1, "text": "m n o p"},
        ]), w=3).take_all()}
        # survivors re-joined with single spaces (normalized)
        assert out[0]["text_clean"] == "u v w x"
        assert out[0]["n_tokens_removed"] == 0
        assert out[1]["text_clean"] == "m n o p"

    def test_fully_duplicated_doc_empties(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            strip_dup_spans,
        )

        rows = strip_dup_spans(_ds([
            {"doc_id": 0, "text": "same five tokens here ok"},
            {"doc_id": 1, "text": "same five tokens here ok"},
        ]), w=3).take_all()
        assert all(r["text_clean"] == "" and r["n_tokens_removed"] == 5
                   for r in rows)

    def test_keep_first_exempts_canonical_copy(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.spandedup import (
            strip_dup_spans,
        )

        out = {r["doc_id"]: r for r in strip_dup_spans(_ds([
            {"doc_id": 5, "text": "a b c d x y z"},
            {"doc_id": 9, "text": "p q a b c d"},
        ]), w=3, keep_first=True).take_all()}
        # doc 5 (lowest id owning the shared windows) keeps everything
        assert out[5]["text_clean"] == "a b c d x y z"
        assert out[5]["n_tokens_removed"] == 0
        assert out[9]["text_clean"] == "p q"
        assert out[9]["n_tokens_removed"] == 4
