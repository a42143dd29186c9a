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


class TestCdcChunks:
    def _chunks(self, texts, mod=64):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.spandedup import cdc_chunks

        ds = rd.from_items([{"source": s, "text": t, "doc_id": i}
                            for i, (s, t) in enumerate(texts)])
        return cdc_chunks(ds, mod=mod).take_all()

    @staticmethod
    def _ref_chunks(text, mod=64, window=8):
        """Plain-Python reference chunker."""
        import hashlib

        from web_mass_scraper_ocr_ray.stages.textstats import (
            _rolling_hashes,
        )

        cuts = []
        if len(text) >= window:
            h = _rolling_hashes(text, window)
            cuts = [int(k) + window for k in
                    (h % mod == 0).nonzero()[0]]
        spans, prev = [], 0
        for c in cuts:
            spans.append(text[prev:c]); prev = c
        if prev < len(text):
            spans.append(text[prev:])
        return [(hashlib.md5(s.encode("utf-8")).hexdigest(), len(s))
                for s in spans]

    def test_matches_reference_and_covers_doc(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(7)
        words = ["tok%d" % i for i in range(40)]
        text = " ".join(rng.choice(words, 400))
        rows = self._chunks([("s", text)], mod=16)
        got = [(r["ch"], r["clen"]) for r in rows]
        ref = self._ref_chunks(text, mod=16)
        assert got == ref
        assert sum(l for _, l in ref) == len(text.encode())
        assert len(ref) > 5  # actually chunked at mod=16

    def test_append_resynchronizes(self, ray_session):
        # THE CDC property: appending bytes leaves every chunk before
        # the last original boundary byte-identical
        import numpy as np

        rng = np.random.default_rng(11)
        words = ["w%d" % i for i in range(30)]
        base = " ".join(rng.choice(words, 300))
        ref_a = self._ref_chunks(base, mod=16)
        ref_b = self._ref_chunks(base + " xqz appended tail", mod=16)
        assert ref_a[:-1] == ref_b[:len(ref_a) - 1]

    def test_insertion_resynchronizes(self, ray_session):
        # insertion in the middle: prefix chunks identical, suffix
        # chunks re-align after the edit (same content-defined cuts)
        import numpy as np

        rng = np.random.default_rng(13)
        words = ["w%d" % i for i in range(30)]
        toks = list(rng.choice(words, 400))
        a = " ".join(toks)
        toks_b = toks[:200] + ["INSERTED", "STUFF"] + toks[200:]
        b = " ".join(toks_b)
        ca = self._ref_chunks(a, mod=16)
        cb = self._ref_chunks(b, mod=16)
        sa, sb = set(ca), set(cb)
        # both prefix AND suffix chunks survive the edit — at most a
        # handful of UNIQUE chunk values around the insertion differ
        assert len(sa & sb) >= len(sa) - 4

    def test_short_and_empty_docs(self, ray_session):
        import hashlib

        rows = self._chunks([("s", "abc"), ("s", "")])
        assert len(rows) == 1
        assert rows[0]["ch"] == hashlib.md5(b"abc").hexdigest()
        assert rows[0]["clen"] == 3

    def test_census_counts_dups_within_source(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.spandedup import (
            cdc_chunk_census,
        )
        import numpy as np

        rng = np.random.default_rng(17)
        words = ["w%d" % i for i in range(30)]
        t1 = " ".join(rng.choice(words, 300))
        ds = rd.from_items([
            {"source": "a", "text": t1},
            {"source": "a", "text": t1},          # exact copy dedups
            {"source": "b", "text": t1},          # other source: own census
        ])
        out = {r["source"]: r
               for r in cdc_chunk_census(ds, mod=16).take_all()}
        a, b = out["a"], out["b"]
        assert a["n_chunks"] == 2 * b["n_chunks"]
        assert a["n_distinct_chunks"] == b["n_distinct_chunks"]
        assert a["bytes_distinct"] == b["bytes_distinct"]
        assert a["bytes_total"] == 2 * b["bytes_total"]
        # formula pin + the copy halves storage (internal dup chunks
        # from the small vocab push savings above the 5000 floor)
        for r in (a, b):
            assert r["saved_bp"] == ((r["bytes_total"]
                                      - r["bytes_distinct"]) * 10000
                                     // r["bytes_total"])
        assert a["saved_bp"] >= 5000 > b["saved_bp"]
