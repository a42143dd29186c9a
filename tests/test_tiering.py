"""Quality tiers, winnowing selection, Misra-Gries (stages/tiering.py)."""

import numpy as np
import pytest

import pyarrow as pa
import ray.data as rd

from web_mass_scraper_ocr_ray.stages.tiering import (
    MisraGries,
    WinnowSelector,
    _discrete_cutoffs,
    _window_min_values,
    heavy_hitters_mg,
    quality_tiers,
)


class TestCutoffs:
    def test_discrete_rule_matches_sql_percentile_disc(self):
        # values 1..100 once each: q25 → ceil(2500*100/10000)=25th → 25
        vals = np.arange(1, 101)
        cnts = np.ones(100, dtype=np.int64)
        assert _discrete_cutoffs(vals, cnts, (2500, 5000, 7500)) == [
            25, 50, 75]

    def test_skewed_histogram(self):
        # 97 copies of 10, then 5, 6, 7: q25/q50/q75 all land on 10
        vals = np.array([5, 6, 7, 10])
        cnts = np.array([1, 1, 1, 97], dtype=np.int64)
        assert _discrete_cutoffs(vals, cnts, (2500, 5000, 7500)) == [
            10, 10, 10]


@pytest.mark.usefixtures("ray_session")
class TestQualityTiers:
    def test_tiers_monotone_and_quartile_sized(self):
        # 40 docs whose scores strictly increase with token count
        docs = rd.from_items([
            {"doc_id": i, "text": " ".join(["the"] * (i + 1))}
            for i in range(40)
        ])
        rows = sorted(quality_tiers(docs).take_all(),
                      key=lambda r: r["score"])
        tiers = [r["tier"] for r in rows]
        assert tiers == sorted(tiers)  # monotone in score
        assert set(tiers) == {0, 1, 2, 3}
        # discrete rule: cutoff = 10th/20th/30th smallest score, and a
        # doc AT the cutoff clears it — so tier 0 holds 9 docs, tier 3
        # holds 11 (type-1 quantile semantics, same as the SQL mirror)
        assert [tiers.count(k) for k in range(4)] == [9, 10, 10, 11]

    def test_constant_scores_single_tier(self):
        docs = rd.from_items([
            {"doc_id": i, "text": "the and of"} for i in range(8)])
        tiers = {r["tier"] for r in quality_tiers(docs).take_all()}
        # every cutoff equals the one score; score >= cutoff ×3 → tier 3
        assert tiers == {3}


class TestWinnowKernel:
    def test_window_min_values_brute_force(self):
        rng = np.random.default_rng(7)
        h = rng.integers(0, 2**63, 200, dtype=np.uint64)
        w = 16
        expect = sorted({int(h[i:i + w].min())
                         for i in range(len(h) - w + 1)})
        got = _window_min_values(h, w)
        assert [int(x) for x in got] == expect

    def test_short_sequence_one_window(self):
        h = np.array([9, 3, 7], dtype=np.uint64)
        assert _window_min_values(h, 16).tolist() == [3]

    def test_shared_substring_shares_fingerprint(self):
        # winnowing guarantee: a shared run of ≥ hw+sw-1 = 23 bytes
        # yields at least one common selected hash value
        from web_mass_scraper_ocr_ray.stages.textstats import (
            _rolling_hashes,
        )

        shared = "zqxjkvwpyfgbhdnmcrltse!"  # 23 chars, high entropy
        a = "AAAA " * 20 + shared + " BBBB" * 20
        b = "CCCC " * 17 + shared + " DDDD" * 23
        sa = set(_window_min_values(_rolling_hashes(a, 8), 16).tolist())
        sb = set(_window_min_values(_rolling_hashes(b, 8), 16).tolist())
        assert sa & sb

    def test_selector_batch_shape(self):
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["hello world " * 10, "tiny"]})
        out = WinnowSelector()(t)
        assert out.column_names == [
            "doc_id", "n_fp", "fp_xor", "fp_min", "fp_max"]
        assert out.column("n_fp")[0].as_py() >= 1
        assert out.column("n_fp")[1].as_py() == 1  # padded short doc


class TestMisraGries:
    def _truth(self, stream):
        from collections import Counter
        return Counter(stream)

    def test_never_overcounts_and_heavy_survive(self):
        rng = np.random.default_rng(3)
        # skewed stream: 4 heavy tokens + long junk tail
        stream = (["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 200 +
                  ["delta"] * 150 +
                  [f"junk{i}" for i in rng.integers(0, 2000, 1000)])
        rng.shuffle(stream)
        truth = self._truth(stream)
        n = len(stream)
        cap = 16
        mg = MisraGries(cap)
        words, counts = np.unique(stream, return_counts=True)
        mg.add_many(list(words), counts)
        for w, est in mg.counts.items():
            assert est <= truth[w]
            assert (truth[w] - est) * (cap + 1) <= mg.decremented
        for w, c in truth.items():
            if c * (cap + 1) > n:
                assert w in mg.counts

    def test_merge_preserves_guarantees(self):
        a = MisraGries(8).add_many(
            ["x"] * 1 + [f"a{i}" for i in range(30)],
            np.array([100] + [1] * 30))
        b = MisraGries(8).add_many(
            ["x"] * 1 + [f"b{i}" for i in range(30)],
            np.array([80] + [1] * 30))
        m = a.merge(b)
        assert m.n_seen == 240
        assert m.counts.get("x", 0) <= 180
        # x has true 180 > 240/9 ≈ 26.7 → must survive
        assert "x" in m.counts
        assert (180 - m.counts["x"]) * 9 <= m.decremented

    def test_roundtrip_serialization(self):
        mg = MisraGries(4).add_many(["a", "b"], np.array([5, 3]))
        back = MisraGries.from_tuple(mg.to_tuple(), 4)
        assert back.counts == mg.counts
        assert back.n_seen == mg.n_seen


@pytest.mark.usefixtures("ray_session")
class TestGroupedTiers:
    def test_per_group_cutoffs_independent(self):
        from web_mass_scraper_ocr_ray.stages.tiering import (
            quality_tiers_by_source,
        )

        # source A: scores rise with i; source B: all identical docs.
        docs = rd.from_items(
            [{"doc_id": i, "source": "A",
              "text": " ".join(["the"] * (i + 1))} for i in range(20)]
            + [{"doc_id": 100 + i, "source": "B", "text": "the and of"}
               for i in range(5)])
        rows = quality_tiers_by_source(docs).take_all()
        a = sorted((r["score"], r["tier"]) for r in rows
                   if r["source"] == "A")
        assert [t for _, t in a] == sorted(t for _, t in a)
        assert {t for _, t in a} == {0, 1, 2, 3}
        # B's constant score clears all three of ITS OWN cutoffs
        assert {r["tier"] for r in rows if r["source"] == "B"} == {3}


@pytest.mark.usefixtures("ray_session")
class TestWinnowPairs:
    def test_near_dup_found_unrelated_not(self):
        from web_mass_scraper_ocr_ray.stages.tiering import winnow_pairs

        base = ("the quick brown fox jumps over the lazy dog and "
                "keeps on running through the quiet forest tonight")
        docs = rd.from_items([
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " xqz"},  # near-dup of 1
            {"doc_id": 3, "text": "zw qv jx " * 15},  # unrelated
        ]).repartition(2)
        got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
               for r in winnow_pairs(docs, min_shared=2).take_all()}
        assert (1, 2) in got
        assert got[(1, 2)] >= 2
        assert not any(3 in p for p in got)

    def test_shared_count_symmetric_ordering(self):
        from web_mass_scraper_ocr_ray.stages.tiering import winnow_pairs

        t = "abcdefghijklmnopqrstuvwxyz0123456789 " * 4
        docs = rd.from_items([{"doc_id": 9, "text": t},
                              {"doc_id": 4, "text": t}])
        got = winnow_pairs(docs, min_shared=1).take_all()
        assert [(r["doc_a"], r["doc_b"]) for r in got] == [(4, 9)]

    def test_noise_threshold_drops_corpus_common_fingerprints(self):
        # MOSS noise cap (max_postings): a text shared by MORE than
        # max_postings docs contributes no pairs at all — one
        # corpus-common fingerprint must not emit C(n, 2) rows
        from web_mass_scraper_ocr_ray.stages.tiering import winnow_pairs

        t = "abcdefghijklmnopqrstuvwxyz0123456789 " * 4
        docs = rd.from_items(
            [{"doc_id": i, "text": t} for i in range(5)])
        capped = winnow_pairs(docs, min_shared=1,
                              max_postings=4).take_all()
        assert capped == []
        # at-cap postings still pair (boundary inclusive)
        kept = winnow_pairs(docs, min_shared=1,
                            max_postings=5).take_all()
        assert len(kept) == 10  # C(5, 2)


@pytest.mark.usefixtures("ray_session")
class TestNovelty:
    def test_duplicate_scores_zero_original_full(self):
        docs = rd.from_items([
            {"doc_id": 1, "text": "the quick brown fox jumps high"},
            {"doc_id": 2, "text": "the quick brown fox jumps high"},
            {"doc_id": 3, "text": "совершенно different words here!"},
        ])
        from web_mass_scraper_ocr_ray.stages.tiering import (
            novelty_table,
        )

        rows = {r["doc_id"]: r for r in novelty_table(docs).take_all()}
        assert rows[1]["novelty_bp"] == 10000   # first owner of all
        assert rows[2]["novelty_bp"] == 0       # exact dup, owns none
        assert rows[3]["novelty_bp"] == 10000
        assert rows[1]["n_shingles"] == rows[2]["n_shingles"]

    def test_partial_overlap(self):
        # doc 2 shares a long prefix with doc 1, adds a novel suffix
        base = "aaaa bbbb cccc dddd eeee ffff"
        docs = rd.from_items([
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " zzzz qqqq wwww"},
        ])
        from web_mass_scraper_ocr_ray.stages.tiering import (
            novelty_table,
        )

        rows = {r["doc_id"]: r for r in novelty_table(docs).take_all()}
        assert rows[1]["novelty_bp"] == 10000
        assert 0 < rows[2]["novelty_bp"] < 10000
        assert rows[2]["n_novel"] < rows[2]["n_shingles"]


@pytest.mark.usefixtures("ray_session")
class TestHeavyHittersDistributed:
    def test_tree_fold_matches_guarantees(self):
        docs = rd.from_items([
            {"text": "the " * 50 + f"rare{i} " + "and " * 30}
            for i in range(40)
        ]).repartition(8)
        mg = heavy_hitters_mg(docs, capacity=8)
        assert mg.n_seen == 40 * 81
        # 'the' (2000) and 'and' (1200) tower over N/(cap+1)=360
        assert {"the", "and"} <= set(mg.counts)
        assert mg.counts["the"] <= 2000
        assert mg.counts["and"] <= 1200


class TestSourceContamination:
    def test_shared_fingerprints_across_sources(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.tiering import (
            source_contamination,
        )

        shared = "the quick brown fox jumps over the lazy dog again"
        docs = rd.from_arrow(pa.table({
            "source": ["a", "b", "c", "c"],
            "text": [
                shared + " alpha tail content for source a",
                shared + " beta tail content for source b",
                "completely different text with no overlap here zz",
                shared + " gamma tail content for source c",
            ],
        }))
        out = source_contamination(docs).to_pandas()
        pairs = {(r.src_a, r.src_b): r.n_shared_fps
                 for r in out.itertuples()}
        # a/b/c all share the long prefix's fingerprints
        assert pairs.get(("a", "b"), 0) > 0
        assert pairs.get(("a", "c"), 0) > 0
        assert pairs.get(("b", "c"), 0) > 0
        # lexical pair order, no self-pairs
        assert all(a < b for a, b in pairs)
        # the shared prefix dominates: ab and ac counts are close
        assert abs(pairs[("a", "b")] - pairs[("a", "c")]) <= 3

    def test_disjoint_sources_emit_nothing(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.tiering import (
            source_contamination,
        )

        docs = rd.from_arrow(pa.table({
            "source": ["a", "b"],
            "text": [
                "xqzv wbpl mntr kjhg dfsa qwer tyui opas",
                "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss",
            ],
        }))
        out = source_contamination(docs).to_pandas()
        assert len(out) == 0
